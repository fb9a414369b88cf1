"""Parity: our from-scratch WordPiece tokenizer vs transformers.BertTokenizer.

Round-1 weak #4: a divergence in basic-tokenizer edge cases (CJK, accents,
punctuation) would silently shift every QA/retrieval number.  Both tokenizers
load the SAME local vocab file (offline; no hub), and must agree exactly on
tokenize / convert_tokens_to_ids / encode over a corpus of tricky strings.
"""
import os

import pytest

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

transformers = pytest.importorskip("transformers")

from lavender_tpu.data.tokenizer import BertTokenizer  # noqa: E402

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the a is dog dogs cat man woman playing "
    "play ##ing ##s ##ed run running talk talking video true false answer "
    "option question guitar person people street ball game on in at and of "
    "to it he she they some two 0 1 2 3 4 5 6 7 8 9 ##0 ##1 ##2 word "
    "##piece un ##known over ##ly long don ' t won re won't cafe naive "
    "##ve zurich . , ! ? : ; - ( ) \" 中 国 话 日 本 $ % & ##. ##, um "
    "##bra swim ##ming jump high ##er fast slow ##est water sky blue red "
    "##dish green").split()

TRICKY = [
    "a man is playing guitar",
    "The DOG runs FAST",                     # case folding
    "don't won't it's",                      # apostrophes split
    "hello,world!how?are:you",               # punctuation splitting
    "café naïve zürich",      # accent stripping (NFD)
    "中国话 and english",        # CJK char spacing
    "日本 words 中 mixed",
    "price $5 and 10%",
    "  leading and   trailing   spaces  ",
    "tabs\tand\nnewlines",
    "nullbyte\x00and�replacement",      # control-char cleanup
    "unknownlongword antidisestablishment",  # [UNK] fallback
    "swimming jumping higher fastest",       # wordpiece continuation
    "a 2 3 45 678",
    "-dash (paren) \"quote\"",
    "emoji \U0001f600 stays",                # non-CJK high codepoint
    "word" * 30,                             # very long token -> [UNK]
    "",                                      # empty string
    "...",
    "reddish bluedish",
]


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    path = d / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer(str(path)), transformers.BertTokenizer(str(path))


def test_tokenize_parity(tokenizers):
    ours, hf = tokenizers
    for s in TRICKY:
        assert ours.tokenize(s) == hf.tokenize(s), repr(s)


def test_ids_parity(tokenizers):
    ours, hf = tokenizers
    for s in TRICKY:
        toks = hf.tokenize(s)
        assert (ours.convert_tokens_to_ids(toks)
                == hf.convert_tokens_to_ids(toks)), repr(s)


def test_encode_parity(tokenizers):
    ours, hf = tokenizers
    for s in TRICKY:
        want = hf.encode(s, padding="max_length", max_length=16,
                         truncation=True)
        got = ours.encode(s, padding="max_length", max_length=16,
                          truncation=True)
        assert got == want, repr(s)


def test_special_token_ids(tokenizers):
    ours, hf = tokenizers
    assert ours.cls_token_id == hf.cls_token_id
    assert ours.sep_token_id == hf.sep_token_id
    assert ours.pad_token_id == hf.pad_token_id
    assert ours.mask_token_id == hf.mask_token_id
    assert ours.unk_token_id == hf.unk_token_id


# ---- production-vocab parity (round-2 weak #5) ----
#
# assets/vocab_30k.txt is a real 30,522-piece WordPiece vocab trained with
# the HF `tokenizers` WordPiece trainer (the algorithm behind the released
# bert-base vocabs; see cli/tools.py build-vocab) — ~8k '##' continuation
# pieces, so the continuation-merge behavior that synthetic vocabs can't
# exercise is exercised here on hundreds of caption-style sentences.

_SUBJ = ["a man", "a woman", "two children", "the dog", "a cat",
         "a group of people", "an old man", "a young girl", "the chef",
         "several players", "a musician", "the scientist"]
_VERB = ["is playing", "is cooking", "runs across", "is talking about",
         "demonstrates", "is riding", "jumps over", "is explaining",
         "slices", "is singing near", "catches", "is repairing"]
_OBJ = ["a guitar on stage", "food in the kitchen", "the busy street",
        "a new smartphone", "the soccer ball", "a bicycle downhill",
        "the wooden fence", "how engines work", "vegetables quickly",
        "the microphone stand", "the frisbee midair", "an old car engine"]


def _caption_corpus():
    caps = [f"{s} {v} {o}" for s, v, o in
            zip(_SUBJ * 12, (_VERB * 12)[1:] + _VERB[:1],
                (_OBJ * 12)[2:] + _OBJ[:2])]
    caps += [f"{s} {v} {o}." for s in _SUBJ for v in _VERB[:4]
             for o in _OBJ[:4]]
    caps += TRICKY
    return caps


@pytest.fixture(scope="module")
def prod_tokenizers():
    import os.path as op
    path = op.join(op.dirname(__file__), "..", "assets", "vocab_30k.txt")
    if not op.exists(path):
        pytest.skip("assets/vocab_30k.txt not present")
    return BertTokenizer(path), transformers.BertTokenizer(path)


def test_prod_vocab_shape(prod_tokenizers):
    ours, hf = prod_tokenizers
    assert len(ours) == len(hf) >= 30000
    n_cont = sum(1 for t in ours.vocab if t.startswith("##"))
    assert n_cont > 5000, "not a production-shaped vocab"


def test_prod_vocab_tokenize_parity(prod_tokenizers):
    ours, hf = prod_tokenizers
    caps = _caption_corpus()
    assert len(caps) > 300
    for s in caps:
        assert ours.tokenize(s) == hf.tokenize(s), repr(s)


def test_prod_vocab_encode_parity(prod_tokenizers):
    ours, hf = prod_tokenizers
    for s in _caption_corpus()[::5]:
        want = hf.encode(s, padding="max_length", max_length=24,
                         truncation=True)
        got = ours.encode(s, padding="max_length", max_length=24,
                          truncation=True)
        assert got == want, repr(s)
