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
