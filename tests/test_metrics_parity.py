"""Validate the from-scratch caption metrics (round-1 weak #4).

* BLEU vs nltk.corpus_bleu — same algorithm family (clipped modified
  precision, closest-reference brevity penalty) so corpus BLEU-1..4 must
  agree to float precision on non-degenerate corpora;
* ROUGE-L LCS precision/recall vs the rouge_score library (we recompute the
  coco beta=1.2 F from their P/R);
* CIDEr-D against hand-derivable anchor values (perfect match on
  image-unique text == 10.0; disjoint == 0.0) and a hand-computed middle
  case.
"""
import math

import numpy as np
import pytest

from lavender_tpu.utils.metrics import (
    bleu, cider_d, coco_caption_metrics, ptb_tokenize, rouge_l)

CANDS = {
    "v1": "a man is playing a guitar on the street",
    "v2": "a dog runs through the park grass",
    "v3": "two people are talking about the game",
    "v4": "a woman slices vegetables in the kitchen",
}
REFS = {
    # v1 shares a 4-gram with its candidate so every BLEU order has
    # nonzero overlap (the zero-overlap case differs from nltk only in
    # epsilon conventions: coco 'tiny' smoothing vs nltk float-min)
    "v1": ["a man is playing a guitar by the street",
           "someone is playing guitar outside"],
    "v2": ["a dog is running across a grassy park",
           "the dog runs in the park"],
    "v3": ["two men discuss the basketball game",
           "people talk about a game"],
    "v4": ["a woman is cutting vegetables",
           "someone slices vegetables in a kitchen"],
}


def test_bleu_matches_nltk():
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    refs_tok = [[ptb_tokenize(r) for r in REFS[k]] for k in CANDS]
    cands_tok = [ptb_tokenize(CANDS[k]) for k in CANDS]
    ours = bleu(CANDS, REFS)
    for n in range(1, 5):
        want = nltk_bleu.corpus_bleu(
            refs_tok, cands_tok, weights=tuple([1.0 / n] * n))
        assert ours[n - 1] == pytest.approx(want, abs=1e-9), f"BLEU-{n}"


def test_rouge_lcs_matches_rouge_score():
    rs = pytest.importorskip("rouge_score.rouge_scorer")
    scorer = rs.RougeScorer(["rougeL"], use_stemmer=False)
    beta = 1.2
    want_scores = []
    for k, cand in CANDS.items():
        best = 0.0
        for ref in REFS[k]:
            # identical tokenization for both sides
            s = scorer.score(" ".join(ptb_tokenize(ref)),
                             " ".join(ptb_tokenize(cand)))["rougeL"]
            p, r = s.precision, s.recall
            f = ((1 + beta ** 2) * p * r / (r + beta ** 2 * p)
                 if p + r > 0 else 0.0)
            best = max(best, f)
        want_scores.append(best)
    want = float(np.mean(want_scores))
    assert rouge_l(CANDS, REFS) == pytest.approx(want, abs=1e-9)


def test_cider_anchor_values():
    # two images with fully disjoint vocab; candidate 1 == its only ref
    # -> every n-gram is image-unique (idf = log 2), cosine 1 per n,
    #    length delta 0 -> CIDEr-D = 10 for image 1
    cands = {"a": "red car drives fast tonight",
             "b": "umbrella math piano"}
    refs = {"a": ["red car drives fast tonight"],
            "b": ["green turtle swims slowly today"]}
    per_image_mean = cider_d(cands, refs)
    # image b candidate shares nothing with its ref -> 0
    assert per_image_mean == pytest.approx(10.0 / 2, abs=1e-9)


def test_cider_hand_computed_middle_case():
    # Hand-derived: 2 images, all texts length 2 (so the 3/4-gram levels
    # contribute 0 — both vectors empty).
    #   Image a: ref "car red", cand "car blue" share ONLY unigram "car".
    #     idf = log(2) for every n-gram here (each appears in 1 of 2 images;
    #     df of the unseen "blue" clips to 1).
    #     unigram cosine = (1*log2 * 1*log2)/(sqrt2*log2 * sqrt2*log2) = 1/2
    #     bigram overlap 0 -> CIDEr-D(a) = 10 * (0.5+0+0+0)/4 = 1.25
    #   Image b: cand == ref "piano math": unigram and bigram cosine 1,
    #     3/4-gram levels 0 -> CIDEr-D(b) = 10 * (1+1+0+0)/4 = 5.0
    cands = {"a": "car blue", "b": "piano math"}
    refs = {"a": ["car red"], "b": ["piano math"]}
    got = cider_d(cands, refs)
    assert got == pytest.approx((1.25 + 5.0) / 2, abs=1e-9)


def test_metric_dict_keys():
    out = coco_caption_metrics(CANDS, REFS)
    for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr", "ROUGE_L"):
        assert k in out and 0.0 <= out[k] <= 10.0
