"""Captioning: seq2seq-masked MLM training + autoregressive decoding.

Behavioral reference: model_for_captioning.py (LAVENDER_Captioning:40,
generate:138, _generate_no_beam_search:374, top_k_top_p_filtering:502) and
main_caption.py (Agent_Captioning.masking:62-79).

TPU-first design: decoding runs as a **fixed-length ``lax.scan`` with a
static KV cache** — the reference re-encodes the full [video; text] sequence
for every generated token because its past-key-values path is disabled
(model_for_captioning.py:123,298); here the video prefix is encoded once
(``BertEncoder.prefill``) and each step feeds only [prev_token, MASK]
(2 positions), exactly matching the re-encode semantics under the causal
text mask (verified in tests against a full re-encode oracle).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lavender_tpu.models.bert import extended_attention_mask
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import common

Array = jax.Array


def caption_masking(txt: np.ndarray, pad_token_id: int, mask_token_id: int,
                    p_mask: float = 0.15,
                    rng: Optional[np.random.RandomState] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Caption-train text masking (Agent_Captioning.masking,
    main_caption.py:62-79): 15% of non-pad non-mask tokens -> [MASK]
    (note: unlike pretrain masking, CLS/SEP are maskable here)."""
    rng = rng or np.random
    special = (txt == pad_token_id) | (txt == mask_token_id)
    hit = (rng.rand(*txt.shape) < p_mask) & ~special
    ans_mtm = np.where(hit, txt, -1).astype(np.int32)
    masked = np.where(hit, mask_token_id, txt).astype(np.int32)
    return masked, ans_mtm


def make_caption_loss_fn(model: LavenderModel, label_smoothing: float = 0.1,
                         drop_worst_ratio: float = 0.0, pretext=None):
    """Training: MLM under the seq2seq mask + CaptioningLoss
    (model_for_captioning.py:61-93 + :10-37)."""

    def loss_fn(params, batch, dropout_rng):
        rngs = {"dropout": dropout_rng}
        fp, mp = common.apply_pretext(
            pretext, {"params": params}, batch["img"].shape[0],
            deterministic=False, rngs=rngs)
        logits, lp = common.fused_mlm_logits(
            model, {"params": params}, batch["img"], batch["txt"],
            batch["mask"], feat_pre=fp, mask_pre=mp,
            attn_mask_type="seq2seq", deterministic=False,
            rngs=rngs)
        labels = common.pad_labels_for_pretxt(batch["ans_mtm"], lp)
        flat_logits = logits.reshape(-1, logits.shape[-1])
        flat_labels = labels.reshape(-1)
        return common.label_smoothed_kl_loss(
            flat_logits, flat_labels, label_smoothing, drop_worst_ratio)

    return loss_fn


def top_k_top_p_filter(logits: Array, top_k: int = 0, top_p: float = 1.0,
                       min_tokens_to_keep: int = 1) -> Array:
    """jax port of the classic top-k / nucleus filter
    (model_for_captioning.py:502-534)."""
    neg_inf = -jnp.inf
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, min_tokens_to_keep), V)
        kth = jax.lax.top_k(logits, k)[0][..., -1, None]
        logits = jnp.where(logits < kth, neg_inf, logits)
    if top_p < 1.0:
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum > top_p
        if min_tokens_to_keep > 1:
            remove = remove.at[..., :min_tokens_to_keep].set(False)
        # shift right: always keep the first token above threshold
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        inv = jnp.argsort(sort_idx, axis=-1)
        remove = jnp.take_along_axis(remove, inv, axis=-1)
        logits = jnp.where(remove, neg_inf, logits)
    return logits


class GenerateConfig(NamedTuple):
    max_gen_length: int = 20
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    repetition_penalty: float = 1.0


def make_generate_fn(model: LavenderModel, cls_token_id: int,
                     sep_token_id: int, pad_token_id: int,
                     mask_token_id: int, gen: GenerateConfig = GenerateConfig(),
                     use_task_token: bool = False,
                     prompt_len: int = 0):
    """Build a jitted greedy/sampling caption generator with KV cache.

    Returns step(variables, img, prompt_txt?, rng) -> (ids [B, max_len],
    logprobs [B]).  Matches _generate_no_beam_search semantics
    (model_for_captioning.py:374-498) with the cache path enabled.
    """
    max_len = gen.max_gen_length

    def _generate(variables, img, prompt_txt, rng):
        B = img.shape[0]
        dummy_txt = jnp.zeros((B, 1), jnp.int32)
        dummy_mask = jnp.ones((B, 1), jnp.int32)
        fi, mi, _, _ = model.apply(
            variables, img, dummy_txt, dummy_mask,
            method=LavenderModel.go_feat)

        # pretext: task token or prompt (model_for_captioning.py:164-171)
        if use_task_token:
            fp, mp = model.apply(variables, "cap", B,
                                 method=LavenderModel.task_feat)
        elif prompt_txt is not None:
            fp = model.apply(variables, prompt_txt, B,
                             method=LavenderModel.encode_prompt)
            mp = jnp.ones(fp.shape[:2], jnp.int32)
        else:
            fp = mp = None
        if fp is not None:
            prefix = jnp.concatenate([fi, fp.astype(fi.dtype)], axis=1)
            prefix_mask = jnp.concatenate([mi, mp], axis=1)
        else:
            prefix, prefix_mask = fi, mi
        Lp = prefix.shape[1]
        cache_len = Lp + max_len

        # prefix rows attend to the prefix only (seq2seq mask, video block)
        prefix_bias = extended_attention_mask(prefix_mask)
        _, caches = model.apply(
            variables, prefix, prefix_bias, cache_len,
            method=lambda m, x, b, cl: m.trsfr.prefill(x, b, cl))

        # per-step column mask pieces (static)
        text_pos = jnp.arange(max_len)

        def col_bias(t):
            # rows at absolute text positions [t-1, t]
            rows = jnp.stack([t - 1, t])  # [2]
            txt_allowed = (text_pos[None, :] <= rows[:, None])  # [2, max_len]
            m = jnp.concatenate(
                [jnp.broadcast_to(prefix_mask[:, None, :], (B, 2, Lp)),
                 jnp.broadcast_to(txt_allowed[None], (B, 2, max_len))
                 .astype(prefix_mask.dtype)], axis=2)
            return extended_attention_mask(m)  # [B, 1, 2, cache_len]

        def body(carry, t):
            prev_tok, caches, unfinished, seen, step_rng = carry
            feed = jnp.stack(
                [prev_tok, jnp.full((B,), mask_token_id, jnp.int32)], axis=1)
            pos = jnp.broadcast_to(
                jnp.stack([t - 1, t])[None, :], (B, 2)).astype(jnp.int32)
            x = model.apply(
                variables, feed, None, pos,
                method=lambda m, ids, tt, p: m.enc_txt.emb_txt(
                    ids, token_type_ids=tt, position_ids=p))
            out, new_caches = model.apply(
                variables, x, caches, Lp + t - 1, col_bias(t),
                method=lambda m, xx, cc, s, bb: m.trsfr.decode_step(
                    xx, cc, s, bb))
            logits = model.apply(variables, out[:, 1:2],
                                 method=LavenderModel.mlm_head)[:, 0]
            logits = logits.astype(jnp.float32)

            if gen.repetition_penalty != 1.0:
                # CTRL-style penalty over already-generated tokens
                # (model_for_captioning.py:424-434)
                pen = jnp.where(logits < 0, logits * gen.repetition_penalty,
                                logits / gen.repetition_penalty)
                logits = jnp.where(seen, pen, logits)

            if gen.do_sample:
                sample_logits = logits / gen.temperature \
                    if gen.temperature != 1.0 else logits
                sample_logits = top_k_top_p_filter(
                    sample_logits, gen.top_k, gen.top_p)
                step_rng, cat_rng = jax.random.split(step_rng)
                next_tok = jax.random.categorical(cat_rng, sample_logits)
            else:
                next_tok = jnp.argmax(logits, axis=-1)
            next_tok = next_tok.astype(jnp.int32)

            logp = jax.nn.log_softmax(logits, axis=-1)
            score = jnp.take_along_axis(logp, next_tok[:, None], axis=1)[:, 0]

            tokens_to_add = (next_tok * unfinished
                             + pad_token_id * (1 - unfinished))
            weight = unfinished.astype(jnp.float32)
            new_unfinished = unfinished * (
                tokens_to_add != sep_token_id).astype(jnp.int32)
            new_seen = seen.at[jnp.arange(B), tokens_to_add].set(True)
            return ((tokens_to_add, new_caches, new_unfinished, new_seen,
                     step_rng),
                    (tokens_to_add, score * weight, weight))

        seen0 = jnp.zeros((B, model.config.bert.vocab_size), bool)
        seen0 = seen0.at[:, cls_token_id].set(True)
        init = (jnp.full((B,), cls_token_id, jnp.int32), caches,
                jnp.ones((B,), jnp.int32), seen0, rng)
        (last_tok, _, unfinished, _, _), (toks, scores, weights) = (
            jax.lax.scan(body, init, jnp.arange(1, max_len)))

        ids = jnp.concatenate(
            [jnp.full((B, 1), cls_token_id, jnp.int32), toks.T], axis=1)
        # force EOS on still-unfinished rows (model_for_captioning.py:479-482)
        ids = ids.at[:, -1].set(
            jnp.where(unfinished == 1, sep_token_id, ids[:, -1]))
        sum_logp = scores.T.sum(axis=1)
        n = jnp.maximum(weights.T.sum(axis=1), 1.0)
        return ids, sum_logp / n

    @jax.jit
    def generate(variables, img, rng, prompt_txt=None):
        return _generate(variables, img, prompt_txt, rng)

    return generate


def rencode_generate_reference(model: LavenderModel, variables, img,
                               cls_token_id: int, sep_token_id: int,
                               pad_token_id: int, mask_token_id: int,
                               max_gen_length: int = 20):
    """Oracle greedy decoder that re-encodes the full sequence each step,
    mirroring the reference's enabled (slow) path
    (model_for_captioning.py:239-296 + :374-450).  Test-only.
    """
    B = img.shape[0]
    dummy_txt = jnp.zeros((B, 1), jnp.int32)
    fi, mi, _, _ = model.apply(
        variables, img, dummy_txt, jnp.ones((B, 1), jnp.int32),
        method=LavenderModel.go_feat)
    Lv = fi.shape[1]
    ids = np.full((B, 1), cls_token_id, np.int64)
    unfinished = np.ones((B,), np.int64)
    while ids.shape[1] < max_gen_length:
        cur = ids.shape[1]
        feed = np.concatenate(
            [ids, np.full((B, 1), mask_token_id, np.int64)], axis=1)
        ft = model.apply(variables, jnp.asarray(feed),
                         method=lambda m, t: m.enc_txt(t))
        Lt = feed.shape[1]
        # seq2seq mask over [video; text] (model.py:194-221)
        mask = np.zeros((B, Lv + Lt, Lv + Lt), np.int32)
        mask[:, :, :Lv] = np.asarray(mi)[:, None, :]
        mask[:, Lv:, Lv:] = np.tril(np.ones((Lt, Lt), np.int32))[None]
        bias = extended_attention_mask(jnp.asarray(mask))
        feat = jnp.concatenate([fi, ft.astype(fi.dtype)], axis=1)
        out = model.apply(variables, feat, bias,
                          method=lambda m, f, b: m.trsfr(f, b))
        logits = model.apply(variables, out[:, Lv + cur:Lv + cur + 1],
                             method=LavenderModel.mlm_head)[:, 0]
        nxt = np.asarray(jnp.argmax(logits.astype(jnp.float32), axis=-1))
        tokens = nxt * unfinished + pad_token_id * (1 - unfinished)
        ids = np.concatenate([ids, tokens[:, None]], axis=1)
        unfinished = unfinished * (tokens != sep_token_id).astype(np.int64)
        if unfinished.max() == 0:
            break
    if ids.shape[1] < max_gen_length:
        pad = np.full((B, max_gen_length - ids.shape[1]), pad_token_id,
                      np.int64)
        ids = np.concatenate([ids, pad], axis=1)
    else:
        ids[:, -1] = np.where(unfinished == 1, sep_token_id, ids[:, -1])
    return ids
