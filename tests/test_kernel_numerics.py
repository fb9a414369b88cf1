"""Numerics hardening for the minimum-pass softmax kernels (round-2 weak #4).

The fused kernels drop the softmax max-subtraction: ``exp(min(s, 80))``.
These tests pin the documented domain against the f32 oracles:

* checkpoint-scale activations (row-max logits O(10-60)) -> exact;
* a single dominating logit > 80 -> finite near-one-hot, still matches;
* an all-masked / all-underflowed row -> finite (~0), NOT 0/0 = NaN, and
  the other rows are unaffected.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lavender_tpu.ops.encoder_attention import (
    encoder_attention_reference, fused_encoder_attention)
from lavender_tpu.ops.swin_block_attn import (
    _round8, fused_swin_block_attn, rel_pos_bias_padded,
    swin_block_attn_reference)
from lavender_tpu.models.swin3d import relative_position_index


def _block_params(C, nH, window, seed=0, w_scale=0.05):
    g = np.random.RandomState(seed)
    N = int(np.prod(window))
    L = (2 * window[0] - 1) * (2 * window[1] - 1) * (2 * window[2] - 1)
    mk = lambda *s: jnp.asarray(g.randn(*s).astype(np.float32) * w_scale)
    table = mk(L, nH)
    rpi = relative_position_index(tuple(window))[:N, :N]
    bias = table[jnp.asarray(rpi.reshape(-1))].reshape(N, N, nH)
    bias = bias.transpose(2, 0, 1)
    bias_p = rel_pos_bias_padded(table, rpi, window[0], window[1],
                                 window[2], _round8(window[2]), jnp.float32)
    return dict(
        ln_scale=1.0 + 0.1 * mk(C), ln_bias=0.1 * mk(C),
        wqkv=mk(C, 3 * C), bqkv=mk(3 * C), wproj=mk(C, C), bproj=mk(C),
        bias=bias, bias_p=bias_p)


def test_block_kernel_checkpoint_scale():
    """Row-max logits in the tens (what finetuned checkpoints actually
    produce: the reference's trained Swin-B emits window-attention logits
    O(10)) — the minimum-pass softmax must be EXACT there."""
    B, D, H, W, C, nH = 1, 2, 7, 7, 32, 4
    window = (2, 7, 7)
    # big weights push q.k logits into the checkpoint-scale band
    p = _block_params(C, nH, window, seed=5, w_scale=0.6)
    g = np.random.RandomState(6)
    x = jnp.asarray(g.randn(B, D, H, W, C).astype(np.float32))

    # verify the test actually exercises the intended logit band
    hd = C // nH
    scale = hd ** -0.5
    xs = np.asarray(x).reshape(-1, C)
    mu = xs.mean(-1, keepdims=True)
    sd = np.sqrt(xs.var(-1) + 1e-5)[:, None]
    ln = (xs - mu) / sd * np.asarray(p["ln_scale"]) + np.asarray(p["ln_bias"])
    qkv = ln @ np.asarray(p["wqkv"]) + np.asarray(p["bqkv"])
    q, k = qkv[:, :C], qkv[:, C:2 * C]
    logit_max = 0.0
    for h in range(nH):
        s = (q[:, h * hd:(h + 1) * hd] * scale) @ k[:, h * hd:(h + 1) * hd].T
        logit_max = max(logit_max, float(np.abs(s).max()))
    assert 10.0 < logit_max < 80.0, f"test not in target band: {logit_max}"

    want = swin_block_attn_reference(
        x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"], p["wproj"],
        p["bproj"], p["bias"], window, (0, 0, 0), nH, scale, 1e-5, None)
    with pltpu.force_tpu_interpret_mode():
        got = fused_swin_block_attn(
            x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"],
            p["wproj"], p["bproj"], p["bias_p"], window, (0, 0, 0), nH,
            scale, 1e-5)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def _enc_inputs(B=1, nH=2, L=16, hd=16, seed=0):
    g = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(g.randn(B, nH, L, hd).astype(np.float32)) * 0.3
               for _ in range(3))
    mask = jnp.zeros((B, L, L), jnp.float32)
    return q, k, v, mask


def test_enc_attn_single_dominant_logit_above_80():
    """One logit far above the 80 clamp with a clear margin: the clamped
    softmax is near-one-hot exactly like the true softmax."""
    B, nH, L, hd = 1, 2, 16, 16
    q, k, v, mask = _enc_inputs(B, nH, L, hd, seed=7)
    scale = hd ** -0.5
    # align q[...,0,:] with k[...,3,:] and blow up the pair: logit >> 80
    kk = np.array(k)
    qq = np.array(q)
    qq[:, :, 0, :] = kk[:, :, 3, :] * (150.0 / (scale * (kk[:, :, 3, :] ** 2)
                                                .sum(-1, keepdims=True)))
    q = jnp.asarray(qq)
    s = np.einsum("bhnd,bhmd->bhnm", qq, kk) * scale
    assert s[:, :, 0, 3].min() > 100.0
    # margin over the runner-up is huge -> true softmax is one-hot
    want = encoder_attention_reference(q, k, v, mask, scale)
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder_attention(q, k, v, mask, scale)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_enc_attn_all_masked_row_finite():
    """A query row whose keys are ALL masked (the padded-row case): the
    guarded kernel returns ~0 for that row instead of 0/0 = NaN, and every
    other row still matches the oracle."""
    B, nH, L, hd = 1, 2, 16, 16
    q, k, v, mask = _enc_inputs(B, nH, L, hd, seed=8)
    m = np.zeros((B, L, L), np.float32)
    m[:, 5, :] = -1e9  # row 5 sees nothing
    mask = jnp.asarray(m)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_encoder_attention(q, k, v, mask, hd ** -0.5))
    assert np.isfinite(got).all(), "all-masked row produced NaN/inf"
    np.testing.assert_allclose(got[:, :, 5, :], 0.0, atol=1e-20)
    want = np.asarray(encoder_attention_reference(q, k, v, mask, hd ** -0.5))
    rows = [i for i in range(L) if i != 5]
    np.testing.assert_allclose(got[:, :, rows, :], want[:, :, rows, :],
                               atol=2e-5, rtol=2e-5)


def test_enc_attn_deep_negative_band():
    """Rows whose max logit sits near -80: individual exp() terms flirt
    with the f32 denormal range but the result must still match the
    oracle (the dominant terms stay representable)."""
    B, nH, L, hd = 1, 1, 8, 16
    q, k, v, _ = _enc_inputs(B, nH, L, hd, seed=9)
    # uniform additive mask of -70 shifts every logit deep negative
    mask = jnp.full((B, L, L), -70.0, jnp.float32)
    want = encoder_attention_reference(q, k, v, mask, hd ** -0.5)
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder_attention(q, k, v, mask, hd ** -0.5)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-3)
