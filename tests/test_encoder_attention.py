"""Fused encoder-attention kernel vs pure-JAX oracle (CPU interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lavender_tpu.ops.encoder_attention import (
    encoder_attention_reference, fused_encoder_attention)


def _mk(B, nH, L, hd, seed=0, big_neg=-1e9):
    g = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(g.randn(B, nH, L, hd).astype(np.float32)) * 0.3
               for _ in range(3))
    # key-padding style additive mask with a few masked tails
    keep = g.rand(B, L) > 0.2
    keep[:, 0] = True
    mask = jnp.asarray(np.where(keep[:, None, :], 0.0, big_neg)
                       .astype(np.float32))
    mask = jnp.broadcast_to(mask, (B, L, L))
    return q, k, v, mask


@pytest.mark.parametrize("L", [176, 174, 29])
def test_kernel_matches_reference(L):
    B, nH, hd = 2, 4, 32
    q, k, v, mask = _mk(B, nH, L, hd)
    want = encoder_attention_reference(q, k, v, mask, hd ** -0.5)
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder_attention(q, k, v, mask, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_seq2seq_mask_and_extreme_negatives():
    """3-D (seq2seq) mask + the f32 finfo.min values the model emits."""
    B, nH, L, hd = 2, 2, 40, 16
    q, k, v, _ = _mk(B, nH, L, hd, seed=1)
    causal = np.triu(np.full((L, L), np.finfo(np.float32).min), k=1)
    mask = jnp.asarray(np.broadcast_to(causal, (B, L, L)).astype(np.float32))
    want = encoder_attention_reference(q, k, v, mask, hd ** -0.5)
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder_attention(q, k, v, mask, hd ** -0.5)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gradients_match_reference():
    B, nH, L, hd = 1, 2, 24, 16
    q, k, v, mask = _mk(B, nH, L, hd, seed=2, big_neg=-1e4)

    def loss_ref(q, k, v):
        return jnp.sum(encoder_attention_reference(q, k, v, mask,
                                                   hd ** -0.5) ** 2)

    def loss_fused(q, k, v):
        return jnp.sum(fused_encoder_attention(q, k, v, mask,
                                               hd ** -0.5) ** 2)

    gw = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gg = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Train kernel (in-kernel dropout, recompute backward).  NOTE: interpret
# mode stubs prng_random_bits to ZEROS, so rate>0 drops everything here;
# the rate=0 tests verify full numerics, and the debug-mask tests verify
# the forward/backward consume IDENTICAL bits (both all-zero on CPU, real
# on TPU) via the emitted-mask oracle.
# ---------------------------------------------------------------------------


def test_train_kernel_rate0_matches_reference():
    from lavender_tpu.ops.encoder_attention import (
        fused_encoder_attention_train)
    B, nH, L, hd = 2, 4, 29, 32
    q, k, v, mask = _mk(B, nH, L, hd, seed=3, big_neg=-1e4)
    want = encoder_attention_reference(q, k, v, mask, hd ** -0.5)
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder_attention_train(
            q, k, v, mask, jnp.int32(7), hd ** -0.5, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_train_kernel_rate0_gradients():
    from lavender_tpu.ops.encoder_attention import (
        fused_encoder_attention_train)
    B, nH, L, hd = 1, 2, 24, 16
    q, k, v, mask = _mk(B, nH, L, hd, seed=4, big_neg=-1e4)

    def loss_ref(q, k, v):
        return jnp.sum(encoder_attention_reference(
            q, k, v, mask, hd ** -0.5) ** 2)

    def loss_train(q, k, v):
        return jnp.sum(fused_encoder_attention_train(
            q, k, v, mask, jnp.int32(7), hd ** -0.5, 0.0) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gt = jax.grad(loss_train, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gt, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-4)


def test_train_kernel_dropout_mask_consistency():
    """Forward output == oracle evaluated with the kernel's own emitted
    dropout mask, and the custom_vjp backward == the vjp of that oracle —
    i.e. fwd and bwd consume the same bits."""
    from lavender_tpu.ops.encoder_attention import (
        encoder_attention_train_debug, fused_encoder_attention_train)
    B, nH, L, hd = 1, 2, 16, 16
    rate = 0.3
    q, k, v, mask = _mk(B, nH, L, hd, seed=5, big_neg=-1e4)

    with pltpu.force_tpu_interpret_mode():
        o, m = encoder_attention_train_debug(
            q, k, v, mask, jnp.int32(11), hd ** -0.5, rate)

    def oracle_with_mask(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        s = s + jnp.maximum(mask, -1e4)[:, None]
        p = jax.nn.softmax(s, axis=-1) * m
        return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                          preferred_element_type=jnp.float32)

    want = oracle_with_mask(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def loss_train(q, k, v):
        return jnp.sum(fused_encoder_attention_train(
            q, k, v, mask, jnp.int32(11), hd ** -0.5, rate) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(oracle_with_mask(q, k, v) ** 2)

    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gt = jax.grad(loss_train, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gt, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-4)


# --------------------------------------------------------------------------
# Whole attention sub-block kernel (qkv + attention + proj + residual + LN)
# --------------------------------------------------------------------------


def _mk_block(B, L, C, nH, seed=0):
    g = np.random.RandomState(seed)
    x = jnp.asarray(g.randn(B, L, C).astype(np.float32) * 0.5)
    mk = lambda *s: jnp.asarray(g.randn(*s).astype(np.float32) * 0.1)
    keep = g.rand(B, L) > 0.2
    keep[:, 0] = True
    mask = jnp.asarray(np.where(keep[:, None, :], 0.0, -1e9)
                       .astype(np.float32))
    mask = jnp.broadcast_to(mask, (B, L, L))
    return (x, mk(C, C), mk(C, C), mk(C, C), mk(C), mk(C), mk(C),
            mk(C, C), mk(C), 1.0 + 0.1 * mk(C), 0.1 * mk(C), mask)


@pytest.mark.parametrize("L", [48, 43])
def test_attn_block_kernel_matches_reference(L):
    """fused_bert_attn_block (whole sub-block in one pallas_call) ==
    the module-math oracle, incl. the L % 8 != 0 pad path."""
    from lavender_tpu.ops.encoder_attention import (
        bert_attn_block_reference, fused_bert_attn_block)
    B, C, nH = 2, 32, 2
    args = _mk_block(B, L, C, nH, seed=3)
    want = bert_attn_block_reference(*args, nH, (C // nH) ** -0.5, 1e-12)
    with pltpu.force_tpu_interpret_mode():
        got = fused_bert_attn_block(*args, nH, (C // nH) ** -0.5, 1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_attn_block_gradients_match_reference():
    from lavender_tpu.ops.encoder_attention import (
        bert_attn_block_reference, fused_bert_attn_block)
    B, L, C, nH = 1, 24, 16, 2
    args = _mk_block(B, L, C, nH, seed=4)
    scale = (C // nH) ** -0.5

    def loss_ref(x, wq, wproj):
        a = (x, wq) + args[2:7] + (wproj,) + args[8:]
        return jnp.sum(bert_attn_block_reference(*a, nH, scale, 1e-12) ** 2)

    def loss_fused(x, wq, wproj):
        a = (x, wq) + args[2:7] + (wproj,) + args[8:]
        return jnp.sum(fused_bert_attn_block(*a, nH, scale, 1e-12) ** 2)

    gw = jax.grad(loss_ref, argnums=(0, 1, 2))(args[0], args[1], args[7])
    with pltpu.force_tpu_interpret_mode():
        gg = jax.grad(loss_fused, argnums=(0, 1, 2))(
            args[0], args[1], args[7])
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_attn_block_module_wiring():
    """BertAttention routes through the whole-sub-block kernel on the
    serving path (bf16 + deterministic + LVT_FORCE_FUSED) and matches
    the module path."""
    import os
    from lavender_tpu.config import BertConfig
    from lavender_tpu.models.bert import BertAttention, \
        extended_attention_mask
    cfg = BertConfig(hidden_size=32, num_attention_heads=2,
                     num_hidden_layers=1, intermediate_size=64,
                     fused_attn=True)
    cfg_off = BertConfig(hidden_size=32, num_attention_heads=2,
                         num_hidden_layers=1, intermediate_size=64,
                         fused_attn=False)
    g = np.random.RandomState(0)
    x = jnp.asarray(g.randn(2, 20, 32).astype(np.float32))
    am = extended_attention_mask(
        jnp.asarray(g.rand(2, 20) > 0.2, jnp.int32), jnp.float32)
    m_on = BertAttention(cfg, dtype=jnp.bfloat16)
    m_off = BertAttention(cfg_off, dtype=jnp.bfloat16)
    params = m_off.init(jax.random.PRNGKey(0), x.astype(jnp.bfloat16), am)
    want = m_off.apply(params, x.astype(jnp.bfloat16), am)
    os.environ["LVT_FORCE_FUSED"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = m_on.apply(params, x.astype(jnp.bfloat16), am)
    finally:
        os.environ.pop("LVT_FORCE_FUSED", None)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def _mk_kmask_block(B, L, C, seed=0):
    g = np.random.RandomState(seed)
    x = jnp.asarray(g.randn(B, L, C).astype(np.float32) * 0.5)
    mk = lambda *s: jnp.asarray(g.randn(*s).astype(np.float32) * 0.1)
    keep = (g.rand(B, L) > 0.3).astype(np.float32)
    keep[:, 0] = 1.0
    return (x, mk(C, C), mk(C, C), mk(C, C), mk(C), mk(C), mk(C),
            mk(C, C), mk(C), 1.0 + 0.1 * mk(C), 0.1 * mk(C),
            jnp.asarray(keep))


@pytest.mark.parametrize("L", [48, 43])
def test_attn_block_kmask_matches_reference(L):
    """Key-padding fast path (zeroed k/v rows + scalar denominator
    correction, NO [L, L] mask pass) == the additive-mask oracle,
    incl. the L % 8 != 0 pad path."""
    from lavender_tpu.ops.encoder_attention import (
        bert_attn_block_reference, fused_bert_attn_block_kmask)
    B, C, nH = 2, 32, 2
    args = _mk_kmask_block(B, L, C, seed=5)
    keep = args[-1]
    mask = jnp.broadcast_to(
        ((keep - 1.0) * 1e9)[:, None, :], (B, L, L))
    want = bert_attn_block_reference(*args[:-1], mask, nH,
                                     (C // nH) ** -0.5, 1e-12)
    with pltpu.force_tpu_interpret_mode():
        got = fused_bert_attn_block_kmask(*args, nH, (C // nH) ** -0.5,
                                          1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_attn_block_kmask_encg_batched_grid_matches():
    """LVT_ENCG (G batch items per grid step) is bit-compatible with the
    per-item grid, including a B not divisible by G (falls back to
    G=1)."""
    from lavender_tpu.ops import encoder_attention as ea
    B, L, C, nH = 4, 26, 32, 2
    args = _mk_kmask_block(B, L, C, seed=11)
    old = ea._ENCG
    try:
        with pltpu.force_tpu_interpret_mode():
            ea._ENCG = 1
            want = ea.fused_bert_attn_block_kmask_forward(
                *args, nH, (C // nH) ** -0.5, 1e-12)
            ea._ENCG = 2
            got = ea.fused_bert_attn_block_kmask_forward(
                *args, nH, (C // nH) ** -0.5, 1e-12)
            ea._ENCG = 3  # 4 % 3 != 0 -> G=1 fallback
            got3 = ea.fused_bert_attn_block_kmask_forward(
                *args, nH, (C // nH) ** -0.5, 1e-12)
    finally:
        ea._ENCG = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_attn_block_kmask_gradients_match_reference():
    """custom_vjp backward (reference recompute) parity; key_mask
    cotangent is zero by contract."""
    from lavender_tpu.ops.encoder_attention import (
        bert_attn_block_reference, fused_bert_attn_block_kmask)
    B, L, C, nH = 2, 24, 32, 2
    args = _mk_kmask_block(B, L, C, seed=7)
    keep = args[-1]
    mask = jnp.broadcast_to(((keep - 1.0) * 1e4)[:, None, :], (B, L, L))

    def loss_k(*a):
        return jnp.sum(fused_bert_attn_block_kmask(
            *a, keep, nH, (C // nH) ** -0.5, 1e-12) ** 2)

    def loss_r(*a):
        return jnp.sum(bert_attn_block_reference(
            *a, mask, nH, (C // nH) ** -0.5, 1e-12) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_k, argnums=tuple(range(11)))(*args[:-1])
    gr = jax.grad(loss_r, argnums=tuple(range(11)))(*args[:-1])
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


# --------------------------------------------------------------------------
# Lanes-layout TRAIN kernel (round-5): q/k/v stay [B, L, C], heads are
# static lane slices — no head relayouts around the kernel.
# --------------------------------------------------------------------------


def _mk_lanes(B, L, C, seed=0, big_neg=-1e9):
    g = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(g.randn(B, L, C).astype(np.float32) * 0.5)
    q, k, v = mk(), mk(), mk()
    keep = g.rand(B, L) > 0.2
    keep[:, 0] = True
    mask = jnp.asarray(np.where(keep[:, None, :], 0.0, big_neg)
                       .astype(np.float32))
    mask = jnp.broadcast_to(mask, (B, L, L))
    return q, k, v, mask


def _lanes_to_heads(t, nH):
    B, L, C = t.shape
    return t.reshape(B, L, nH, C // nH).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("L", [32, 29])
def test_train_lanes_rate0_matches_reference(L):
    from lavender_tpu.ops.encoder_attention import (
        fused_encoder_attention_train_lanes)
    B, C, nH = 2, 64, 4
    hd = C // nH
    q, k, v, mask = _mk_lanes(B, L, C, seed=3, big_neg=-1e4)
    want = encoder_attention_reference(
        _lanes_to_heads(q, nH), _lanes_to_heads(k, nH),
        _lanes_to_heads(v, nH), mask, hd ** -0.5)
    want = want.transpose(0, 2, 1, 3).reshape(B, L, C)
    with pltpu.force_tpu_interpret_mode():
        got = fused_encoder_attention_train_lanes(
            q, k, v, mask, jnp.int32(7), hd ** -0.5, 0.0, nH)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_train_lanes_rate0_gradients():
    from lavender_tpu.ops.encoder_attention import (
        fused_encoder_attention_train_lanes)
    B, L, C, nH = 1, 24, 32, 2
    hd = C // nH
    q, k, v, mask = _mk_lanes(B, L, C, seed=4, big_neg=-1e4)

    def loss_ref(q, k, v):
        o = encoder_attention_reference(
            _lanes_to_heads(q, nH), _lanes_to_heads(k, nH),
            _lanes_to_heads(v, nH), mask, hd ** -0.5)
        return jnp.sum(o ** 2)

    def loss_lanes(q, k, v):
        return jnp.sum(fused_encoder_attention_train_lanes(
            q, k, v, mask, jnp.int32(7), hd ** -0.5, 0.0, nH) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gt = jax.grad(loss_lanes, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gt, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-4)


def test_train_lanes_dropout_mask_consistency():
    """Forward == oracle evaluated with the kernel's own emitted dropout
    mask; backward == the vjp of that oracle (fwd/bwd use the same bits)."""
    from lavender_tpu.ops.encoder_attention import (
        encoder_attention_train_lanes_debug,
        fused_encoder_attention_train_lanes)
    B, L, C, nH = 1, 16, 32, 2
    hd = C // nH
    rate = 0.3
    q, k, v, mask = _mk_lanes(B, L, C, seed=5, big_neg=-1e4)

    with pltpu.force_tpu_interpret_mode():
        o, m = encoder_attention_train_lanes_debug(
            q, k, v, mask, jnp.int32(11), hd ** -0.5, rate, nH)

    def oracle_with_mask(q, k, v):
        qh, kh, vh = (_lanes_to_heads(t, nH) for t in (q, k, v))
        s = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        s = s + jnp.maximum(mask, -1e4)[:, None]
        p = jax.nn.softmax(s, axis=-1) * m
        o = jnp.einsum("bhnm,bhmd->bhnd", p, vh,
                       preferred_element_type=jnp.float32)
        return o.transpose(0, 2, 1, 3).reshape(B, L, C)

    want = oracle_with_mask(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def loss_lanes(q, k, v):
        return jnp.sum(fused_encoder_attention_train_lanes(
            q, k, v, mask, jnp.int32(11), hd ** -0.5, rate, nH) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(oracle_with_mask(q, k, v) ** 2)

    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gt = jax.grad(loss_lanes, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gt, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-4)


def test_train_lanes_module_matches_heads_kernel():
    """BertSelfAttention train forward through the LANES kernel equals the
    heads-layout train kernel bit-for-bit in expectation: both draw the
    per-head dropout bits in the same (seed, head) order, so with the
    same rng the masks are IDENTICAL and outputs match to numerics."""
    import os
    from lavender_tpu.config import BertConfig
    from lavender_tpu.models.bert import BertSelfAttention

    # rate 0: interpret mode stubs prng bits to zeros (rate>0 would drop
    # everything on both paths, making the comparison vacuous); the
    # rate>0 bit semantics are covered by the mask-consistency test above
    cfg = BertConfig(vocab_size=32, hidden_size=64, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=32, fused_attn_train=True,
                     attention_probs_dropout_prob=0.0)
    B, L = 2, 16
    g = np.random.RandomState(0)
    x = jnp.asarray(g.randn(B, L, 64).astype(np.float32))
    bias = jnp.zeros((B, 1, L, L), jnp.float32)
    mod = BertSelfAttention(cfg, dtype=jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0), x.astype(jnp.bfloat16),
                         bias, deterministic=True)
    os.environ["LVT_FORCE_FUSED"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            os.environ["LVT_ATTNLANES"] = "1"
            got = mod.apply(variables, x.astype(jnp.bfloat16), bias,
                            deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(5)})
            os.environ["LVT_ATTNLANES"] = "0"
            want = mod.apply(variables, x.astype(jnp.bfloat16), bias,
                             deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(5)})
    finally:
        os.environ.pop("LVT_FORCE_FUSED", None)
        os.environ.pop("LVT_ATTNLANES", None)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)
