"""Fused self-attention for the fusion/text encoder — Pallas TPU kernel.

Reference hot loop: the HF BertSelfAttention matmul/softmax/matmul the
reference borrows for its 12-layer cross-modal fusion encoder
(model.py:163 ``trsfr``; HF modeling_bert).  At the flagship shapes
(B=16, L=176 = 150 video + 26 text tokens, 12 heads, hd=64) the XLA path
round-trips the [B, nH, L, L] f32 score tensor through HBM around the
softmax; on the measured ~122 GB/s chip that traffic is most of the
fusion encoder's time.  This kernel keeps scores in VMEM: one grid step
= one batch element, a static python loop over heads.

Differences from ops/window_attention.py (measured, see PERF.md): no
rel-pos bias operand (BERT has none — the window kernel's zero-bias add
cost real traffic), additive mask clamped to -1e4 so bf16 -inf never
produces NaN rows, and the L dim is padded to the sublane multiple with
masked keys so any task length works.

Backward = pure-JAX reference recompute via custom_vjp (the serving path
is the win; training keeps XLA's fused bwd).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def encoder_attention_reference(q: Array, k: Array, v: Array,
                                mask: Array, scale: float) -> Array:
    """Pure-JAX oracle.  q/k/v: [B, nH, L, hd]; mask: [B, L, L] additive
    (pre-clamped or not — clamping at -1e4 is softmax-equivalent).
    Returns [B, nH, L, hd]."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + jnp.maximum(mask, -1e4)[:, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


_ENC_PHASED = __import__("os").environ.get("LVT_PHASED", "0") == "1"

# Softmax denominator folded into the pv matmul via a ones column on v
# (see swin_block_attn._PVSUM): kills the [Lp, Lp] lane-reduce VPU pass
# per head.  Serving kernels only — the train kernels need l = sum(p_raw)
# BEFORE the dropout mask, which the (p*m) @ v dot cannot provide.
_PVSUM = __import__("os").environ.get("LVT_PVSUM", "1") == "1"

# LVT_NOCLAMP (experiment, default OFF — see swin_block_attn.py): drop the
# exp2 clamp's min pass in the SERVING kernels; train kernels keep it.
_NOCLAMP = __import__("os").environ.get("LVT_NOCLAMP", "0") == "1"

# LVT_ENCG (experiment, default 1 = off): batch items per grid step in the
# serving whole-sub-block attention kernel (fused_bert_attn_block_kmask).
# G=2 halves the grid-step count (24 -> 12 at the flagship batch) so the
# per-step slab double-buffer stalls amortize over twice the work; the
# per-item dots are unchanged (the qkv/proj dots are already 128-lane).
_ENCG = int(__import__("os").environ.get("LVT_ENCG", "1"))


def _pexp(s):
    import jax.numpy as jnp
    return jnp.exp2(s if _NOCLAMP else jnp.minimum(s, 115.4156))


def _enc_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """One grid step = one batch element, all heads (static loop).

    ``scale`` arrives pre-multiplied by log2(e) and ``mask_ref`` arrives
    clamped AND pre-multiplied by log2(e) (host side, _forward), so the
    softmax is a raw exp2 — one fewer [Lp, Lp] VPU pass per head than
    exp (which lowers to exp2(x * log2e))."""
    nH = q_ref.shape[1]
    mask = mask_ref[0].astype(jnp.float32)
    if _ENC_PHASED:
        # LVT_PHASED A/B (see swin_block_attn._make_attn_window): emit all
        # heads' score dots, then the VPU softmax chain, then the pv dots
        # — adjacent independent MXU/VPU work for the scheduler to overlap
        for h0 in range(0, nH, 8):
            hs = list(range(h0, min(nH, h0 + 8)))
            ss = []
            for h in hs:
                s = jax.lax.dot_general(
                    q_ref[0, h] * scale, k_ref[0, h],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ss.append(s + mask)
            ps = [_pexp(s) for s in ss]
            if _PVSUM:
                for j, h in enumerate(hs):
                    v = v_ref[0, h]
                    hd = v.shape[1]
                    ones = jnp.ones((v.shape[0], 8), v.dtype)
                    ol = jax.lax.dot_general(
                        ps[j].astype(v.dtype),
                        jnp.concatenate([v, ones], axis=1),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    l = jnp.maximum(ol[:, hd:hd + 1], 1e-30)
                    o_ref[0, h] = (ol[:, :hd] / l).astype(o_ref.dtype)
                continue
            ls = [jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
                  for p in ps]
            for j, h in enumerate(hs):
                v = v_ref[0, h]
                o = jax.lax.dot_general(
                    ps[j].astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[0, h] = (o / ls[j]).astype(o_ref.dtype)
        return
    for h in range(nH):
        q = q_ref[0, h]  # [Lp, hd]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + mask
        # no max-subtraction (see swin_block_attn.py: the lane-reduce +
        # subtract passes dominate).  DOMAIN (test_kernel_numerics.py):
        # exact softmax when each row's max logit is in (-80, 80] (always,
        # in trained nets); finite near-one-hot above 80; ~0 instead of
        # NaN below ~-85 (all-underflowed row, e.g. a fully-masked padded
        # query row) via the max(l, tiny) guard.  Cap = 80 * log2(e).
        p = _pexp(s)
        if _PVSUM:
            # denominator in the pv dot's idle output lanes (hd of 128):
            # same MXU passes, one fewer [Lp, Lp] VPU pass
            hd = v.shape[1]
            ol = jax.lax.dot_general(
                p.astype(v.dtype),
                jnp.concatenate([v, jnp.ones((v.shape[0], 8), v.dtype)],
                                axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            l = jnp.maximum(ol[:, hd:hd + 1], 1e-30)
            o_ref[0, h] = (ol[:, :hd] / l).astype(o_ref.dtype)
        else:
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, h] = (o / l).astype(o_ref.dtype)


_LOG2E = 1.4426950408889634


def _forward(q: Array, k: Array, v: Array, mask: Array,
             scale: float) -> Array:
    B, nH, L, hd = q.shape
    Lp = _round8(L)
    # clamp + log2(e) fold hoisted out of the kernel (one XLA pass over
    # [B, L, L] instead of a per-grid-step VPU clamp; exp2 in-kernel)
    mask = jnp.maximum(mask, -1e4) * _LOG2E
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        # padded keys masked for every (incl. padded) query row
        mask = jnp.pad(mask, ((0, 0), (0, Lp - L), (0, Lp - L)),
                       constant_values=-1e4 * _LOG2E)
    qkv_spec = pl.BlockSpec((1, nH, Lp, hd), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_enc_attn_kernel, scale=scale * _LOG2E),
        grid=(B,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((1, Lp, Lp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, nH, Lp, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * Lp * Lp * hd,
            bytes_accessed=8 * B * nH * Lp * hd + 2 * B * Lp * Lp,
            transcendentals=B * nH * Lp * Lp),
    )(q, k, v, mask)
    return out[:, :, :L] if Lp != L else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_encoder_attention(q: Array, k: Array, v: Array, mask: Array,
                            scale: float) -> Array:
    """softmax(q k^T * scale + clamp(mask)) v with scores kept in VMEM.

    q/k/v: [B, nH, L, hd]; mask: [B, L, L] additive float (0 = attend);
    returns [B, nH, L, hd].  L is padded to a multiple of 8 internally.
    """
    return _forward(q, k, v, mask, scale)


def _fwd(q, k, v, mask, scale):
    return _forward(q, k, v, mask, scale), (q, k, v, mask)


def _bwd(scale, res, g):
    q, k, v, mask = res
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale
    s = s + jnp.maximum(mask, -1e4)[:, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, kf) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, qf) * scale
    dmask = jnp.where(mask > -1e4, ds.sum(axis=1), 0.0).astype(mask.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dmask)


fused_encoder_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Whole attention SUB-BLOCK kernel (serving): qkv + attention + output
# projection + residual + post-LN in ONE pallas_call per batch element.
#
# fused_encoder_attention above only covers the softmax core: the qkv /
# proj matmuls and the [B, L, C] <-> [B, nH, L, hd] head transposes stay
# in XLA, costing ~4 extra slab round-trips + 2 layout relayouts per
# layer.  This kernel is the BERT equivalent of the Swin whole-block
# kernel (swin_block_attn._make_attn_window is reused directly, with
# bias_ref=None): heads live as static 128-lane group slices of the
# in-VMEM qkv, so no head transpose ever materializes, and the sub-block
# reads/writes the [L, C] slab exactly once.
# Reference semantics: BertAttention (models/bert.py:226; HF
# modeling_bert BertAttention = BertSelfAttention + BertSelfOutput).
# ---------------------------------------------------------------------------


def _attn_block_kernel(x_ref, wq_ref, wk_ref, wv_ref, b3_ref, wp_ref,
                       bp_ref, mask_ref, lns_ref, lnb_ref, o_ref, *,
                       Lp: int, C: int, nH: int, attn_scale: float,
                       eps: float):
    from lavender_tpu.ops.swin_block_attn import _make_attn_window
    dt = o_ref.dtype
    x = x_ref[0]  # [Lp, C] — post-LN arch: qkv reads the raw input
    attn = _make_attn_window(
        wq_ref, wk_ref, wv_ref, b3_ref, wp_ref, bp_ref, None,
        Np=Lp, C=C, nH=nH, attn_scale=attn_scale, dt=dt)
    out = attn(x, mask_ref[0].astype(jnp.float32))  # proj out + bias, f32
    yf = out + x.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True) - jnp.square(mu)
    ln = (yf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    o_ref[0] = ln.astype(dt)


def fused_bert_attn_block_forward(x, wq, wk, wv, bq, bk, bv, wproj, bproj,
                                  lns, lnb, mask, nH, scale, eps):
    """x: [B, L, C] bf16; wq/wk/wv [C, C] (separate, HF param layout);
    mask [B, L, L] additive f32.  Returns LN(proj(attn(x)) + x):
    [B, L, C]."""
    B, L, C = x.shape
    hd = C // nH
    Lp = _round8(L)
    mask = jnp.maximum(mask, -1e4) * _LOG2E
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
        # padded keys masked for every query; padded query rows produce
        # garbage LN'd rows that the exit slice drops
        mask = jnp.pad(mask, ((0, 0), (0, Lp - L), (0, Lp - L)),
                       constant_values=-1e4 * _LOG2E)

    g_size = 1
    for cand in (4, 2, 1):
        if nH % cand == 0 and cand * hd <= 128:
            g_size = cand
            break
    n_grp = nH // g_size
    gw = g_size * hd
    # head-group layout [n_grp, C, gw]: a free reshape per weight (the
    # lane axis stays minor — no transpose, groups are lane slices)
    wq_g = wq.reshape(C, n_grp, gw).transpose(1, 0, 2)
    wk_g = wk.reshape(C, n_grp, gw).transpose(1, 0, 2)
    wv_g = wv.reshape(C, n_grp, gw).transpose(1, 0, 2)
    b3 = jnp.stack([b.reshape(n_grp, 1, gw) for b in (bq, bk, bv)])
    wp_h = wproj.reshape(n_grp, gw, C)
    dt = x.dtype
    mask = mask.astype(dt)

    full = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, Lp=Lp, C=C, nH=nH,
                          attn_scale=scale * _LOG2E, eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Lp, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full((n_grp, C, gw)), full((n_grp, C, gw)),
            full((n_grp, C, gw)), full((3, n_grp, 1, gw)),
            full((n_grp, gw, C)), full((C,)),
            pl.BlockSpec((1, Lp, Lp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C,)), full((C,)),
        ],
        out_specs=pl.BlockSpec((1, Lp, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, C), dt),
        cost_estimate=pl.CostEstimate(
            flops=B * nH * (2 * Lp * C * hd * 3 + 4 * Lp * Lp * hd
                            + 2 * Lp * hd * C),
            bytes_accessed=2 * B * Lp * C * 2 + 2 * B * Lp * Lp,
            transcendentals=B * nH * Lp * Lp),
    )(x, wq_g, wk_g, wv_g, b3, wp_h, bproj, mask, lns, lnb)
    return out[:, :L] if Lp != L else out


def _attn_block_kernel_kmask(x_ref, wq_ref, wk_ref, wv_ref, b3_ref,
                             wp_ref, bp_ref, keep_ref, lns_ref,
                             lnb_ref, o_ref, *, Lp: int, C: int, nH: int,
                             attn_scale: float, eps: float, G: int = 1):
    """Key-padding variant: no [Lp, Lp] additive-mask pass.  Masked keys
    are deleted by zeroing their k/v rows (keep_ref [G, Lp, 1] in dt) and
    the softmax denominator is corrected by the masked-key count — exact
    (a zeroed key contributes exp2(0) = 1 to every row's l and 0 to the
    numerator).  n_masked is a [Lp, 1] reduce in-kernel (a [B, 1] VMEM
    operand violates the Mosaic (8, 128) block-tile rule).  ``G`` batch
    items per grid step (LVT_ENCG)."""
    from lavender_tpu.ops.swin_block_attn import _make_attn_window
    dt = o_ref.dtype
    for g in range(G):
        x = x_ref[g]
        keep = keep_ref[g]
        n_masked = jnp.float32(Lp) - jnp.sum(keep.astype(jnp.float32))
        attn = _make_attn_window(
            wq_ref, wk_ref, wv_ref, b3_ref, wp_ref, bp_ref, None,
            Np=Lp, C=C, nH=nH, attn_scale=attn_scale, dt=dt,
            key_keep=keep, n_masked=n_masked)
        out = attn(x, None)  # proj out + bias, f32
        yf = out + x.astype(jnp.float32)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True) \
            - jnp.square(mu)
        ln = (yf - mu) * jax.lax.rsqrt(var + eps)
        ln = ln * lns_ref[:].astype(jnp.float32) \
            + lnb_ref[:].astype(jnp.float32)
        o_ref[g] = ln.astype(dt)


def fused_bert_attn_block_kmask_forward(x, wq, wk, wv, bq, bk, bv, wproj,
                                        bproj, lns, lnb, key_mask, nH,
                                        scale, eps):
    """Like fused_bert_attn_block_forward but with a KEY-padding mask
    ``key_mask`` [B, L] (1 = attend, 0 = masked) instead of the additive
    [B, L, L] mask — the per-head mask-add VPU pass on the score tile is
    replaced by zeroed k/v rows + a scalar denominator correction."""
    B, L, C = x.shape
    hd = C // nH
    Lp = _round8(L)
    keep = key_mask.astype(jnp.float32)
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
        keep = jnp.pad(keep, ((0, 0), (0, Lp - L)))

    g_size = 1
    for cand in (4, 2, 1):
        if nH % cand == 0 and cand * hd <= 128:
            g_size = cand
            break
    n_grp = nH // g_size
    gw = g_size * hd
    wq_g = wq.reshape(C, n_grp, gw).transpose(1, 0, 2)
    wk_g = wk.reshape(C, n_grp, gw).transpose(1, 0, 2)
    wv_g = wv.reshape(C, n_grp, gw).transpose(1, 0, 2)
    b3 = jnp.stack([b.reshape(n_grp, 1, gw) for b in (bq, bk, bv)])
    wp_h = wproj.reshape(n_grp, gw, C)
    dt = x.dtype
    keep_col = keep.astype(dt).reshape(B, Lp, 1)

    G = _ENCG if (_ENCG > 1 and B % _ENCG == 0) else 1
    full = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_block_kernel_kmask, Lp=Lp, C=C, nH=nH,
                          attn_scale=scale * _LOG2E, eps=eps, G=G),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lp, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full((n_grp, C, gw)), full((n_grp, C, gw)),
            full((n_grp, C, gw)), full((3, n_grp, 1, gw)),
            full((n_grp, gw, C)), full((C,)),
            pl.BlockSpec((G, Lp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C,)), full((C,)),
        ],
        out_specs=pl.BlockSpec((G, Lp, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, C), dt),
        cost_estimate=pl.CostEstimate(
            flops=B * nH * (2 * Lp * C * hd * 3 + 4 * Lp * Lp * hd
                            + 2 * Lp * hd * C),
            bytes_accessed=2 * B * Lp * C * 2,
            transcendentals=B * nH * Lp * Lp),
    )(x, wq_g, wk_g, wv_g, b3, wp_h, bproj, keep_col, lns, lnb)
    return out[:, :L] if Lp != L else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def fused_bert_attn_block_kmask(x, wq, wk, wv, bq, bk, bv, wproj, bproj,
                                lns, lnb, key_mask, nH, scale, eps):
    """Whole BertAttention sub-block with key-padding mask (serving path;
    backward = reference recompute, zero cotangent for key_mask)."""
    return fused_bert_attn_block_kmask_forward(
        x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns, lnb, key_mask, nH,
        scale, eps)


def _abk_fwd(x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns, lnb, key_mask,
             nH, scale, eps):
    out = fused_bert_attn_block_kmask_forward(
        x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns, lnb, key_mask, nH,
        scale, eps)
    return out, (x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns, lnb,
                 key_mask)


def _abk_bwd(nH, scale, eps, res, g):
    *args, key_mask = res
    B, L, _ = args[0].shape
    mask = ((key_mask.astype(jnp.float32) - 1.0) * 1e4)[:, None, :]
    mask = jnp.broadcast_to(mask, (B, L, L))
    _, vjp = jax.vjp(
        lambda *a: bert_attn_block_reference(*a, mask, nH, scale, eps),
        *args)
    return tuple(vjp(g)) + (jnp.zeros_like(key_mask),)


fused_bert_attn_block_kmask.defvjp(_abk_fwd, _abk_bwd)


def bert_attn_block_reference(x, wq, wk, wv, bq, bk, bv, wproj, bproj,
                              lns, lnb, mask, nH, scale, eps):
    """Pure-JAX oracle (= BertAttention module math: qkv -> softmax
    attention -> proj -> +residual -> LN)."""
    B, L, C = x.shape
    hd = C // nH

    def heads(t):
        return t.reshape(B, L, nH, hd).transpose(0, 2, 1, 3)

    q = heads(x @ wq + bq)
    k = heads(x @ wk + bk)
    v = heads(x @ wv + bv)
    o = encoder_attention_reference(q, k, v, mask, scale)
    o = o.transpose(0, 2, 1, 3).reshape(B, L, C)
    y = (o @ wproj + bproj).astype(jnp.float32) + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    ln = (y - mu) * jax.lax.rsqrt(var + eps) * lns + lnb
    return ln.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def fused_bert_attn_block(x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns,
                          lnb, mask, nH, scale, eps):
    """LN(proj(softmax_attn(qkv(x))) + x) — one pallas_call per batch
    element; the whole BertAttention sub-block.  Serving path only
    (backward = reference recompute)."""
    return fused_bert_attn_block_forward(
        x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns, lnb, mask, nH,
        scale, eps)


def _ab_fwd(x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns, lnb, mask,
            nH, scale, eps):
    out = fused_bert_attn_block_forward(
        x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns, lnb, mask, nH,
        scale, eps)
    return out, (x, wq, wk, wv, bq, bk, bv, wproj, bproj, lns, lnb, mask)


def _ab_bwd(nH, scale, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: bert_attn_block_reference(*a, nH, scale, eps), *res)
    return vjp(g)


fused_bert_attn_block.defvjp(_ab_fwd, _ab_bwd)


# ---------------------------------------------------------------------------
# TRAIN-mode fused attention: in-kernel dropout RNG + recompute backward.
#
# The train step's fusion encoder runs on the B x B pair product; the XLA
# module path writes the [B^2, nH, L, L] softmax probs AND a same-shaped
# dropout mask to HBM in forward and reads both back in backward — at the
# flagship train shapes that is ~GBs per step on a ~122 GB/s chip.  Here
# the forward keeps scores/probs/dropout bits in VMEM (bits from the TPU
# PRNG, seeded per batch element), and the backward RE-GENERATES the same
# bits (same seed, same per-head call order) while recomputing the scores
# — nothing [L, L]-shaped ever touches HBM in either direction.
#
# Dropout is on the softmax PROBABILITIES (HF BertSelfAttention:
# p = dropout(softmax(s))), and the division by the softmax denominator
# commutes with the elementwise mask, so the deferred-divide trick still
# applies: o = ((m * p_raw) @ v) / l.
# ---------------------------------------------------------------------------


def _keep_mask(shape, rate: float, dtype):
    """Bernoulli(1-rate) / (1-rate) scale mask from the in-kernel PRNG.

    bits >= rate * 2^32  <=>  uniform[0,1) >= rate  (keep).
    """
    bits = pltpu.prng_random_bits(shape)  # uint32 per call, stream advances
    thresh = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    keep = (bits >= thresh).astype(dtype)
    return keep * (1.0 / (1.0 - rate))


def _enc_attn_train_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
                           *, scale: float, rate: float,
                           mask_out_ref=None):
    """Forward: one grid step = one batch element; scale/mask pre-folded
    with log2(e) as in _enc_attn_kernel.  ``mask_out_ref`` (debug twin
    only) dumps the dropout scale mask per head for the parity tests."""
    nH = q_ref.shape[1]
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + b)
    mask = mask_ref[0].astype(jnp.float32)
    for h in range(nH):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + mask
        p = jnp.exp2(jnp.minimum(s, 115.4156))
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        m = _keep_mask(p.shape, rate, jnp.float32)
        if mask_out_ref is not None:
            mask_out_ref[0, h] = m
        o = jax.lax.dot_general(
            (p * m).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def _enc_attn_train_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                               g_ref, dq_ref, dk_ref, dv_ref, dmask_ref,
                               *, scale: float, rate: float):
    """Backward: recompute scores AND the dropout bits (same seed, same
    per-head prng_random_bits order as the forward), then the standard
    softmax-attention VJP — all [Lp, Lp] tensors stay in VMEM.

    With p = exp2(min(s~, cap))/l (s~ = log2e-folded logits) and
    o = ((m*p_raw) @ v)/l = (m*p) @ v:
      dv   = (m*p)^T @ g
      dp   = m * (g @ v^T)
      ds   = p * (dp - sum(dp * p))        [natural-log softmax VJP]
      dq   = ds @ k * scale_nat ; dk = ds^T @ q * scale_nat
    The min() clamp's zero-gradient region is ignored exactly like the
    serving _bwd (never hit for |logit| <= 80; see test_kernel_numerics).
    """
    nH = q_ref.shape[1]
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + b)
    mask = mask_ref[0].astype(jnp.float32)
    scale_nat = scale / _LOG2E
    for h in range(nH):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        g = g_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + mask
        p_raw = jnp.exp2(jnp.minimum(s, 115.4156))
        l = jnp.maximum(jnp.sum(p_raw, axis=-1, keepdims=True), 1e-30)
        p = p_raw / l
        m = _keep_mask(p.shape, rate, jnp.float32)
        pm = (p * m).astype(v.dtype)
        dv_ref[0, h] = jax.lax.dot_general(
            pm, g.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = m * jax.lax.dot_general(
            g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dq_ref[0, h] = (jax.lax.dot_general(
            dsb, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * scale_nat).astype(dq_ref.dtype)
        dk_ref[0, h] = (jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * scale_nat).astype(dk_ref.dtype)
        if h == 0:
            dmask_ref[0] = ds
        else:
            dmask_ref[0] = dmask_ref[0] + ds


def _train_pad(q, k, v, mask):
    B, nH, L, hd = q.shape
    Lp = _round8(L)
    mask = jnp.maximum(mask, -1e4) * _LOG2E
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        mask = jnp.pad(mask, ((0, 0), (0, Lp - L), (0, Lp - L)),
                       constant_values=-1e4 * _LOG2E)
    return q, k, v, mask, Lp


def _train_specs(B, nH, Lp, hd):
    qkv_spec = pl.BlockSpec((1, nH, Lp, hd), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, Lp, Lp), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    return qkv_spec, mask_spec


def _train_forward(q, k, v, mask, seed, scale, rate, emit_mask=False):
    B, nH, L, hd = q.shape
    qp, kp, vp, maskp, Lp = _train_pad(q, k, v, mask)
    qkv_spec, mask_spec = _train_specs(B, nH, Lp, hd)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out_shapes = [jax.ShapeDtypeStruct((B, nH, Lp, hd), q.dtype)]
    out_specs = [qkv_spec]
    if emit_mask:
        out_shapes.append(jax.ShapeDtypeStruct((B, nH, Lp, Lp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, nH, Lp, Lp),
                                      lambda b: (b, 0, 0, 0),
                                      memory_space=pltpu.VMEM))

    def kern(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *extra):
        _enc_attn_train_kernel(
            seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
            scale=scale * _LOG2E, rate=rate,
            mask_out_ref=extra[0] if extra else None)

    outs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * Lp * Lp * hd,
            bytes_accessed=8 * B * nH * Lp * hd + 2 * B * Lp * Lp,
            transcendentals=B * nH * Lp * Lp),
    )(seed_arr, qp, kp, vp, maskp)
    o = outs[0][:, :, :L] if Lp != L else outs[0]
    if emit_mask:
        return o, outs[1][:, :, :L, :L] if Lp != L else outs[1]
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_encoder_attention_train(q: Array, k: Array, v: Array, mask: Array,
                                  seed: Array, scale: float,
                                  rate: float) -> Array:
    """Training attention: softmax + attention-probs dropout, probs never
    leaving VMEM in forward OR backward (bits regenerated from ``seed``).

    q/k/v: [B, nH, L, hd]; mask: [B, L, L] additive; seed: int32 scalar
    (fold the step's dropout rng into it); rate: drop probability, static.
    """
    return _train_forward(q, k, v, mask, seed, scale, rate)


def _train_fwd(q, k, v, mask, seed, scale, rate):
    return (_train_forward(q, k, v, mask, seed, scale, rate),
            (q, k, v, mask, seed))


def _train_bwd(scale, rate, res, g):
    import numpy as np
    q, k, v, mask, seed = res
    B, nH, L, hd = q.shape
    qp, kp, vp, maskp, Lp = _train_pad(q, k, v, mask)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, Lp - L), (0, 0))) \
        if Lp != L else g
    qkv_spec, mask_spec = _train_specs(B, nH, Lp, hd)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    dq, dk, dv, dmask = pl.pallas_call(
        functools.partial(_enc_attn_train_bwd_kernel,
                          scale=scale * _LOG2E, rate=rate),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  qkv_spec, qkv_spec, qkv_spec, mask_spec, qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_shape=[jax.ShapeDtypeStruct((B, nH, Lp, hd), q.dtype),
                   jax.ShapeDtypeStruct((B, nH, Lp, hd), k.dtype),
                   jax.ShapeDtypeStruct((B, nH, Lp, hd), v.dtype),
                   jax.ShapeDtypeStruct((B, Lp, Lp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=11 * B * nH * Lp * Lp * hd,
            bytes_accessed=16 * B * nH * Lp * hd + 2 * B * Lp * Lp,
            transcendentals=B * nH * Lp * Lp),
    )(seed_arr, qp, kp, vp, maskp, gp)
    if Lp != L:
        dq, dk, dv = dq[:, :, :L], dk[:, :, :L], dv[:, :, :L]
        dmask = dmask[:, :L, :L]
    dmask = jnp.where(mask > -1e4, dmask, 0.0).astype(mask.dtype)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return dq, dk, dv, dmask, dseed


fused_encoder_attention_train.defvjp(_train_fwd, _train_bwd)


def encoder_attention_train_debug(q, k, v, mask, seed, scale, rate):
    """Forward that ALSO returns the dropout scale-mask the kernel drew
    ([B, nH, L, L], values in {0, 1/(1-rate)}) — test hook to verify the
    backward regenerates identical bits."""
    return _train_forward(q, k, v, mask, seed, scale, rate, emit_mask=True)


# ---------------------------------------------------------------------------
# TRAIN-mode attention in LANES layout: q/k/v stay [B, L, C] with heads as
# STATIC lane slices, like the Swin wm kernels (_make_attn_window) and the
# serving whole-sub-block kernel above.
#
# Why (round-5, PERF.md crossparts): the heads-layout train kernel above
# still forces 4 [B, L, C] <-> [B, nH, L, hd] relayouts per layer around
# itself (q/k/v in, o out) plus 4 more in backward (dq/dk/dv/do) — at the
# flagship train shape (B^2 = 64 pairs, L = 280, C = 768) that is ~110 MB
# of pure relayout traffic per layer per direction on a ~122 GB/s chip,
# and the attention sub-block measured 29% of peak fwd.  In lanes layout
# the qkv/proj dots consume/produce [B*L, C] directly (XLA's optimal
# shape, no transpose), and dwq = x^T @ dq_all needs no relayout either.
# The in-kernel math is identical to the heads-layout kernels: per-head
# static lane slices feed the same score/softmax/dropout/pv chain, the
# backward regenerates the dropout bits (same seed, same per-head order).
# Reference: HF BertSelfAttention under /root/reference/model.py:223-243.
# ---------------------------------------------------------------------------


def _enc_attn_train_lanes_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                                 o_ref, *, nH: int, scale: float,
                                 rate: float, mask_out_ref=None):
    """Forward: one grid step = one batch element; q/k/v/o [1, Lp, C].
    scale/mask pre-folded with log2(e); dropout bits from the TPU PRNG
    (seeded per batch element, drawn per head in ascending order)."""
    C = q_ref.shape[2]
    hd = C // nH
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + b)
    mask = mask_ref[0].astype(jnp.float32)
    for h in range(nH):
        q = q_ref[0][:, h * hd:(h + 1) * hd]
        k = k_ref[0][:, h * hd:(h + 1) * hd]
        v = v_ref[0][:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + mask
        p = jnp.exp2(jnp.minimum(s, 115.4156))
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        m = _keep_mask(p.shape, rate, jnp.float32)
        if mask_out_ref is not None:
            mask_out_ref[0, h] = m
        o = jax.lax.dot_general(
            (p * m).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o / l).astype(o_ref.dtype)


def _enc_attn_train_lanes_bwd_kernel(seed_ref, q_ref, k_ref, v_ref,
                                     mask_ref, g_ref, dq_ref, dk_ref,
                                     dv_ref, dmask_ref, *, nH: int,
                                     scale: float, rate: float):
    """Backward: recompute scores AND the dropout bits (same seed, same
    per-head order as the forward), then the softmax-attention VJP — all
    [Lp, Lp] tensors VMEM-only, all slabs in lanes layout."""
    C = q_ref.shape[2]
    hd = C // nH
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + b)
    mask = mask_ref[0].astype(jnp.float32)
    scale_nat = scale / _LOG2E
    for h in range(nH):
        q = q_ref[0][:, h * hd:(h + 1) * hd]
        k = k_ref[0][:, h * hd:(h + 1) * hd]
        v = v_ref[0][:, h * hd:(h + 1) * hd]
        g = g_ref[0][:, h * hd:(h + 1) * hd].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + mask
        p_raw = jnp.exp2(jnp.minimum(s, 115.4156))
        l = jnp.maximum(jnp.sum(p_raw, axis=-1, keepdims=True), 1e-30)
        p = p_raw / l
        m = _keep_mask(p.shape, rate, jnp.float32)
        pm = (p * m).astype(v.dtype)
        dv_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            pm, g.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = m * jax.lax.dot_general(
            g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dq_ref[0, :, h * hd:(h + 1) * hd] = (jax.lax.dot_general(
            dsb, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * scale_nat).astype(dq_ref.dtype)
        dk_ref[0, :, h * hd:(h + 1) * hd] = (jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * scale_nat).astype(dk_ref.dtype)
        if h == 0:
            dmask_ref[0] = ds
        else:
            dmask_ref[0] = dmask_ref[0] + ds


def _lanes_pad(q, k, v, mask):
    B, L, C = q.shape
    Lp = _round8(L)
    mask = jnp.maximum(mask, -1e4) * _LOG2E
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        mask = jnp.pad(mask, ((0, 0), (0, Lp - L), (0, Lp - L)),
                       constant_values=-1e4 * _LOG2E)
    return q, k, v, mask, Lp


def _lanes_specs(B, Lp, C):
    slab = pl.BlockSpec((1, Lp, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, Lp, Lp), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    return slab, mask_spec


def _lanes_train_forward(q, k, v, mask, seed, scale, rate, nH,
                         emit_mask=False):
    B, L, C = q.shape
    qp, kp, vp, maskp, Lp = _lanes_pad(q, k, v, mask)
    slab, mask_spec = _lanes_specs(B, Lp, C)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out_shapes = [jax.ShapeDtypeStruct((B, Lp, C), q.dtype)]
    out_specs = [slab]
    if emit_mask:
        out_shapes.append(jax.ShapeDtypeStruct((B, nH, Lp, Lp),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((1, nH, Lp, Lp),
                                      lambda b: (b, 0, 0, 0),
                                      memory_space=pltpu.VMEM))

    def kern(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *extra):
        _enc_attn_train_lanes_kernel(
            seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
            nH=nH, scale=scale * _LOG2E, rate=rate,
            mask_out_ref=extra[0] if extra else None)

    hd = C // nH
    outs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  slab, slab, slab, mask_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * Lp * Lp * hd,
            bytes_accessed=8 * B * Lp * C + 2 * B * Lp * Lp,
            transcendentals=B * nH * Lp * Lp),
    )(seed_arr, qp, kp, vp, maskp)
    o = outs[0][:, :L] if Lp != L else outs[0]
    if emit_mask:
        return o, outs[1][:, :, :L, :L] if Lp != L else outs[1]
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_encoder_attention_train_lanes(q: Array, k: Array, v: Array,
                                        mask: Array, seed: Array,
                                        scale: float, rate: float,
                                        nH: int) -> Array:
    """Training attention with q/k/v/o in LANES layout [B, L, C] (heads =
    static lane slices): softmax + attention-probs dropout with probs and
    bits VMEM-only in both directions, and NO head relayouts around the
    kernel.  mask: [B, L, L] additive; seed: int32 scalar; rate: drop
    probability (static); nH: head count (C % nH == 0)."""
    return _lanes_train_forward(q, k, v, mask, seed, scale, rate, nH)


def _lanes_fwd(q, k, v, mask, seed, scale, rate, nH):
    return (_lanes_train_forward(q, k, v, mask, seed, scale, rate, nH),
            (q, k, v, mask, seed))


def _lanes_bwd(scale, rate, nH, res, g):
    import numpy as np
    q, k, v, mask, seed = res
    B, L, C = q.shape
    qp, kp, vp, maskp, Lp = _lanes_pad(q, k, v, mask)
    gp = jnp.pad(g, ((0, 0), (0, Lp - L), (0, 0))) if Lp != L else g
    slab, mask_spec = _lanes_specs(B, Lp, C)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    hd = C // nH
    dq, dk, dv, dmask = pl.pallas_call(
        functools.partial(_enc_attn_train_lanes_bwd_kernel,
                          nH=nH, scale=scale * _LOG2E, rate=rate),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  slab, slab, slab, mask_spec, slab],
        out_specs=[slab, slab, slab, mask_spec],
        out_shape=[jax.ShapeDtypeStruct((B, Lp, C), q.dtype),
                   jax.ShapeDtypeStruct((B, Lp, C), k.dtype),
                   jax.ShapeDtypeStruct((B, Lp, C), v.dtype),
                   jax.ShapeDtypeStruct((B, Lp, Lp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=11 * B * nH * Lp * Lp * hd,
            bytes_accessed=16 * B * Lp * C + 2 * B * Lp * Lp,
            transcendentals=B * nH * Lp * Lp),
    )(seed_arr, qp, kp, vp, maskp, gp)
    if Lp != L:
        dq, dk, dv = dq[:, :L], dk[:, :L], dv[:, :L]
        dmask = dmask[:, :L, :L]
    dmask = jnp.where(mask > -1e4, dmask, 0.0).astype(mask.dtype)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return dq, dk, dv, dmask, dseed


fused_encoder_attention_train_lanes.defvjp(_lanes_fwd, _lanes_bwd)


def encoder_attention_train_lanes_debug(q, k, v, mask, seed, scale, rate,
                                        nH):
    """Forward that also returns the dropout scale-mask ([B, nH, L, L],
    {0, 1/(1-rate)}) — test hook for fwd/bwd bit consistency."""
    return _lanes_train_forward(q, k, v, mask, seed, scale, rate, nH,
                                emit_mask=True)
