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


def _enc_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """One grid step = one batch element, all heads (static loop).

    ``scale`` arrives pre-multiplied by log2(e) and ``mask_ref`` arrives
    clamped AND pre-multiplied by log2(e) (host side, _forward), so the
    softmax is a raw exp2 — one fewer [Lp, Lp] VPU pass per head than
    exp (which lowers to exp2(x * log2e))."""
    nH = q_ref.shape[1]
    mask = mask_ref[0].astype(jnp.float32)
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
        p = jnp.exp2(jnp.minimum(s, 115.4156))
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
