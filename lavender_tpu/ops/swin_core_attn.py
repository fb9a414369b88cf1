"""Flash-style window-attention CORE with a Pallas backward.

Why this exists (round-3 train campaign): the wm Swin block kernels'
``custom_vjp`` backward recomputes through a pure-XLA reference
(`swin_block_attn._wm_ref_native`).  XLA materializes each block's f32
score tensor and the softmax probs in HBM between the matmuls around the
softmax — at stage 3's [B*nW=32, nH=16, 245, 245] that is ~0.5 GB of
traffic per block backward, and the measured train decomposition showed
Swin bwd at 107 ms vs 20 ms fwd (5.3x) with stage 3's 18 blocks
accounting for ~72 ms of pure HBM time at the chip's measured 122 GB/s.

This module gives the backward the same treatment the fusion encoder's
train kernel got (`ops/encoder_attention.fused_encoder_attention_train`,
+25% train throughput): the attention core — softmax(q k^T * scale +
rel-pos bias + shift mask) @ v per (window, head) — becomes its own
``custom_vjp`` whose forward AND backward are Pallas kernels.  Scores and
probs live only in VMEM in both directions; HBM sees just the [*, C]
qkv / output / cotangent slabs.  The block vjps (`_wm_bwd`,
`_wm_full_bwd`) then trace their recompute through `_wm_ref_core` (LN +
qkv dot + THIS core + proj [+ MLP] — all the dense parts stay XLA, which
is optimal for them).

Gradient notes:
- the backward recomputes p with the same minimum-pass exp2 softmax as
  the serving kernels (exact softmax for in-domain logits, see
  swin_block_attn.py) and applies the exact softmax vjp
  ds = p * (dp - sum_j p*dp); bias receives sum over (batch, window) of
  ds, accumulated across grid steps inside the kernel.
- the additive shift mask is treated as a CONSTANT (zero cotangent).
  In this framework the masks are trace-time geometry (numpy/iota
  constants, never parameters), so their cotangent is always discarded
  by the caller; returning zeros skips nH [Np, Np] accumulation passes.
- pad rows/keys (Npad > N): pad-row cotangents arrive as exact zeros
  (the caller slices valid rows, the slice vjp zero-pads), so their ds
  rows vanish; pad KEYS carry the -100 bias the wm layout already bakes
  in, so p over pad keys is ~e^-100 — their grads are denormal-zero.

Reference for the torch semantics this must match:
/root/reference/VidSwin/video_swin_transformer.py:139-186
(WindowAttention3D forward; torch autograd materializes attn in HBM).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LOG2E = float(np.log2(np.e))
_CLAMP2 = 115.4156  # 80 * log2(e), same domain as the serving kernels


def _pick_group(nW: int, Npad: int, C3: int) -> int:
    """Windows per grid step (same policy as _pick_wm_group, sized on the
    [Npad, 3C] qkv slab)."""
    G = 1
    for g in range(1, 5):
        if nW % g == 0 and g * Npad * C3 * 2 <= 786432:
            G = g
    return G


_BWD_VMEM_BUDGET = 12 * 1024 * 1024  # of the ~16 MB/core, with headroom


def _bwd_working_set(g: int, Npad: int, C3: int, nH: int,
                     itemsize: int) -> int:
    """True VMEM bytes of the backward kernel at group size g.

    Unlike the forward (sized on the qkv slab alone), the backward
    additionally holds the do and dqkv slabs, the bias block, the f32
    dbias accumulator, the mask block, and the f32 s/e/p/dp/ds
    temporaries (ADVICE round 3: sizing on the forward slab alone can
    overflow VMEM at stage-3-like geometry)."""
    C = C3 // 3
    # double-buffered grid-mapped slabs: qkv in, do in, dqkv out, mask in
    slabs = 2 * g * Npad * (C3 + C + C3) * itemsize
    mask_blk = 2 * g * Npad * Npad * itemsize
    # constant-index blocks (single-buffered): bias in, f32 dbias out
    fixed = nH * Npad * Npad * (itemsize + 4)
    # f32 per-(window,head) temporaries (s/e/p share ~3 live [Np,Np]
    # buffers; dp/ds two more; +1 slack for Mosaic scheduling)
    temps = 6 * Npad * Npad * 4
    return slabs + mask_blk + fixed + temps


def _pick_group_bwd(nW: int, Npad: int, C3: int, nH: int,
                    itemsize: int) -> int:
    G = 1
    for g in range(1, 5):
        if nW % g == 0 and \
                _bwd_working_set(g, Npad, C3, nH, itemsize) <= \
                _BWD_VMEM_BUDGET:
            G = g
    return G


def core_bwd_supported(Npad: int, C: int, nH: int, itemsize: int) -> bool:
    """Whether the backward kernel fits VMEM even at G=1 — callers
    (swin_block_attn._wm_bwd) fall back to the XLA recompute when not."""
    return _bwd_working_set(1, Npad, 3 * C, nH, itemsize) <= \
        _BWD_VMEM_BUDGET


def _core_fwd_kernel(qkv_ref, bias_ref, mask_ref, o_ref, *, G: int,
                     Npad: int, C: int, nH: int, scale2: float,
                     with_mask: bool):
    """o = softmax(q k^T + bias + mask) @ v per (window, head).

    qkv_ref [1, G*Npad, 3C] (q | k | v lane blocks); bias_ref
    [nH, Npad, Npad] log2e-prefolded; mask_ref [G, Npad, Npad] prefolded
    (or [1, ...] dummy).  Same minimum-pass softmax as the serving
    kernels: exp2(min(s, clamp)), denominator riding the pv dot."""
    dt = o_ref.dtype
    hd = C // nH
    for w in range(G):
        r0 = w * Npad
        mask_w = mask_ref[w].astype(jnp.float32) if with_mask else None
        for h in range(nH):
            q = qkv_ref[0, r0:r0 + Npad, h * hd:(h + 1) * hd]
            k = qkv_ref[0, r0:r0 + Npad, C + h * hd:C + (h + 1) * hd]
            v = qkv_ref[0, r0:r0 + Npad, 2 * C + h * hd:2 * C + (h + 1) * hd]
            s = jax.lax.dot_general(
                (q.astype(jnp.float32) * scale2).astype(dt), k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + bias_ref[h].astype(jnp.float32)
            if mask_w is not None:
                s = s + mask_w
            p = jnp.exp2(jnp.minimum(s, _CLAMP2)).astype(dt)
            ol = jax.lax.dot_general(
                p, jnp.concatenate([v, jnp.ones((Npad, 8), dt)], axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            l = jnp.maximum(ol[:, hd:hd + 1], 1e-30)
            o_ref[0, r0:r0 + Npad, h * hd:(h + 1) * hd] = \
                (ol[:, :hd] / l).astype(dt)


def _core_bwd_kernel(qkv_ref, do_ref, bias_ref, mask_ref, dqkv_ref,
                     dbias_ref, *, G: int, Npad: int, C: int, nH: int,
                     scale2: float, scale_nat: float, with_mask: bool):
    """dq/dk/dv + dbias with scores/probs VMEM-resident.

    Recomputes p per (window, head), then the exact softmax vjp.  dbias
    accumulates across ALL grid steps (constant-index output block; TPU
    grids run sequentially)."""
    dt = dqkv_ref.dtype
    hd = C // nH
    r = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(jnp.logical_and(r == 0, b == 0))
    def _init():
        dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    for w in range(G):
        r0 = w * Npad
        mask_w = mask_ref[w].astype(jnp.float32) if with_mask else None
        for h in range(nH):
            q = qkv_ref[0, r0:r0 + Npad, h * hd:(h + 1) * hd]
            k = qkv_ref[0, r0:r0 + Npad, C + h * hd:C + (h + 1) * hd]
            v = qkv_ref[0, r0:r0 + Npad, 2 * C + h * hd:2 * C + (h + 1) * hd]
            do = do_ref[0, r0:r0 + Npad, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                (q.astype(jnp.float32) * scale2).astype(dt), k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + bias_ref[h].astype(jnp.float32)
            if mask_w is not None:
                s = s + mask_w
            e = jnp.exp2(jnp.minimum(s, _CLAMP2))
            l = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
            p = e / l
            p_dt = p.astype(dt)
            # dv_j = sum_i p_ij do_i  (contract the row axis)
            dv = jax.lax.dot_general(
                p_dt, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            t = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = p * (dp - t)
            ds_dt = ds.astype(dt)
            dq = jax.lax.dot_general(
                ds_dt, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale_nat
            dk = jax.lax.dot_general(
                ds_dt, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale_nat
            dqkv_ref[0, r0:r0 + Npad, h * hd:(h + 1) * hd] = dq.astype(dt)
            dqkv_ref[0, r0:r0 + Npad, C + h * hd:C + (h + 1) * hd] = \
                dk.astype(dt)
            dqkv_ref[0, r0:r0 + Npad,
                     2 * C + h * hd:2 * C + (h + 1) * hd] = dv.astype(dt)
            dbias_ref[h] = dbias_ref[h] + ds


def _prep(bias: Array, mask: Optional[Array], Npad: int, dt):
    """log2e-fold bias/mask exactly like _fused_block_forward_wm."""
    bias_p = (bias.astype(jnp.float32) * _LOG2E).astype(dt)
    if mask is not None:
        N = mask.shape[-1]
        m = mask.astype(jnp.float32) * _LOG2E
        if Npad > N:
            m = jnp.pad(m, ((0, 0), (0, Npad - N), (0, Npad - N)))
        m = m.astype(dt)
    else:
        m = jnp.zeros((1, Npad, Npad), dt)
    return bias_p, m


def _specs(B: int, nW: int, Npad: int, C: int, nH: int, with_mask: bool,
           G: int):
    grid = (nW // G, B)  # batch fastest: bias/mask stay resident
    slab = lambda width: pl.BlockSpec(
        (1, G * Npad, width), lambda r, b: (b, r, 0),
        memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda r, b: (0,) * len(shape), memory_space=pltpu.VMEM)
    mask_spec = (pl.BlockSpec((G, Npad, Npad), lambda r, b: (r, 0, 0),
                              memory_space=pltpu.VMEM) if with_mask
                 else full((1, Npad, Npad)))
    return grid, slab, full, mask_spec


def _core_fwd_call(qkv: Array, bias: Array, mask: Optional[Array],
                   nH: int, scale: float) -> Array:
    B, nW, Npad, C3 = qkv.shape
    C = C3 // 3
    dt = qkv.dtype
    with_mask = mask is not None
    bias_p, m = _prep(bias, mask, Npad, dt)
    G = _pick_group(nW, Npad, C3)
    grid, slab, full, mask_spec = _specs(B, nW, Npad, C, nH, with_mask, G)
    kernel = functools.partial(
        _core_fwd_kernel, G=G, Npad=Npad, C=C, nH=nH,
        scale2=scale * _LOG2E, with_mask=with_mask)
    hd = C // nH
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[slab(C3), full((nH, Npad, Npad)), mask_spec],
        out_specs=slab(C),
        out_shape=jax.ShapeDtypeStruct((B, nW * Npad, C), dt),
        cost_estimate=pl.CostEstimate(
            flops=B * nW * nH * 4 * Npad * Npad * hd,
            bytes_accessed=qkv.size * 2 + B * nW * Npad * C * 2,
            transcendentals=B * nW * nH * Npad * Npad),
    )(qkv.reshape(B, nW * Npad, C3), bias_p, m)
    return out.reshape(B, nW, Npad, C)


def _core_bwd_call(qkv: Array, do: Array, bias: Array,
                   mask: Optional[Array], nH: int, scale: float):
    B, nW, Npad, C3 = qkv.shape
    C = C3 // 3
    dt = qkv.dtype
    with_mask = mask is not None
    bias_p, m = _prep(bias, mask, Npad, dt)
    G = _pick_group_bwd(nW, Npad, C3, nH, dt.itemsize)
    assert core_bwd_supported(Npad, C, nH, dt.itemsize), (
        f"swin_core_attn backward working set exceeds VMEM even at G=1 "
        f"(Npad={Npad}, C={C}, nH={nH}); gate via core_bwd_supported")
    grid, slab, full, mask_spec = _specs(B, nW, Npad, C, nH, with_mask, G)
    kernel = functools.partial(
        _core_bwd_kernel, G=G, Npad=Npad, C=C, nH=nH,
        scale2=scale * _LOG2E, scale_nat=scale, with_mask=with_mask)
    hd = C // nH
    dbias_spec = pl.BlockSpec((nH, Npad, Npad), lambda r, b: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[slab(C3), slab(C), full((nH, Npad, Npad)), mask_spec],
        out_specs=[slab(C3), dbias_spec],
        out_shape=[jax.ShapeDtypeStruct((B, nW * Npad, C3), dt),
                   jax.ShapeDtypeStruct((nH, Npad, Npad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=B * nW * nH * 10 * Npad * Npad * hd,
            bytes_accessed=2 * qkv.size * 2 + 2 * B * nW * Npad * C * 2,
            transcendentals=B * nW * nH * Npad * Npad),
    )(qkv.reshape(B, nW * Npad, C3), do.reshape(B, nW * Npad, C),
      bias_p, m)
    return dqkv.reshape(B, nW, Npad, C3), dbias.astype(bias.dtype)


def _core_ref(qkv: Array, bias: Array, mask: Optional[Array], nH: int,
              scale: float) -> Array:
    """Pure-JAX oracle of the core (tests)."""
    B, nW, Npad, C3 = qkv.shape
    C = C3 // 3
    hd = C // nH
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda t: t.reshape(B * nW, Npad, nH, hd).transpose(0, 2, 1, 3)
    q, k, v = rs(q), rs(k), rs(v)
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                   preferred_element_type=jnp.float32)
    s = s + bias[None].astype(s.dtype)
    if mask is not None:
        N = mask.shape[-1]
        m = mask.astype(s.dtype)
        if Npad > N:
            m = jnp.pad(m, ((0, 0), (0, Npad - N), (0, Npad - N)))
        s = s.reshape(B, nW, nH, Npad, Npad) + m[None, :, None]
        s = s.reshape(B * nW, nH, Npad, Npad)
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, nW, Npad, C)
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def swin_core_attn(qkv: Array, bias: Array, mask: Array, with_mask: bool,
                   nH: int, scale: float) -> Array:
    """Window-attention core as a flash custom_vjp: Pallas fwd AND bwd.

    qkv [B, nW, Npad, 3C]; bias [nH, Npad, Npad] (natural units);
    mask [nW, N, N] additive when with_mask else a dummy array (its
    cotangent is ZERO by design — see module docstring).

    PRECONDITION (Npad > N): the caller must bake a strongly-negative
    value (rel_pos_bias_wm uses -100) into the pad-KEY columns
    ``bias[:, :, N:]`` — this kernel does not mask pad keys itself, so an
    unpadded/zero-padded bias would leak pad-key attention (the pure-JAX
    ``_wm_ref_native`` is structurally immune; this boundary is not)."""
    return _core_fwd_call(qkv, bias, mask if with_mask else None, nH,
                          scale)


def _core_vjp_fwd(qkv, bias, mask, with_mask, nH, scale):
    out = _core_fwd_call(qkv, bias, mask if with_mask else None, nH, scale)
    return out, (qkv, bias, mask)


def _core_vjp_bwd(with_mask, nH, scale, res, g):
    qkv, bias, mask = res
    dqkv, dbias = _core_bwd_call(qkv, g.astype(qkv.dtype), bias,
                                 mask if with_mask else None, nH, scale)
    return dqkv, dbias, jnp.zeros_like(mask)


swin_core_attn.defvjp(_core_vjp_fwd, _core_vjp_bwd)
