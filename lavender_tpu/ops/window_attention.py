"""Fused window attention — Pallas TPU kernel for Video Swin's hot loop.

Reference hot loop: WindowAttention3D (video_swin.py:145-170) — per window:
scores = q k^T * scale + rel-pos-bias (+ shift mask), softmax, @ v.

Why a kernel: the XLA path materializes the [W*nH, N, N] attention tensor in
HBM twice per block (f32).  For Swin-B stage 1 at batch 16 that is ~1 GB of
traffic per block — the measured bottleneck (~93 ms/fwd).  This kernel keeps
scores in VMEM: one grid step = one (window, head), everything fits easily
(N <= 392 for window (8,7,7), <= 1152 for (8,12,12)).

Backward uses a recompute strategy expressed in pure JAX (windows are tiny,
so recompute is cheap and XLA fuses it reasonably); forward inference — the
serving path — gets the full fused win.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def window_attention_reference(q: Array, k: Array, v: Array, bias: Array,
                               mask: Optional[Array] = None,
                               scale: Optional[float] = None) -> Array:
    """Pure-JAX oracle. q/k/v: [W, nH, N, hd]; bias: [nH, N, N];
    mask: [nW, N, N] or None (W must be a multiple of nW)."""
    W, nH, N, hd = q.shape
    scale = scale or hd ** -0.5
    attn = jnp.einsum("whnd,whmd->whnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(W // nW, nW, nH, N, N)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(W, nH, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("whnm,whmd->whnd", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                 scale: float, has_mask: bool):
    """One grid step = WB windows x all heads.

    A fori_loop over (window, head) pairs with 2-D MXU dots: batched 3-D
    matmuls and fully-unrolled loops both compile pathologically in Mosaic;
    a rolled loop keeps the program tiny while the block granularity keeps
    DMAs large and grid steps few.  Operands stay in the input dtype (bf16
    on the serving path) with f32 accumulation.
    """
    WB, nH, N, hd = q_ref.shape

    def body(i, _):
        wi = i // nH
        h = i % nH
        q = q_ref[wi, h]  # [N, hd]
        k = k_ref[wi, h]
        v = v_ref[wi, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [N, N]
        s = s + bias_ref[h].astype(jnp.float32)
        if has_mask:
            s = s + mask_ref[wi].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[wi, h] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, WB * nH, body, 0)


def _pick_window_block(W: int, nW: Optional[int], nH: int, N: int,
                       vmem_budget: int = 6 * 1024 * 1024) -> int:
    """Largest WB dividing W (and nW if masked) with f32 scores in budget."""
    per_win = nH * N * N * 4
    wb = max(1, vmem_budget // max(per_win, 1))
    while wb > 1 and (W % wb != 0 or (nW is not None and nW % wb != 0)):
        wb -= 1
    if nW is not None:
        wb = min(wb, nW)
    return max(1, wb)


def _fused_forward(q: Array, k: Array, v: Array, bias: Array,
                   mask: Optional[Array], scale: float) -> Array:
    W, nH, N, hd = q.shape
    has_mask = mask is not None
    if not has_mask:
        mask = jnp.zeros((1, N, N), q.dtype)  # dummy (not read)
    nW = mask.shape[0]
    WB = _pick_window_block(W, nW if has_mask else None, nH, N)

    if has_mask:
        n_mask_blocks = nW // WB
        mask_spec = pl.BlockSpec(
            (WB, N, N), lambda i: (i % n_mask_blocks, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, N, N), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    qkv_spec = pl.BlockSpec((WB, nH, N, hd), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(W // WB,),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((nH, N, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((WB, nH, N, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_attn_kernel, scale=scale, has_mask=has_mask)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W, nH, N, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * W * nH * N * N * hd,
            bytes_accessed=(3 * W * nH * N * hd + W * nH * N * hd) * 2
            + nH * N * N * 4,
            transcendentals=W * nH * N * N),
    )(q, k, v, bias, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_window_attention(q: Array, k: Array, v: Array, bias: Array,
                           mask: Optional[Array], scale: float) -> Array:
    """softmax(q k^T * scale + bias (+ mask)) v, fused in VMEM.

    q/k/v: [W, nH, N, hd]; bias: [nH, N, N] (rel-pos); mask: [nW, N, N]|None.
    """
    return _fused_forward(q, k, v, bias, mask, scale)


def _fwd(q, k, v, bias, mask, scale):
    out = _fused_forward(q, k, v, bias, mask, scale)
    return out, (q, k, v, bias, mask)


def _bwd(scale, res, g):
    q, k, v, bias, mask = res
    W, nH, N, hd = q.shape
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("whnd,whmd->whnm", qf * scale, kf)
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        nW = mask.shape[0]
        s = (s.reshape(W // nW, nW, nH, N, N)
             + mask[None, :, None].astype(jnp.float32)).reshape(W, nH, N, N)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("whnm,whnd->whmd", p, gf)
    dp = jnp.einsum("whnd,whmd->whnm", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("whnm,whmd->whnd", ds, kf) * scale
    dk = jnp.einsum("whnm,whnd->whmd", ds, qf * scale)
    dbias = ds.sum(axis=0)
    dmask = None
    if mask is not None:
        nW = mask.shape[0]
        dmask = ds.reshape(W // nW, nW, nH, N, N).sum(axis=(0, 2))
        dmask = dmask.astype(mask.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dmask)


fused_window_attention.defvjp(_fwd, _bwd)
