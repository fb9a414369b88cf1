"""Pallas TPU kernel for the raw-uint8 3D patch embed.

Reference semantics: PatchEmbed3D (video_swin.py:371-405) — Conv3d
kernel (2, 4, 4), temporal stride 1 with end pad, spatial stride (4, 4)
— preceded by the per-channel ImageNet normalize, which is affine and
folds into the conv weights exactly (see models/swin3d.PatchEmbed3D.
_u8_embed for the fold's algebra and the temporal-pad bias table).

Why a kernel: the XLA lowerings of this conv are the single
worst-utilization op in the serving profile (PERF.md round 4: the
conv+normalize loop fusion ran at 4% of MXU peak; the s2d+matmul
alternative (LVT_U8EMB) moved the cost into a byte-granular u8
space-to-depth transpose and measured the same; the standalone scan
put the op at ~2.9 ms of a 45 ms batch).  The irreducible im2col
relayout is the problem: (j, kw, c) lanes must become (j) rows x
(kd, kh, kw, c) lanes before any dense matmul.

This kernel never materializes the im2col.  The only host-side prep is
a kh row split ([..., 56, 4, 672] -> [..., 4, 56, 672] — a pure ROW
permutation, each output row one contiguous 672-byte copy, which XLA
does at memcpy speed, unlike the byte-granular s2d shuffle).  Per
(b, t) grid step the kernel then holds the frame pair's 4 kh-planes in
VMEM and contracts straight out of the row layout with BLOCK-DIAGONAL
weights:

- lane chunk ``[:, 96*jc : 96*jc+96]`` of a kh-plane covers 8 output
  columns (8 j-blocks x 12 lanes = (kw, c));
- one dot [56, 96] @ Wbd[t, kh] [96, 8*E] against the block-diagonal
  weight (block j = the [12, E] tap matrix) yields those 8 columns for
  all 56 output rows, lanes (j_local, e); the 8 (t, kh) taps accumulate
  in the f32 VREG accumulator.  The 8x FLOP padding of the block
  diagonal costs less than any relayout.

Output is [B, D, h2, w2*E]; the caller reshapes to [B, D, h2, w2, E]
(one XLA tiled-layout copy) and applies the patch LayerNorm as before.

Serving-only; the training path keeps the XLA conv (the module gates on
``deterministic`` — this op has no custom_vjp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def supports_fused_patch_embed(B: int, D: int, H: int, W: int, C: int,
                               patch: tuple) -> bool:
    """Geometry gate: kernel (2, ph, pw), no spatial pad, w2 % 8 == 0,
    RGB input."""
    pd, ph, pw = patch
    if pd != 2 or C != 3:
        return False
    if H % ph or W % pw:
        return False
    w2 = W // pw
    if w2 % 8:
        return False
    # VMEM: frame pair (2 * H * W * 3 u8) + weights (2*ph*96*8E bf16)
    # + acc/out; all small at 224^2 (0.3 MB + 1.5 MB + 0.8 MB)
    return H * W * 3 <= 2 * 1024 * 1024


def _u8_to_bf16(t):
    # Mosaic has no direct u8->bf16 cast; go via int32/f32 (cheap VPU
    # passes, and 0..255 is exact in every step)
    return t.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _pe_kernel(x0_ref, x1_ref, w_ref, bt_ref, o_ref, *, ph: int, pw: int,
               h2: int, w2: int, E: int):
    """One grid step = one (clip, output-time).  x0/x1: the two temporal
    taps' kh-planes [1, 1, ph, h2, W*3] u8 (x1 is the zero frame at
    t = D-1); w_ref [pd, ph, 8*pw*3, 8*E] block-diag weights; bt_ref
    [1, 1, 8*E] the per-time bias row (temporal-pad shift correction)
    tiled across the 8 j slots."""
    gw = 8 * E
    ck = 8 * pw * 3  # 96 input lanes per chunk
    bias = bt_ref[0, 0].astype(jnp.float32)
    planes = [(t, _u8_to_bf16(ref[0, 0, kh]))
              for t, ref in ((0, x0_ref), (1, x1_ref))
              for kh in range(ph)]
    for jc in range(w2 // 8):
        acc = bias
        for i, (t, a) in enumerate(planes):
            kh = i % ph
            d = jax.lax.dot_general(
                a[:, ck * jc:ck * (jc + 1)], w_ref[t, kh],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + d
        o_ref[0, 0, :, gw * jc:gw * (jc + 1)] = acc.astype(o_ref.dtype)


def fused_patch_embed_u8(x: Array, kernel: Array, bias: Array,
                         mean, std, dtype=jnp.bfloat16) -> Array:
    """Raw-u8 patch embed: normalize folded + conv(2,4,4)/stride(1,4,4)
    + temporal end-pad, one pallas_call.

    x: [B, D, H, W, 3] uint8; kernel: [2, ph, pw, 3, E] (flax DHWIO);
    bias: [E]; mean/std: length-3 ImageNet stats.  Returns
    [B, D, H//ph, W//pw, E] in ``dtype``.  Exact contract: equals
    device_normalize(x) -> temporal-zero-pad -> conv, up to float
    reassociation (the chunked block-diagonal accumulation sums the
    (kd, kh) taps in f32 in a fixed order).
    """
    B, D, H, W, C = x.shape
    pd, ph, pw, _, E = kernel.shape
    assert supports_fused_patch_embed(B, D, H, W, C, (pd, ph, pw))
    h2, w2 = H // ph, W // pw
    gw = 8 * E

    kern = kernel.astype(jnp.float32)
    a = 1.0 / (255.0 * jnp.asarray(std, jnp.float32))
    b = -(jnp.asarray(mean, jnp.float32) / jnp.asarray(std, jnp.float32))
    kscaled = kern * a[None, None, None, :, None]  # fold the u8 scale
    # per-tap shift: sum over (kh, kw, c) of kern * b_c  -> [pd, E]
    shift = jnp.einsum("dhwce,c->de", kern, b)
    bias_f = bias.astype(jnp.float32)
    # output time t reads taps kd=0 (frame t) and kd=1 (frame t+1; at
    # t = D-1 that is the pad frame, which must contribute normalized
    # ZERO -> no kd=1 shift there).  [D, E] -> lane-tiled [D, 1, 8E]
    # (rank-3 so the per-d block equals the trailing array dims — the
    # Mosaic (8, 128)-divisibility rule, caught only at real lowering).
    t_idx = jnp.arange(D)
    bt = (bias_f[None, :] + shift[0][None, :]
          + jnp.where((t_idx < D - 1)[:, None], shift[1][None, :], 0.0))
    bt8 = jnp.tile(bt, (1, 8)).reshape(D, 1, gw)

    # block-diagonal weights: Wbd[t, kh] [8*pw*3, 8*E], block j_local =
    # the [pw*3, E] tap matrix (rows (kw, c) — the in-row lane order)
    wsm = kscaled.reshape(pd, ph, pw * 3, E)
    eye8 = jnp.eye(8, dtype=jnp.float32)
    wbd = (eye8[:, None, :, None]
           * wsm[:, :, None, :, None, :]).reshape(pd, ph, 8 * pw * 3, gw)
    wbd = wbd.astype(jnp.bfloat16)

    # kh row split OUTSIDE the kernel: [.., H, W*3] -> [.., ph, h2, W*3]
    # — a pure row permutation (contiguous 672-byte rows), XLA-cheap;
    # in-kernel strided row slices don't lower
    xr = x.reshape(B, D, h2, ph, W * 3)
    xp = jnp.pad(xr, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))  # u8 zeros
    xkh = xp.transpose(0, 1, 3, 2, 4)  # [B, D+1, ph, h2, W*3]

    out = pl.pallas_call(
        functools.partial(_pe_kernel, ph=ph, pw=pw, h2=h2, w2=w2, E=E),
        grid=(B, D),
        in_specs=[
            pl.BlockSpec((1, 1, ph, h2, W * 3),
                         lambda b, d: (b, d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ph, h2, W * 3),
                         lambda b, d: (b, d + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pd, ph, 8 * pw * 3, gw),
                         lambda b, d: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gw), lambda b, d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h2, w2 * E),
                               lambda b, d: (b, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, h2, w2 * E), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * h2 * w2 * (pd * ph * pw * 3) * E * 8,
            bytes_accessed=2 * B * D * H * W * 3
                           + B * D * h2 * w2 * E * 2,
            transcendentals=0),
    )(xkh, xkh, wbd, bt8)
    return out.reshape(B, D, h2, w2, E)
