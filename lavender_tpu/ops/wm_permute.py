"""One-pass Pallas relayout for the window-major cyclic shift.

``wm_shift`` (reverse -> roll -> partition, ops/swin_block_attn.py:792)
is a STATIC row permutation of the ``[nW * Npad]`` row space: every real
output token row is exactly one real input token row, and pad rows are
zeroed.  XLA lowers the reverse/roll/partition composition to 2-3 copy
passes with a ~0.4-0.7 ms fixed cost per call on the bench chip
(measured via ``_perf/time_components.py --parts shifts``: 18-85 GB/s
effective vs the 122 GB/s HBM peak; stage 3's 18 shifts alone cost
15.5 ms of a 53.7 ms Swin-B forward).  This kernel does the permutation
as ONE read + ONE write:

* The wm layout keeps the FULL temporal axis inside every window
  (``wd == D`` — wm_partition reshapes over all of D), so window
  crossing happens only along (h, w).  Rows of each output window then
  decompose into a handful of CONTIGUOUS source runs (the w-roll splits
  each (d, h) line into <=2 runs; runs merge across h/d lines away from
  the wrap boundaries), computed at trace time with numpy.
* The body is a static unrolled list of sublane-slice copies plus one
  zero store per window tail pad — no gathers, no dynamic indices.
* Gradients: the forward is a permutation matrix with zeroed pad rows,
  so its vjp is EXACTLY the inverse shift (real rows invert the roll,
  pad cotangents vanish) — the backward is another one-pass call.

Reference behavior: the torch reference materializes the same shift as
``torch.roll`` on the spatial tensor + re-partition
(video_swin.py:154-170); numerics here are identical including the
zeroed pads.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


@functools.lru_cache(maxsize=128)
def _perm_runs(window: Tuple[int, int, int], D: int, H: int, W: int,
               Npad: int, shift: Tuple[int, int, int], inverse: bool):
    """Contiguous-run decomposition of the shift permutation.

    Returns (runs, pads): runs = [(dst, src, length)] over the flat
    [nW * Npad] row space with out[dst:dst+length] = in[src:src+length];
    pads = [(dst, length)] rows to zero (window tail pads).
    """
    wd, wh, ww = window
    if wd != D:
        raise ValueError(f"wm layout requires wd == D, got {wd} vs {D}")
    nR, nWc = H // wh, W // ww
    N = wd * wh * ww
    # wm_shift: forward rolls by -shift, inverse by +shift;
    # jnp.roll(x, sh)[c] == x[(c - sh) % size].
    sh = tuple(int(s) if inverse else -int(s) for s in shift)
    runs: List[Tuple[int, int, int]] = []
    pads: List[Tuple[int, int]] = []
    for r in range(nR):
        for c in range(nWc):
            base = (r * nWc + c) * Npad
            for d in range(wd):
                sd = (d - sh[0]) % D
                for i in range(wh):
                    src_h = (r * wh + i - sh[1]) % H
                    sr, si = divmod(src_h, wh)
                    dst0 = base + d * wh * ww + i * ww
                    srcs = []
                    for j in range(ww):
                        src_w = (c * ww + j - sh[2]) % W
                        sc, sj = divmod(src_w, ww)
                        srcs.append((sr * nWc + sc) * Npad
                                    + sd * wh * ww + si * ww + sj)
                    s0 = 0
                    for j in range(1, ww + 1):
                        if j == ww or srcs[j] != srcs[j - 1] + 1:
                            runs.append((dst0 + s0, srcs[s0], j - s0))
                            s0 = j
            if Npad > N:
                pads.append((base + N, Npad - N))
    # Merge runs contiguous in BOTH dst and src (h/d lines away from the
    # wrap boundaries chain into long copies — typically cuts the count
    # ~4x, e.g. stage 1 at 224^2: 64 windows x ~40 line-runs -> ~700).
    runs.sort()
    merged = [list(runs[0])]
    for dst, src, ln in runs[1:]:
        m = merged[-1]
        if dst == m[0] + m[2] and src == m[1] + m[2]:
            m[2] += ln
        else:
            merged.append([dst, src, ln])
    return tuple(tuple(m) for m in merged), tuple(pads)


@functools.lru_cache(maxsize=128)
def perm_runs_by_window(window: Tuple[int, int, int], D: int, H: int,
                        W: int, Npad: int, shift: Tuple[int, int, int]):
    """Forward-shift runs grouped by DESTINATION window, for the
    in-kernel-shift block kernel (swin_block_attn._block_kernel_wm_shift):
    per dst window w, a dst-sorted tuple of (dst_off, src, length) with
    dst_off relative to the window start, covering exactly [0, N).
    ``src`` stays in the flat [nW * Npad] row space."""
    wd, wh, ww = window
    nW = (H // wh) * (W // ww)
    N = wd * wh * ww
    runs, _pads = _perm_runs(window, D, H, W, Npad, tuple(shift), False)
    by_w: List[List[Tuple[int, int, int]]] = [[] for _ in range(nW)]
    for dst, src, ln in runs:
        while ln > 0:  # merged runs can straddle windows when Npad == N
            w = dst // Npad
            take = min(ln, (w + 1) * Npad - dst)
            by_w[w].append((dst - w * Npad, src, take))
            dst, src, ln = dst + take, src + take, ln - take
    out = []
    for w, lst in enumerate(by_w):
        lst.sort()
        assert sum(r[2] for r in lst) == N and lst[0][0] == 0, (w, lst)
        out.append(tuple(lst))
    return tuple(out)


def _perm_kernel(x_ref, o_ref, *, runs, pads):
    for dst, src, ln in runs:
        o_ref[0, dst:dst + ln, :] = x_ref[0, src:src + ln, :]
    if pads:
        C = o_ref.shape[-1]
        for dst, ln in pads:
            o_ref[0, dst:dst + ln, :] = jnp.zeros((ln, C), o_ref.dtype)


def _shift_impl(t: Array, window, D, H, W, shift, inverse) -> Array:
    B, nW, Npad, C = t.shape
    runs, pads = _perm_runs(tuple(window), D, H, W, Npad,
                            tuple(shift), bool(inverse))
    R = nW * Npad
    out = pl.pallas_call(
        functools.partial(_perm_kernel, runs=runs, pads=pads),
        out_shape=jax.ShapeDtypeStruct((B, R, C), t.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R, C), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, R, C), lambda b: (b, 0, 0)),
    )(t.reshape(B, R, C))
    return out.reshape(B, nW, Npad, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def wm_shift_pallas(t: Array, window: Tuple[int, int, int], D: int,
                    H: int, W: int, shift: Tuple[int, int, int],
                    inverse: bool = False) -> Array:
    """Drop-in for ``wm_shift`` (same signature semantics) as one
    Pallas copy pass.  t: window-major [B, nW, Npad, C]."""
    return _shift_impl(t, window, D, H, W, shift, inverse)


def _shift_fwd(t, window, D, H, W, shift, inverse):
    return _shift_impl(t, window, D, H, W, shift, inverse), None


def _shift_bwd(window, D, H, W, shift, inverse, _, g):
    # transpose of a permutation with zeroed pads == the inverse shift
    return (_shift_impl(g, window, D, H, W, shift, not inverse),)


wm_shift_pallas.defvjp(_shift_fwd, _shift_bwd)


def supports_pallas_shift(window, D: int, H: int, W: int,
                          Npad: int) -> bool:
    """Geometry guard for the fast path: wm layout (wd == D), whole
    windows, 8-aligned sublane rows."""
    wd, wh, ww = window
    return (wd == D and H % wh == 0 and W % ww == 0 and Npad % 8 == 0)
