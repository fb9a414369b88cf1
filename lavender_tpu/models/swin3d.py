"""Video Swin Transformer 3D — TPU-native JAX/flax implementation.

Behavioral reference: ``/root/reference/visbackbone/video_swin.py`` (itself a
Video-Swin-Transformer derivative).  This is a from-scratch reimplementation
with TPU-first choices:

* channels-last layout ``[B, T, H, W, C]`` throughout (native for XLA conv /
  MXU tiling) instead of torch's NCDHW;
* shifted-window attention masks are computed in **numpy at trace time**
  (shapes are static under jit) and baked in as constants — no device-side
  mask construction (reference: ``compute_mask``, video_swin.py:290-305);
* the window partition/reverse are pure reshapes+transposes that XLA fuses;
  the attention itself can optionally run as a fused Pallas kernel
  (``lavender_tpu.ops.window_attention``).

Quirks faithfully reproduced (these matter for checkpoint parity):
* PatchEmbed3D uses kernel (2,4,4) with temporal stride **1** and pads the
  temporal axis by +1 at the end, so T_out == T_in (video_swin.py:382,396);
* windows shrink to the input size when an axis is smaller than the window,
  and the shift on that axis is dropped (``get_window_size``,
  video_swin.py:93-106);
* relative-position bias indices are sliced ``[:N, :N]`` from the full-window
  index table when the window shrinks (video_swin.py:153).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lavender_tpu.config import SwinConfig

# A/B flag: fuse the cyclic shift into the shifted wm block kernels
# (fused_swin_block_wm_shifted) where the geometry allows — deletes the
# wm_shift relayout pair around every qualifying shifted block.
# MEASURED A LOSS on TPU (456.7 vs 476.2 clips/s same-run control): the
# one-pass LVT_PSHIFT relayout is already cheap, and the in-kernel
# misaligned gather/scatter + the 4-window unroll + losing the merged-MLP
# kernel for shifted blocks cost more than the saved HBM round-trips.
# Kept env-gated OFF (the op is correct and parity-tested).
_IKS = __import__("os").environ.get("LVT_IKS", "0") == "1"

# LVT_BIASHOIST: build every wm block's rel-pos bias in one vmapped
# gather before the stage scan (serving path) instead of per block inside
# it.  Profiled round 4: the in-scan gathers cost 2.2 ms/iter at B=24
# (VMEM-write-bound [Npad^2, nH] takes in stage 3).  Default ON.
_BIASHOIST = __import__("os").environ.get("LVT_BIASHOIST", "1") == "1"

# LVT_FOLDCACHE: when the serving cache is BUILT (build_serving_bias_cache)
# also precompute, per block, the LN-affine-folded qkv and MLP-w1 weights
# (W' = diag(s) W, b' = b_ln W + b) and have the wm kernels apply the pure
# normalize only — deletes 4 slab-wide VPU passes per full block, the
# largest measured non-MLP cost at stage 1 (phase-B decomposition,
# PERF.md round 5).  The trace-time variant (LVT_LNFOLD) measured a −7.2
# LOSS because the fold ops ride the block scan; the cache variant pays
# the fold once at cache-build time and zero per step.  Applies ONLY when
# a cache collection is present — cacheless applies are unchanged.
_FOLDCACHE = __import__("os").environ.get("LVT_FOLDCACHE", "1") == "1"

# LVT_PEK (experiment, default OFF until TPU-measured): route the raw-u8
# patch embed through the Pallas block-diagonal kernel
# (ops/patch_embed_u8.py) instead of the u8 s2d + matmul — the XLA
# lowerings of this conv are the worst-utilization op in the serving
# profile (1.5 ms at 4% MXU peak, PERF.md round 4).
_PEK = __import__("os").environ.get("LVT_PEK", "0") == "1"

Array = jax.Array


def window_partition(x: Array, ws: Tuple[int, int, int]) -> Array:
    """[B,D,H,W,C] -> [B*nW, wd*wh*ww, C] (video_swin.py:82-86)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2], ws[2], C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws[0] * ws[1] * ws[2], C)


def window_reverse(windows: Array, ws: Tuple[int, int, int],
                   B: int, D: int, H: int, W: int) -> Array:
    """[B*nW, wd*wh*ww, C] -> [B,D,H,W,C] (video_swin.py:88-91)."""
    x = windows.reshape(B, D // ws[0], H // ws[1], W // ws[2], ws[0], ws[1], ws[2], -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


def get_window_size(x_size: Sequence[int], window_size: Sequence[int],
                    shift_size: Optional[Sequence[int]] = None):
    """Shrink window/shift to the input size per axis (video_swin.py:93-106)."""
    use_ws = list(window_size)
    use_ss = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_ws[i] = x_size[i]
            if use_ss is not None:
                use_ss[i] = 0
    if use_ss is None:
        return tuple(use_ws)
    return tuple(use_ws), tuple(use_ss)


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: Tuple[int, int, int]) -> np.ndarray:
    """3D relative-position bias index table (video_swin.py:121-135).

    Returns int32 [N, N] with N = prod(window_size); values index into the
    bias table of size (2wd-1)(2wh-1)(2ww-1).
    """
    wd, wh, ww = window_size
    coords = np.stack(np.meshgrid(
        np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij"))  # [3,wd,wh,ww]
    flat = coords.reshape(3, -1)  # [3, N]
    rel = flat[:, :, None] - flat[:, None, :]  # [3, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # [N, N, 3]
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= (2 * ww - 1)
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def compute_shift_mask(D: int, H: int, W: int,
                       window_size: Tuple[int, int, int],
                       shift_size: Tuple[int, int, int]) -> np.ndarray:
    """Attention mask for cyclic-shifted windows (video_swin.py:290-305).

    Pure numpy — shapes are static under jit, so the mask is a compile-time
    constant.  Returns float32 [nW, N, N] with 0 / -100 entries.
    """
    img_mask = np.zeros((1, D, H, W, 1), dtype=np.float32)
    cnt = 0
    for d in (slice(-window_size[0]), slice(-window_size[0], -shift_size[0]),
              slice(-shift_size[0], None)):
        for h in (slice(-window_size[1]), slice(-window_size[1], -shift_size[1]),
                  slice(-shift_size[1], None)):
            for w in (slice(-window_size[2]), slice(-window_size[2], -shift_size[2]),
                      slice(-shift_size[2], None)):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    B, D_, H_, W_, C = img_mask.shape
    ws = window_size
    m = img_mask.reshape(B, D_ // ws[0], ws[0], H_ // ws[1], ws[1],
                         W_ // ws[2], ws[2], C)
    m = m.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, ws[0] * ws[1] * ws[2])
    attn_mask = m[:, None, :] - m[:, :, None]
    # NOTE: reference computes (m.unsqueeze(1) - m.unsqueeze(2)) then masks
    # nonzero entries to -100; sign of the difference is irrelevant.
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask


def relative_position_index_jnp(window_size: Tuple[int, int, int]) -> Array:
    """relative_position_index built from iota arithmetic ON DEVICE.

    Numpy constants of this size ([N, N] per stage, plus the [nW, N, N]
    shift masks) get inlined as MLIR literals; on a remote-compile backend
    that bloats the module by tens of MB and dominates compile time — so
    everything is computed from iota instead (zero literals).
    """
    wd, wh, ww = window_size
    N = wd * wh * ww
    idx = jnp.arange(N, dtype=jnp.int32)
    d = idx // (wh * ww)
    h = (idx // ww) % wh
    w = idx % ww
    rel_d = d[:, None] - d[None, :] + (wd - 1)
    rel_h = h[:, None] - h[None, :] + (wh - 1)
    rel_w = w[:, None] - w[None, :] + (ww - 1)
    return (rel_d * (2 * wh - 1) * (2 * ww - 1)
            + rel_h * (2 * ww - 1) + rel_w)


def compute_shift_mask_jnp(D: int, H: int, W: int,
                           window_size: Tuple[int, int, int],
                           shift_size: Tuple[int, int, int]) -> Array:
    """compute_shift_mask built on device (see relative_position_index_jnp
    for why).  Same -100/0 semantics as the numpy oracle."""
    def region(n, w, s):
        # slices (0, n-w), (n-w, n-s), (n-s, n); s == 0 -> everything is
        # region 2 (matches the reference's slice(-0, None) == full slice)
        i = jnp.arange(n, dtype=jnp.int32)
        if s == 0:
            return jnp.full((n,), 2, jnp.int32)
        return jnp.where(i < n - w, 0, jnp.where(i < n - s, 1, 2))

    rd = region(D, window_size[0], shift_size[0])
    rh = region(H, window_size[1], shift_size[1])
    rw = region(W, window_size[2], shift_size[2])
    cnt = (rd[:, None, None] * 9 + rh[None, :, None] * 3
           + rw[None, None, :]).astype(jnp.float32)
    m = window_partition(cnt[None, :, :, :, None], window_size)[..., 0]
    diff = m[:, None, :] - m[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0).astype(jnp.float32)


def resolve_attn_impl(impl: str) -> str:
    """'auto' -> the fastest supported implementation for the current
    backend: the window-major fused kernels on TPU (which themselves fall
    back per-stage to the spatial fused kernels, and those to XLA, when a
    geometry is unsupported), the XLA einsum path elsewhere (Mosaic
    kernels only lower on TPU).

    Tensor parallelism (round-5): under a global mesh with tp>1, 'auto'
    resolves to 'xla' even on TPU — Mosaic custom calls have no GSPMD
    partitioning rules, so the kernels would force an all-gather of every
    model-sharded weight and run fully replicated (correct, parity-tested
    in test_parallel, but it erases TP's compute scaling); the XLA path
    lets GSPMD shard the qkv/proj/MLP dots Megatron-style
    (parallel/mesh.py param rules).  Forcing impl='wm' under tp>1 remains
    supported and correct."""
    if impl != "auto":
        return impl
    if jax.default_backend() != "tpu":
        return "xla"
    from lavender_tpu.parallel import mesh as pmesh
    if pmesh.tp_active():
        return "xla"
    return "wm"


def drop_path(x: Array, rate, deterministic: bool, rng) -> Array:
    """Stochastic depth per sample (video_swin.py:46-54).

    ``rate`` may be a python float or a traced scalar (the scanned-stage
    path feeds per-block rates as scan inputs).
    """
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    # divide in x.dtype: a TRACED rate (scanned stages feed dp rates as f32
    # scan inputs) would otherwise promote bf16 activations to f32 and break
    # the scan-carry dtype invariant
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                     jnp.zeros((), x.dtype))


def drop_path_lerp(x: Array, full: Array, rate, deterministic: bool,
                   rng) -> Array:
    """Stochastic depth applied to a RESIDUAL-FOLDED output:
    ``full = x + f(x)`` -> ``x + coef * (full - x)`` with the same
    per-sample ``coef = bernoulli(keep)/keep`` as :func:`drop_path`.

    Mathematically identical to ``x + drop_path(f(x))``, but lets training
    run the fused kernels (whose custom_vjp computes the whole
    ``x + f(x)`` block) instead of falling back to the XLA module math —
    the round-2 perf gap where drop_path 0.1 forced every finetune off the
    kernels (PERF.md 'stochastic-depth-as-lerp')."""
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return full
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    coef = jnp.where(mask, 1.0 / jnp.asarray(keep, x.dtype),
                     jnp.zeros((), x.dtype))
    return x + coef * (full - x)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class _LNParams(nn.Module):
    """LayerNorm params without the op (for fused kernels); tree-compatible
    with nn.LayerNorm."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Dense params without the op; tree-compatible with nn.Dense."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.in_features, self.out_features))
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return kernel, bias


class _MlpParams(nn.Module):
    in_features: int
    hidden_features: int

    @nn.compact
    def __call__(self):
        k1, b1 = _DenseParams(self.in_features, self.hidden_features,
                              name="fc1")()
        k2, b2 = _DenseParams(self.hidden_features, self.in_features,
                              name="fc2")()
        return k1, b1, k2, b2


class _WinAttnParams(nn.Module):
    """WindowAttention3D's params without the op — param-tree-compatible
    with WindowAttention3D (same names/shapes) for the fused block kernel."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, name="proj")()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1)
             * (2 * self.window_size[2] - 1), self.num_heads))
        return wqkv, bqkv, wproj, bproj, table


class WindowAttention3D(nn.Module):
    """Window multi-head self-attention with 3D relative position bias.

    Reference: WindowAttention3D (video_swin.py:109-170).
    """

    dim: int
    window_size: Tuple[int, int, int]  # full (module) window size
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        """x: [B_, N, C]; mask: [nW, N, N] additive or None."""
        B_, N, C = x.shape
        nH = self.num_heads
        head_dim = C // nH
        scale = self.qk_scale or head_dim ** -0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, nH, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B_, nH, N, hd]

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1)
             * (2 * self.window_size[2] - 1), nH))
        rpi = relative_position_index_jnp(tuple(self.window_size))[:N, :N]
        bias = table[rpi.reshape(-1)].reshape(N, N, nH)
        bias = bias.transpose(2, 0, 1)  # [nH, N, N]

        if self.attn_impl == "pallas":
            from lavender_tpu.ops.window_attention import (
                fused_window_attention)
            out = fused_window_attention(q, k, v, bias, mask, scale)
            x = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = attn + bias[None].astype(attn.dtype)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.reshape(B_ // nW, nW, nH, N, N)
                attn = attn + mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(B_, nH, N, N)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            x = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                           preferred_element_type=jnp.float32
                           ).astype(self.dtype)
            x = x.transpose(0, 2, 1, 3).reshape(B_, N, C)
        x = nn.Dense(C, dtype=self.dtype, name="proj")(x)
        return x


class SwinBlock3D(nn.Module):
    """One Swin 3D block: (shifted-)window attention + MLP.

    Reference: SwinTransformerBlock3D (video_swin.py:173-261).
    """

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift_size: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rate: float = 0.0
    attn_impl: str = "xla"
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 dp_rate=None) -> Array:
        """dp_rate: optional traced per-call drop-path rate (scan path)."""
        B, D, H, W, C = x.shape
        window_size, shift_size = get_window_size(
            (D, H, W), self.window_size, self.shift_size)

        hidden_f = int(self.dim * self.mlp_ratio)
        n2_scale, n2_bias = _LNParams(self.dim, name="norm2")()
        k1, b1, k2, b2 = _MlpParams(self.dim, hidden_f, name="mlp")()

        from lavender_tpu.ops.swin_block_attn import supports_fused_block
        fused_ok = (self.attn_impl == "fused" and self.qkv_bias
                    and supports_fused_block(D, H, W, window_size))
        if fused_ok:
            # whole-block fused path (ops/swin_block_attn.py): declares the
            # SAME param tree as the module path, so checkpoints and golden
            # tests are layout-identical.
            from lavender_tpu.ops.swin_block_attn import (
                _round8, fused_swin_block_attn, rel_pos_bias_padded)
            n1_scale, n1_bias = _LNParams(self.dim, name="norm1")()
            wqkv, bqkv, wproj, bproj, table = _WinAttnParams(
                dim=self.dim, window_size=tuple(self.window_size),
                num_heads=self.num_heads, qkv_bias=True, name="attn")()
            N = int(np.prod(window_size))
            rpi = relative_position_index(tuple(self.window_size))[:N, :N]
            # padded bias via ONE composed gather (the naive build re-ran
            # three gathers per scan step at ~13 GB/s, see PERF.md)
            bias = rel_pos_bias_padded(
                table, rpi, window_size[0], window_size[1], window_size[2],
                _round8(window_size[2]), self.dtype)
            scale = self.qk_scale or (C // self.num_heads) ** -0.5
            args = (n1_scale, n1_bias, wqkv.astype(self.dtype),
                    bqkv.astype(self.dtype), wproj.astype(self.dtype),
                    bproj.astype(self.dtype), bias)
            rate = dp_rate if dp_rate is not None else self.drop_path_rate
            use_dp = not deterministic and (
                dp_rate is not None or self.drop_path_rate > 0.0)
            if use_dp:
                # same draw+split pattern as the XLA module path below, so
                # fused vs xla training are bit-identical given one seed
                rng1, rng2 = jax.random.split(self.make_rng("dropout"))
            from lavender_tpu.ops.swin_block_attn import (
                fused_swin_block_full, full_block_fits_vmem)
            wwp = _round8(window_size[2])
            Np = window_size[0] * window_size[1] * wwp
            if not use_dp and full_block_fits_vmem(
                    C, hidden_f, self.num_heads, Np):
                # whole block (attn + MLP + both residuals) in ONE kernel
                return fused_swin_block_full(
                    x, *args, n2_scale, n2_bias,
                    k1.astype(self.dtype), b1.astype(self.dtype),
                    k2.astype(self.dtype), b2.astype(self.dtype),
                    window_size, shift_size, self.num_heads, scale,
                    self.layer_norm_eps)
            if not use_dp:
                x = fused_swin_block_attn(
                    x, *args, window_size, shift_size, self.num_heads,
                    scale, self.layer_norm_eps)
            else:
                # training-with-drop-path THROUGH the fused kernel: the
                # kernel's custom_vjp computes full = x + attn(x); the
                # per-sample stochastic-depth coefficient is applied as a
                # lerp x + c*(full - x) — identical math to
                # x + drop_path(attn_out) on the XLA path (gradient-parity
                # test: test_swin_block_fused.py)
                full = fused_swin_block_attn(
                    x, *args, window_size, shift_size, self.num_heads,
                    scale, self.layer_norm_eps)
                x = drop_path_lerp(x, full, rate, deterministic, rng1)

            from lavender_tpu.ops.fused_mlp import (
                fused_ln_mlp, ln_mlp_reference, weights_fit_vmem)
            flat = x.reshape(-1, C)
            if use_dp:
                if weights_fit_vmem(C, hidden_f):
                    out = fused_ln_mlp(flat, n2_scale, n2_bias, k1, b1,
                                       k2, b2, self.layer_norm_eps)
                else:
                    out = ln_mlp_reference(flat, n2_scale, n2_bias, k1, b1,
                                           k2, b2, self.layer_norm_eps)
                mlp_out = out.astype(self.dtype).reshape(x.shape)
                return x + drop_path(mlp_out, rate, deterministic, rng2)
            # inference: residual folded into the kernel (zero extra HBM)
            if weights_fit_vmem(C, hidden_f):
                out = fused_ln_mlp(flat, n2_scale, n2_bias, k1, b1, k2, b2,
                                   self.layer_norm_eps, True)
            else:
                # stage-4-sized MLP (16.8 MB weights): stream HD chunks
                from lavender_tpu.ops.fused_mlp import fused_ln_mlp_chunked
                out = fused_ln_mlp_chunked(
                    flat, n2_scale, n2_bias, k1, b1, k2, b2,
                    self.layer_norm_eps, add_residual=True)
            return out.astype(self.dtype).reshape(x.shape)

        norm1 = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                             name="norm1")
        attn = WindowAttention3D(
            dim=self.dim, window_size=tuple(self.window_size),
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_impl=self.attn_impl,
            dtype=self.dtype, name="attn")

        def part1(x):
            h = norm1(x)
            pad_d1 = (window_size[0] - D % window_size[0]) % window_size[0]
            pad_b = (window_size[1] - H % window_size[1]) % window_size[1]
            pad_r = (window_size[2] - W % window_size[2]) % window_size[2]
            if pad_d1 or pad_b or pad_r:
                h = jnp.pad(h, ((0, 0), (0, pad_d1), (0, pad_b), (0, pad_r), (0, 0)))
            _, Dp, Hp, Wp, _ = h.shape

            shifted = any(s > 0 for s in shift_size)
            if shifted:
                h = jnp.roll(
                    h, shift=(-shift_size[0], -shift_size[1], -shift_size[2]),
                    axis=(1, 2, 3))
                attn_mask = compute_shift_mask_jnp(
                    Dp, Hp, Wp, window_size, shift_size)
            else:
                attn_mask = None

            wins = window_partition(h, window_size)
            wins = attn(wins, mask=attn_mask)
            h = window_reverse(wins, window_size, B, Dp, Hp, Wp)

            if shifted:
                h = jnp.roll(
                    h, shift=(shift_size[0], shift_size[1], shift_size[2]),
                    axis=(1, 2, 3))
            if pad_d1 or pad_b or pad_r:
                h = h[:, :D, :H, :W, :]
            return h

        def part2(x):
            from lavender_tpu.ops.fused_mlp import (
                fused_ln_mlp, ln_mlp_reference, weights_fit_vmem)
            flat = x.reshape(-1, C)
            if (self.attn_impl in ("pallas", "fused")
                    and weights_fit_vmem(C, hidden_f)):
                out = fused_ln_mlp(
                    flat, n2_scale, n2_bias, k1, b1, k2, b2,
                    self.layer_norm_eps)
            else:
                out = ln_mlp_reference(
                    flat, n2_scale, n2_bias, k1, b1, k2, b2,
                    self.layer_norm_eps)
            return out.astype(self.dtype).reshape(x.shape)

        rate = dp_rate if dp_rate is not None else self.drop_path_rate
        needs_rng = not deterministic and (
            dp_rate is not None or self.drop_path_rate > 0.0)
        if needs_rng:
            rng = self.make_rng("dropout")
            rng1, rng2 = jax.random.split(rng)
        else:
            rng1 = rng2 = None
        x = x + drop_path(part1(x), rate, deterministic, rng1)
        x = x + drop_path(part2(x), rate, deterministic, rng2)
        return x


class SwinBlockWM(nn.Module):
    """One Swin 3D block on WINDOW-MAJOR tokens [B, nW, Npad, C].

    Same math and the SAME param tree as SwinBlock3D's fused path (so
    checkpoints and goldens are layout-identical), but the whole stage
    runs window-partitioned: the score tile is Npad^2 = 248^2 instead of
    the spatial kernel's (D*wh*8)^2 = 280^2 (-21% attention FLOPs/VPU
    passes) and slab rows drop 560 -> 496 per 2 windows (-11% qkv/proj/
    MLP rows).  The caller (_BlockPairWM) materializes the cyclic shift
    with wm_shift; ``masked`` selects the shifted block's per-window
    mask.  Reference semantics: SwinTransformerBlock3D
    (video_swin.py:173-261)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    spatial: Tuple[int, int, int]
    shift_size: Tuple[int, int, int]  # (0,0,0) for block a
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    layer_norm_eps: float = 1e-5
    # fuse the cyclic shift into the block kernel (shifted blocks whose
    # whole window axis fits one grid step — see supports_inkernel_shift);
    # the caller must then SKIP its wm_shift pair around this block
    inkernel_shift: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 dp_rate=None, bias: Optional[Array] = None,
                 folded=None) -> Array:
        from lavender_tpu.ops.swin_block_attn import (
            _round8, full_block_fits_vmem, fused_swin_block_wm,
            fused_swin_block_wm_full, fused_swin_block_wm_shifted,
            rel_pos_bias_wm)
        D, H, W = self.spatial
        window_size, shift_size = get_window_size(
            (D, H, W), self.window_size, self.shift_size)
        B, nW, Npad, C = x.shape
        N = int(np.prod(window_size))

        hidden_f = int(self.dim * self.mlp_ratio)
        n2_scale, n2_bias = _LNParams(self.dim, name="norm2")()
        k1, b1, k2, b2 = _MlpParams(self.dim, hidden_f, name="mlp")()
        n1_scale, n1_bias = _LNParams(self.dim, name="norm1")()
        wqkv, bqkv, wproj, bproj, table = _WinAttnParams(
            dim=self.dim, window_size=tuple(self.window_size),
            num_heads=self.num_heads, qkv_bias=True, name="attn")()

        if bias is None:
            # per-block gather (train / init); the serving path hoists
            # this out of the block scan — see BasicLayer's wm branch
            # (measured 2.2 ms/iter of VMEM-write-bound [Npad^2, nH]
            # gathers inside stage 3's scan, PERF.md round 4)
            bias = rel_pos_bias_wm(table, tuple(self.window_size),
                                   window_size, Npad, self.dtype)
        shifted = any(s > 0 for s in shift_size)
        mask = (compute_shift_mask_jnp(D, H, W, window_size, shift_size)
                if shifted else None)
        scale = self.qk_scale or (C // self.num_heads) ** -0.5
        args = (n1_scale, n1_bias, wqkv.astype(self.dtype),
                bqkv.astype(self.dtype), wproj.astype(self.dtype),
                bproj.astype(self.dtype), bias, mask)
        statics = ((D, H, W), window_size, self.num_heads, scale,
                   self.layer_norm_eps)
        rate = dp_rate if dp_rate is not None else 0.0
        use_dp = not deterministic and dp_rate is not None
        if use_dp:
            rng1, rng2 = jax.random.split(self.make_rng("dropout"))

        from lavender_tpu.ops.swin_block_attn import (
            swin_train_composition, wm_attn_half_train,
            wm_attn_half_train_shifted)
        if not deterministic and swin_train_composition():
            # LVT_SWINTRAIN (opt-in, measured LOSS — see the flag note in
            # swin_block_attn.py): plain-AD composition — backward
            # consumes stored LN/qkv/core intermediates instead of
            # re-running the fused kernels' whole forward
            from lavender_tpu.ops.fused_mlp import ln_mlp_reference
            if self.inkernel_shift:
                full = wm_attn_half_train_shifted(
                    x, *args, (D, H, W), window_size, shift_size,
                    self.num_heads, scale, self.layer_norm_eps)
            else:
                full = wm_attn_half_train(
                    x, *args, (D, H, W), window_size, self.num_heads,
                    scale, self.layer_norm_eps)
            x = (drop_path_lerp(x, full, rate, deterministic, rng1)
                 if use_dp else full)
            flat = x.reshape(-1, C)
            out = ln_mlp_reference(flat, n2_scale, n2_bias, k1, b1, k2,
                                   b2, self.layer_norm_eps)
            mlp_out = out.astype(self.dtype).reshape(x.shape)
            if use_dp:
                return x + drop_path(mlp_out, rate, deterministic, rng2)
            return x + mlp_out
        if self.inkernel_shift:
            # shifted block with the cyclic shift fused into the kernel:
            # input/output stay in the UNSHIFTED layout (the caller skips
            # its wm_shift pair); MLP runs as the separate fused call
            # (the mask + whole-window-axis slab leave no VMEM for it)
            statics_s = ((D, H, W), window_size, shift_size,
                         self.num_heads, scale, self.layer_norm_eps)
            full = fused_swin_block_wm_shifted(x, *args, *statics_s)
            x = (drop_path_lerp(x, full, rate, deterministic, rng1)
                 if use_dp else full)
        elif not use_dp and full_block_fits_vmem(
                C, hidden_f, self.num_heads, Npad):
            if folded is not None and deterministic:
                # serving fold cache (LVT_FOLDCACHE): inference-only, no
                # custom_vjp needed — call the forward directly with the
                # prebuilt folded weights
                from lavender_tpu.ops.swin_block_attn import (
                    _fused_block_forward_wm)
                return _fused_block_forward_wm(
                    x, *args, self.num_heads, scale, self.layer_norm_eps,
                    mlp=(n2_scale, n2_bias, k1.astype(self.dtype),
                         b1.astype(self.dtype), k2.astype(self.dtype),
                         b2.astype(self.dtype)),
                    folded=folded)
            return fused_swin_block_wm_full(
                x, *args, n2_scale, n2_bias,
                k1.astype(self.dtype), b1.astype(self.dtype),
                k2.astype(self.dtype), b2.astype(self.dtype), *statics)
        elif not use_dp:
            if folded is not None and deterministic:
                from lavender_tpu.ops.swin_block_attn import (
                    _fused_block_forward_wm)
                x = _fused_block_forward_wm(
                    x, *args, self.num_heads, scale, self.layer_norm_eps,
                    folded=folded)
            else:
                x = fused_swin_block_wm(x, *args, *statics)
        else:
            full = fused_swin_block_wm(x, *args, *statics)
            x = drop_path_lerp(x, full, rate, deterministic, rng1)

        from lavender_tpu.ops.fused_mlp import (
            fused_ln_mlp, ln_mlp_reference, weights_fit_vmem)
        flat = x.reshape(-1, C)
        if use_dp:
            if weights_fit_vmem(C, hidden_f):
                out = fused_ln_mlp(flat, n2_scale, n2_bias, k1, b1,
                                   k2, b2, self.layer_norm_eps)
            else:
                out = ln_mlp_reference(flat, n2_scale, n2_bias, k1, b1,
                                       k2, b2, self.layer_norm_eps)
            mlp_out = out.astype(self.dtype).reshape(x.shape)
            return x + drop_path(mlp_out, rate, deterministic, rng2)
        if weights_fit_vmem(C, hidden_f):
            out = fused_ln_mlp(flat, n2_scale, n2_bias, k1, b1, k2, b2,
                               self.layer_norm_eps, True)
        else:
            from lavender_tpu.ops.fused_mlp import fused_ln_mlp_chunked
            out = fused_ln_mlp_chunked(
                flat, n2_scale, n2_bias, k1, b1, k2, b2,
                self.layer_norm_eps, add_residual=True)
        return out.astype(self.dtype).reshape(x.shape)


def _bias_fingerprint(ta: Array, tb: Array) -> Array:
    """Cheap staleness fingerprint of a block pair's rel-pos bias table
    stacks: [sum_a, sumsq_a, sum_b, sumsq_b] in f32.  Any optimizer step
    or checkpoint swap moves the sums (the probability of an exact
    collision under both sums is negligible)."""
    fa, fb = ta.astype(jnp.float32), tb.astype(jnp.float32)
    return jnp.stack([jnp.sum(fa), jnp.sum(jnp.square(fa)),
                      jnp.sum(fb), jnp.sum(jnp.square(fb))])


def _fold_fingerprint(sub) -> Array:
    """Staleness fingerprint of the fold cache's SOURCE params (norm1,
    qkv kernel, norm2, mlp fc1 kernel for both pair sides): sum + sumsq
    per array, stacked f32 — same collision argument as
    _bias_fingerprint."""
    parts = []
    for side in ("a", "b"):
        p = sub[side]
        for arr in (p["norm1"]["scale"], p["norm1"]["bias"],
                    p["attn"]["qkv"]["kernel"],
                    p["norm2"]["scale"], p["norm2"]["bias"],
                    p["mlp"]["fc1"]["kernel"]):
            f = arr.astype(jnp.float32)
            parts += [jnp.sum(f), jnp.sum(jnp.square(f))]
    return jnp.stack(parts)


def build_serving_bias_cache(model, variables, *example_args,
                             use_jit: bool = True, **apply_kw):
    """One deterministic apply with mutable=['cache'] to precompute every
    wm stage's stacked rel-pos biases OUTSIDE the serving step.

    Returns ``variables`` merged with the new 'cache' collection; pass the
    result to subsequent applies and the wm block scan reads the prebuilt
    [n_pairs, nH, Npad, Npad] stacks instead of gathering (profiled
    round 4: 2.2 ms/iter of in-scan gathers at B=24).  The cache is a pure
    function of params — REBUILD after any param update.  Each layer's
    cache stores a fingerprint of its source tables; call
    ``check_serving_cache`` after any host-level param mutation to catch a
    stale cache (it raises) instead of silently serving wrong biases."""
    def fn(v, *a):
        return model.apply(v, *a, mutable=["cache"], **apply_kw)
    if use_jit:
        fn = jax.jit(fn)
    _, cache = fn(variables, *example_args)
    return {**variables, **cache}


def check_serving_cache(variables) -> bool:
    """Host-side staleness guard for the serving bias cache.

    Walks the 'cache' collection; for every layer that recorded a
    ``bias_fp`` fingerprint, recomputes it from the CURRENT params tables
    at the same tree path and raises ``ValueError`` on mismatch (the cache
    was built from different params — rebuild with
    ``build_serving_bias_cache``).  Returns True when a cache is present
    and fresh, False when no cache collection exists (nothing to check).
    Cheap: sums over the small [n_pairs, L, nH] tables only."""
    cache = variables.get("cache") if isinstance(variables, dict) else None
    if cache is None:
        return False
    params = variables["params"]

    def walk(c, p, path):
        for k, v in dict(c).items():
            if k == "bias_fp":
                sub = p["blocks_scan"]
                want = np.asarray(_bias_fingerprint(
                    sub["a"]["attn"]["relative_position_bias_table"],
                    sub["b"]["attn"]["relative_position_bias_table"]))
                got = np.asarray(v)
                if not np.array_equal(want, got):
                    raise ValueError(
                        f"stale serving bias cache at {'/'.join(path)}: "
                        f"the cached rel-pos biases were built from "
                        f"different params (fingerprint {got} != current "
                        f"{want}).  Rebuild with build_serving_bias_cache "
                        f"after any param update, or drop the 'cache' "
                        f"collection.")
            elif k == "fold_fp":
                want = np.asarray(_fold_fingerprint(p["blocks_scan"]))
                got = np.asarray(v)
                # tolerance, not bitwise: the build-time sums run inside
                # jit (fused reduction order) while this recompute is
                # eager — same values within float rounding; any real
                # param update moves the sums by orders of magnitude more
                if not np.allclose(want, got, rtol=1e-4, atol=1e-5):
                    raise ValueError(
                        f"stale serving bias cache at {'/'.join(path)}: "
                        f"the cached LN-folded weights were built from "
                        f"different params (fold fingerprint mismatch). "
                        f"Rebuild with build_serving_bias_cache after any "
                        f"param update, or drop the 'cache' collection.")
            elif k in ("fold_a", "fold_b"):
                continue
            elif isinstance(v, dict) or hasattr(v, "items"):
                walk(v, p[k], path + (k,))

    walk(cache, params, ())
    return True


class PatchMerging(nn.Module):
    """2x spatial downsample via 4-neighbour concat + linear (video_swin.py:264-287)."""

    dim: int
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, D, H, W, C = x.shape
        if H % 2 == 1 or W % 2 == 1:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            H, W = x.shape[2], x.shape[3]
        # one relayout instead of four stride-2 slices + concat: the
        # reshapes are free, and flattening (pw, ph, C) yields exactly the
        # reference's [x0; x1; x2; x3] channel order (video_swin.py:273-278)
        x = x.reshape(B, D, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 2, 4, 5, 3, 6)  # [..., pw, ph, C]
        x = x.reshape(B, D, H // 2, W // 2, 4 * C)
        # barrier: without it XLA hoists LayerNorm's f32 upcast ABOVE the
        # relayout transposes, doubling every stage-transition copy's
        # bytes (profiled round 4: 1.75 ms of f32 copies at stage 1 exit
        # that are bf16-sized work)
        x = jax.lax.optimization_barrier(x)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return x


class _BlockPair(nn.Module):
    """One (no-shift, shift) block pair — the scan body for scanned stages.

    Under ``nn.scan`` the stage's N pairs share ONE traced program with
    weight-stacked params (leading axis = n_pairs): the XLA program shrinks
    ~depth/2-fold, which matters on relay-backed TPUs where compile time is
    the bottleneck (see PERF.md)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift: Tuple[int, int, int]
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    attn_impl: str
    layer_norm_eps: float
    deterministic: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, dpr: Array):
        common = dict(
            dim=self.dim, num_heads=self.num_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_impl=self.attn_impl, layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype)
        x = SwinBlock3D(shift_size=(0, 0, 0), name="a", **common)(
            x, self.deterministic, dpr[0])
        x = SwinBlock3D(shift_size=self.shift, name="b", **common)(
            x, self.deterministic, dpr[1])
        return x, None


class _BlockPairWM(nn.Module):
    """One (no-shift, shift) block pair on window-major tokens — the scan
    body for wm stages.  Declares the SAME param tree as _BlockPair
    (names "a"/"b"), so checkpoints are layout-identical; the cyclic
    shift is materialized as ONE fused relayout (wm_shift) around the
    shifted block instead of the spatial path's roll + re-pad."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    spatial: Tuple[int, int, int]
    shift: Tuple[int, int, int]
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    layer_norm_eps: float
    deterministic: bool
    # biases precomputed outside the scan (BasicLayer's serving hoist);
    # when False the per-xs bias operands are dummies and each block
    # gathers its own rel-pos bias from its table
    use_hoisted_bias: bool = False
    # LN-affine-folded weights from the serving fold cache (LVT_FOLDCACHE);
    # when False the per-xs fold operands are dummies
    use_folded: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, dpr: Array, bias_a: Array = None,
                 bias_b: Array = None, fold_a=None, fold_b=None):
        from lavender_tpu.ops.swin_block_attn import (
            supports_inkernel_shift, wm_shift)
        D, H, W = self.spatial
        window_size, shift_size = get_window_size(
            (D, H, W), self.window_size, self.shift)
        if not self.use_hoisted_bias:
            bias_a = bias_b = None
        if not self.use_folded:
            fold_a = fold_b = None
        common = dict(
            dim=self.dim, num_heads=self.num_heads,
            window_size=self.window_size, spatial=self.spatial,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype)
        x = SwinBlockWM(shift_size=(0, 0, 0), name="a", **common)(
            x, self.deterministic, dpr[0], bias_a, fold_a)
        shifted = any(s > 0 for s in shift_size)
        B, nW, Npad, C = x.shape
        iks = (shifted and _IKS
               and supports_inkernel_shift(window_size, (D, H, W), Npad,
                                           C, self.num_heads, nW))
        if shifted and not iks:
            x = wm_shift(x, window_size, D, H, W, shift_size)
        x = SwinBlockWM(shift_size=self.shift, inkernel_shift=iks,
                        name="b", **common)(x, self.deterministic, dpr[1],
                                            bias_b, fold_b)
        if shifted and not iks:
            x = wm_shift(x, window_size, D, H, W, shift_size,
                         inverse=True)
        return x, None


class BasicLayer(nn.Module):
    """One Swin stage: ``depth`` blocks alternating no-shift/shift, then
    optional PatchMerging (video_swin.py:308-368)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rates: Tuple[float, ...] = ()
    has_downsample: bool = False
    attn_impl: str = "xla"
    remat: bool = False
    scan_blocks: bool = False
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 pre_partitioned: bool = False,
                 spatial: Optional[Tuple[int, int, int]] = None) -> Array:
        shift = tuple(w // 2 for w in self.window_size)
        from lavender_tpu.ops.swin_block_attn import (
            _round8, supports_fused_block, wm_partition, wm_reverse)
        if pre_partitioned:
            # LVT_EMBING ingress: x arrives ALREADY window-major
            # [B, nW, Npad, C] (PatchEmbed3D._u8_embed_wm); the caller
            # supplies the spatial dims the layout encodes
            D, H, W = spatial
        else:
            B, D, H, W, _ = x.shape
        window_eff, _ = get_window_size((D, H, W), self.window_size, shift)
        impl = resolve_attn_impl(self.attn_impl)
        wm_ok = (impl == "wm" and self.qkv_bias
                 and not self.remat
                 and supports_fused_block(D, H, W, window_eff)
                 and self.scan_blocks and self.depth % 2 == 0
                 and self.depth >= 2)
        if pre_partitioned and not wm_ok:
            raise ValueError(
                "pre-partitioned input requires the wm path "
                f"(impl={impl}, spatial={spatial})")
        if wm_ok:
            n_pairs = self.depth // 2
            dpr = self.drop_path_rates or (0.0,) * self.depth
            dpr_pairs = jnp.asarray(dpr, jnp.float32).reshape(n_pairs, 2)
            Npad = _round8(int(np.prod(window_eff)))
            if pre_partitioned:
                assert x.shape[2] == Npad, (x.shape, Npad)
            else:
                x = wm_partition(x, window_eff, Npad)
            # Serving hoist: build every block's rel-pos bias in ONE
            # vmapped gather BEFORE the scan and feed the [n_pairs, nH,
            # Npad, Npad] stacks as scan xs.  Inside the scan the gather
            # runs per block from a dynamically-sliced table at ~38 GB/s
            # VMEM-write-bound (profiled 2.2 ms/iter at stage 3); outside
            # it is one wide take.  Inference-only: the train vjp keeps
            # the per-block gather so dtable flows through the block's
            # own custom_vjp unchanged.
            hoist = deterministic and _BIASHOIST \
                and not self.is_initializing() \
                and self.has_variable("params", "blocks_scan")
            if hoist and self.has_variable("cache", "rel_bias_a"):
                # serving bias cache: prebuilt OUTSIDE the step (see
                # build_bias_cache) — the step pays zero gather cost
                bias_a = self.get_variable("cache", "rel_bias_a")
                bias_b = self.get_variable("cache", "rel_bias_b")
            elif hoist:
                from lavender_tpu.ops.swin_block_attn import rel_pos_bias_wm
                sub = self.get_variable("params", "blocks_scan")
                bfn = lambda t: rel_pos_bias_wm(
                    t, tuple(self.window_size), window_eff, Npad,
                    self.dtype)
                ta = sub["a"]["attn"]["relative_position_bias_table"]
                tb = sub["b"]["attn"]["relative_position_bias_table"]
                bias_a = jax.vmap(bfn)(ta)
                bias_b = jax.vmap(bfn)(tb)
                if self.is_mutable_collection("cache"):
                    self.put_variable("cache", "rel_bias_a", bias_a)
                    self.put_variable("cache", "rel_bias_b", bias_b)
                    # staleness fingerprint of the SOURCE tables (advisor
                    # round 4): the cache is a pure function of params, so
                    # check_serving_cache(variables) can detect a cache
                    # carried across a param update and raise host-side
                    self.put_variable("cache", "bias_fp",
                                      _bias_fingerprint(ta, tb))
            else:
                bias_a = bias_b = jnp.zeros((n_pairs, 1, 1, 1), self.dtype)
            # Serving fold cache (LVT_FOLDCACHE): LN-affine-folded qkv +
            # MLP-w1 weights, USED only when prebuilt in the cache
            # collection (cacheless applies pay nothing; the trace-time
            # fold measured a −7.2 loss riding the scan — PERF.md).
            fold_a = fold_b = None
            if _FOLDCACHE and hoist:
                if self.has_variable("cache", "fold_a"):
                    fold_a = tuple(self.get_variable("cache", "fold_a"))
                    fold_b = tuple(self.get_variable("cache", "fold_b"))
                elif self.is_mutable_collection("cache"):
                    sub = self.get_variable("params", "blocks_scan")

                    def foldfn(p):
                        n1s = p["norm1"]["scale"].astype(jnp.float32)
                        n1b = p["norm1"]["bias"].astype(jnp.float32)
                        wq = p["attn"]["qkv"]["kernel"].astype(jnp.float32)
                        bq = p["attn"]["qkv"]["bias"].astype(jnp.float32)
                        n2s = p["norm2"]["scale"].astype(jnp.float32)
                        n2b = p["norm2"]["bias"].astype(jnp.float32)
                        w1 = p["mlp"]["fc1"]["kernel"].astype(jnp.float32)
                        b1 = p["mlp"]["fc1"]["bias"].astype(jnp.float32)
                        return ((n1s[:, None] * wq).astype(self.dtype),
                                (n1b @ wq + bq).astype(self.dtype),
                                (n2s[:, None] * w1).astype(self.dtype),
                                (n2b @ w1 + b1).astype(self.dtype))

                    fold_a = jax.vmap(foldfn)(
                        {k: sub["a"][k] for k in
                         ("norm1", "attn", "norm2", "mlp")})
                    fold_b = jax.vmap(foldfn)(
                        {k: sub["b"][k] for k in
                         ("norm1", "attn", "norm2", "mlp")})
                    self.put_variable("cache", "fold_a", fold_a)
                    self.put_variable("cache", "fold_b", fold_b)
                    self.put_variable("cache", "fold_fp",
                                      _fold_fingerprint(sub))
            use_folded = fold_a is not None
            if not use_folded:
                z4 = tuple(jnp.zeros((n_pairs, 1), self.dtype)
                           for _ in range(4))
                fold_a = fold_b = z4
            scanned = nn.scan(
                _BlockPairWM,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0, length=n_pairs)
            x, _ = scanned(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size, spatial=(D, H, W),
                shift=shift, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                layer_norm_eps=self.layer_norm_eps,
                deterministic=deterministic, use_hoisted_bias=hoist,
                use_folded=use_folded, dtype=self.dtype,
                name="blocks_scan")(x, dpr_pairs, bias_a, bias_b,
                                    fold_a, fold_b)
            x = wm_reverse(x, window_eff, D, H, W)
            if self.has_downsample:
                x = PatchMerging(dim=self.dim,
                                 layer_norm_eps=self.layer_norm_eps,
                                 dtype=self.dtype, name="downsample")(x)
            return x
        attn_impl = "fused" if impl == "wm" else impl
        if self.scan_blocks and self.depth % 2 == 0 and self.depth >= 2:
            n_pairs = self.depth // 2
            dpr = self.drop_path_rates or (0.0,) * self.depth
            dpr_pairs = jnp.asarray(dpr, jnp.float32).reshape(n_pairs, 2)
            pair_cls = _BlockPair
            if self.remat:
                pair_cls = nn.remat(_BlockPair)
            scanned = nn.scan(
                pair_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0, length=n_pairs)
            x, _ = scanned(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size, shift=shift,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, attn_impl=attn_impl,
                layer_norm_eps=self.layer_norm_eps,
                deterministic=deterministic, dtype=self.dtype,
                name="blocks_scan")(x, dpr_pairs)
        else:
            block_cls = (nn.remat(SwinBlock3D, static_argnums=(2,))
                         if self.remat else SwinBlock3D)
            for i in range(self.depth):
                x = block_cls(
                    dim=self.dim, num_heads=self.num_heads,
                    window_size=self.window_size,
                    shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    drop_path_rate=(self.drop_path_rates[i]
                                    if self.drop_path_rates else 0.0),
                    attn_impl=attn_impl,
                    layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
                    name=f"blocks_{i}")(x, deterministic)
        if self.has_downsample:
            x = PatchMerging(dim=self.dim, layer_norm_eps=self.layer_norm_eps,
                             dtype=self.dtype, name="downsample")(x)
        return x


class PatchEmbed3D(nn.Module):
    """3D patch embedding, kernel (2,4,4) stride (1,4,4) + temporal end-pad.

    Reference: PatchEmbed3D (video_swin.py:371-405).  Input/output are
    channels-last: [B, D, H, W, C] -> [B, D, H//4, W//4, embed_dim].
    """

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    patch_norm: bool = True
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    # "conv" (XLA conv, default) | "s2d" (space-to-depth matmul).  Measured
    # (PERF.md): conv 1.91 ms vs s2d 3.33 — the C_in=3 -> 48-lane
    # space-to-depth relayout costs more than the conv's MXU underuse;
    # the earlier note claiming s2d wins was wrong.
    impl: str = "conv"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 wm_window: Optional[Tuple[int, int, int]] = None,
                 wm_npad: int = 0) -> Array:
        B, D, H, W, C = x.shape
        pd, ph, pw = self.patch_size
        pad_w = (pw - W % pw) % pw
        pad_h = (ph - H % ph) % ph
        conv = nn.Conv(self.embed_dim, kernel_size=(pd, ph, pw),
                       strides=(1, ph, pw), padding="VALID",
                       dtype=self.dtype, name="proj")
        if (wm_window is not None and x.dtype == jnp.uint8
                and not self.is_initializing()
                and pad_h == 0 and pad_w == 0 and pd == 2):
            # LVT_EMBING (round-5 serving ingress): emit the embedding
            # DIRECTLY in stage 1's window-major layout.  The u8 im2col
            # relayout composes the s2d byte transpose WITH stage 1's
            # wm_partition (one u8 copy replaces the s2d copy + the bf16
            # [B, D, h2, w2, E] materialize + the wm partition copy), and
            # the conv becomes one [*, 96] @ [96, E] MXU dot in wm layout
            # with the same normalize fold as _u8_embed.  Serving-only
            # (the caller gates on deterministic); pad rows carry finite
            # garbage that the wm pipeline never reads (masked keys,
            # dropped by wm_reverse).
            out = self._u8_embed_wm(x, conv, B, D, H, W, C, ph, pw,
                                    wm_window, wm_npad)
            if self.patch_norm:
                out = nn.LayerNorm(epsilon=self.layer_norm_eps,
                                   dtype=self.dtype, name="norm")(out)
            return out
        # deterministic gates the Pallas kernel path: it has no
        # custom_vjp (serving-only), so training keeps the jnp path
        if (_PEK and deterministic and x.dtype == jnp.uint8
                and not self.is_initializing() and pd == 2):
            from lavender_tpu.ops.patch_embed_u8 import (
                fused_patch_embed_u8, supports_fused_patch_embed)
            if supports_fused_patch_embed(B, D, H, W, C, self.patch_size):
                from lavender_tpu.data.transforms import (IMAGENET_MEAN,
                                                          IMAGENET_STD)
                out = fused_patch_embed_u8(
                    x, conv.variables["params"]["kernel"],
                    conv.variables["params"]["bias"],
                    IMAGENET_MEAN, IMAGENET_STD, dtype=self.dtype)
                if self.patch_norm:
                    out = nn.LayerNorm(epsilon=self.layer_norm_eps,
                                       dtype=self.dtype, name="norm")(out)
                return out
        if (x.dtype == jnp.uint8 and not self.is_initializing()
                and pad_h == 0 and pad_w == 0 and pd == 2):
            # RAW-uint8 fast path: XLA lowers normalize+conv(C_in=3) as
            # one VPU loop fusion (profiled 1.09 ms/iter at B=24 at
            # 7.9 TF/s — 25x off the MXU).  The conv is linear, so the
            # per-channel normalize (u/255 - mean)/std folds into the
            # kernel (scale) and bias (shift); the pixels then go
            # uint8-space-to-depth (byte-cheap relayout) into ONE
            # [B*D*h*w, pd*ph*pw*3] @ [., embed_dim] MXU matmul.  The
            # temporal end-pad frame must contribute normalized ZERO
            # (reference pads AFTER normalize, video_swin.py:396), so the
            # kd=1 tap's absorbed shift is added back per output time via
            # a [D, embed_dim] bias table (exact, not approximate).
            out = self._u8_embed(x, conv, B, D, H, W, C, pd, ph, pw)
            if self.patch_norm:
                out = nn.LayerNorm(epsilon=self.layer_norm_eps,
                                   dtype=self.dtype, name="norm")(out)
            return out
        if x.dtype == jnp.uint8:
            # u8 input but geometry we don't fold (spatial pad / pd != 2):
            # normalize on-device and take the legacy path
            from lavender_tpu.data.transforms import device_normalize
            x = device_normalize(x, dtype=self.dtype)
        # Reference always pads the temporal axis end by 1 (video_swin.py:396)
        # so with kernel 2 / stride 1 the temporal length is preserved.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, pad_h), (0, pad_w), (0, 0)))
        # Both impls share one param tree (nn.Conv "proj" kernel DHWIO +
        # bias) so checkpoints and golden tests are unchanged; the s2d
        # branch is the same math as one dense
        # [B*D*h*w, pd*ph*pw*3] @ [., embed_dim] matmul.
        if self.is_initializing() or self.impl == "conv":
            out = conv(x)  # init: create the conv params; same output
        else:
            Bp, Dp, Hp, Wp, _ = x.shape
            h2, w2 = Hp // ph, Wp // pw
            xs = x.reshape(B, Dp, h2, ph, w2, pw, C)
            xs = xs.transpose(0, 1, 2, 4, 3, 5, 6)
            xs = xs.reshape(B, Dp, h2, w2, ph * pw * C)
            # temporal kernel pd / stride 1: concat pd neighbour frames
            feat = jnp.concatenate(
                [xs[:, d0:Dp - pd + 1 + d0] for d0 in range(pd)], axis=-1)
            kmat = conv.variables["params"]["kernel"].astype(
                self.dtype).reshape(-1, self.embed_dim)
            bias = conv.variables["params"]["bias"].astype(self.dtype)
            out = feat.astype(self.dtype) @ kmat + bias
        if self.patch_norm:
            out = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                               name="norm")(out)
        return out

    def _u8_embed(self, x: Array, conv, B, D, H, W, C, pd, ph, pw) -> Array:
        """s2d + normalize-folded MXU matmul on raw uint8 frames.

        Exact contract: equals device_normalize(x) -> temporal-zero-pad ->
        conv, up to float reassociation (test_patch_embed_u8_matches_
        normalize_conv).  feat channel order (kd, ph, pw, c) matches the
        DHWIO kernel's reshape order."""
        from lavender_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        h2, w2 = H // ph, W // pw
        # u8 space-to-depth: 1-byte relayout, then one concat for the
        # kd taps (kernel 2 / stride 1 pairs frame t with t+1; the end
        # pad frame is u8 zeros, corrected below)
        xs = x.reshape(B, D, h2, ph, w2, pw, C)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6)
        xs = xs.reshape(B, D, h2, w2, ph * pw * C)
        zpad = jnp.zeros((B, 1, h2, w2, ph * pw * C), jnp.uint8)
        xp = jnp.concatenate([xs, zpad], axis=1)
        feat = jnp.concatenate([xp[:, :D], xp[:, 1:D + 1]], axis=-1)
        # fold (u/255 - mean)/std into the kernel: n = a_c*u + b_c with
        # a_c = 1/(255 std_c), b_c = -mean_c/std_c.  All in f32; cast once.
        kern = conv.variables["params"]["kernel"].astype(jnp.float32)
        bias = conv.variables["params"]["bias"].astype(jnp.float32)
        a = 1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32))
        b = -(np.asarray(IMAGENET_MEAN, np.float32)
              / np.asarray(IMAGENET_STD, np.float32))
        kscaled = kern * jnp.asarray(a)[None, None, None, :, None]
        # shift per kd tap: sum over (ph, pw, c) of kern * b_c
        shift = jnp.einsum("dhwce,c->de", kern, jnp.asarray(b))  # [pd, E]
        # output time t uses taps kd=0 (frame t, real) and kd=1 (frame
        # t+1 — real except at t = D-1 where the pad frame must
        # contribute normalized zero, i.e. no kd=1 shift)
        t_idx = jnp.arange(D)
        bias_t = (bias[None, :] + shift[0][None, :]
                  + (t_idx < D - 1)[:, None].astype(jnp.float32)
                  * shift[1][None, :])  # [D, E]
        # kernel DHWIO [pd, ph, pw, c, E] reshaped row order is
        # (kd, ph, pw, c) — exactly feat's channel order
        kmat = kscaled.reshape(-1, self.embed_dim)
        mm_dt = self.dtype
        out = jax.lax.dot_general(
            feat.astype(mm_dt), kmat.astype(mm_dt),
            (((4,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + bias_t[None, :, None, None, :]
        return out.astype(self.dtype)

    def _u8_embed_wm(self, x: Array, conv, B, D, H, W, C, ph, pw,
                     wm_window, Npad: int) -> Array:
        """_u8_embed emitted straight into window-major [B, nW, Npad, E].

        Same normalize-folded matmul math (exactly _u8_embed per token —
        parity-tested), but the im2col byte transpose lands tokens in the
        wm order (window (r, c) row-major; in-window (d, i, j) row-major,
        matching wm_partition), so stage 1 needs NO wm_partition and the
        [B, D, h2, w2, E] bf16 intermediate never exists."""
        from lavender_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        h2, w2 = H // ph, W // pw
        wh, ww = wm_window[1], wm_window[2]
        nR, nWc = h2 // wh, w2 // ww
        N = wm_window[0] * wh * ww
        assert wm_window[0] == D and h2 % wh == 0 and w2 % ww == 0
        # u8 space-to-depth (same as _u8_embed) ...
        xs = x.reshape(B, D, h2, ph, w2, pw, C)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6)
        xs = xs.reshape(B, D, h2, w2, ph * pw * C)
        zpad = jnp.zeros((B, 1, h2, w2, ph * pw * C), jnp.uint8)
        xp = jnp.concatenate([xs, zpad], axis=1)
        feat = jnp.concatenate([xp[:, :D], xp[:, 1:D + 1]], axis=-1)
        # ... composed with the wm partition: [B, D, h2, w2, 96] ->
        # [B, nR*nWc, D*wh*ww, 96] (XLA fuses both into ONE u8 copy)
        feat = feat.reshape(B, D, nR, wh, nWc, ww, feat.shape[-1])
        feat = feat.transpose(0, 2, 4, 1, 3, 5, 6)
        feat = feat.reshape(B, nR * nWc, N, feat.shape[-1])
        if Npad > N:
            feat = jnp.pad(feat, ((0, 0), (0, 0), (0, Npad - N), (0, 0)))
        kern = conv.variables["params"]["kernel"].astype(jnp.float32)
        bias = conv.variables["params"]["bias"].astype(jnp.float32)
        a = 1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32))
        b = -(np.asarray(IMAGENET_MEAN, np.float32)
              / np.asarray(IMAGENET_STD, np.float32))
        kscaled = kern * jnp.asarray(a)[None, None, None, :, None]
        shift = jnp.einsum("dhwce,c->de", kern, jnp.asarray(b))
        # per-ROW time index: in-window rows are (d, i, j) row-major, so
        # d = row // (wh*ww); pad rows clamp to D-1 (content is dead)
        d_row = jnp.minimum(jnp.arange(Npad) // (wh * ww), D - 1)
        bias_row = (bias[None, :] + shift[0][None, :]
                    + (d_row < D - 1)[:, None].astype(jnp.float32)
                    * shift[1][None, :])  # [Npad, E]
        kmat = kscaled.reshape(-1, self.embed_dim)
        mm_dt = self.dtype
        out = jax.lax.dot_general(
            feat.astype(mm_dt), kmat.astype(mm_dt),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + bias_row[None, None, :, :]
        return out.astype(self.dtype)


class VideoSwin3D(nn.Module):
    """Full Video Swin 3D backbone.

    Reference: SwinTransformer3D (video_swin.py:408-480).

    Input ``[B, T, H, W, 3]`` channels-last, output ``[B, T, H/32, W/32, F]``
    with F = embed_dim * 8 (the reference returns NCDHW; we stay channels-last).
    """

    config: SwinConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        if x.dtype != jnp.uint8:
            x = x.astype(self.dtype)

        # LVT_EMBING (round-5, default OFF pending TPU A/B): serving-only
        # window-major embed ingress — the patch embed emits stage 1's
        # [B, nW, Npad, E] layout directly, deleting the spatial embed
        # intermediate AND stage 1's wm_partition copy.  Gate mirrors
        # BasicLayer's wm_ok for stage 1 exactly.
        embing = False
        emb_geom = None
        import os as _os
        if (_os.environ.get("LVT_EMBING", "0") == "1"
                and deterministic and x.dtype == jnp.uint8
                and not self.is_initializing()
                and resolve_attn_impl(cfg.attn_impl) == "wm"
                and cfg.scan_blocks and not cfg.remat and cfg.qkv_bias
                and cfg.patch_size[0] == 2
                and cfg.depths[0] % 2 == 0 and cfg.depths[0] >= 2):
            from lavender_tpu.ops.swin_block_attn import (
                _round8, supports_fused_block)
            B0, T0, H0, W0, _ = x.shape
            ph, pw = cfg.patch_size[1], cfg.patch_size[2]
            if H0 % ph == 0 and W0 % pw == 0:
                h2, w2 = H0 // ph, W0 // pw
                shift0 = tuple(w // 2 for w in cfg.window_size)
                weff, _ = get_window_size((T0, h2, w2), cfg.window_size,
                                          shift0)
                if supports_fused_block(T0, h2, w2, weff):
                    embing = True
                    emb_geom = (T0, h2, w2, weff,
                                _round8(int(np.prod(weff))))

        # uint8 input flows RAW into the patch embed (the normalize is
        # folded into the conv weights there — see PatchEmbed3D._u8_embed)
        if embing:
            D0, h2, w2, weff, Npad0 = emb_geom
            x = PatchEmbed3D(
                patch_size=cfg.patch_size, embed_dim=cfg.embed_dim,
                patch_norm=cfg.patch_norm,
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=self.dtype, name="patch_embed")(
                x, deterministic, wm_window=weff, wm_npad=Npad0)
        else:
            x = PatchEmbed3D(
                patch_size=cfg.patch_size, embed_dim=cfg.embed_dim,
                patch_norm=cfg.patch_norm,
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=self.dtype, name="patch_embed")(x, deterministic)

        num_layers = len(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)).tolist()
        for i in range(num_layers):
            start = sum(cfg.depths[:i])
            extra = {}
            if embing and i == 0:
                extra = dict(pre_partitioned=True,
                             spatial=(emb_geom[0], emb_geom[1],
                                      emb_geom[2]))
            x = BasicLayer(
                dim=int(cfg.embed_dim * 2 ** i),
                depth=cfg.depths[i],
                num_heads=cfg.num_heads[i],
                window_size=cfg.window_size,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale,
                drop_path_rates=tuple(dpr[start:start + cfg.depths[i]]),
                has_downsample=i < num_layers - 1,
                attn_impl=cfg.attn_impl,
                remat=cfg.remat,
                scan_blocks=cfg.scan_blocks,
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=self.dtype,
                name=f"layers_{i}")(x, deterministic=deterministic,
                                    **extra)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm")(x)
        return x
