"""Fused LayerNorm + MLP Pallas kernel for Swin blocks.

The Swin MLP (video_swin.py:63-79: fc1 -> GELU -> fc2, preceded by norm2)
is bandwidth-bound on TPU: the 4x-wide intermediate round-trips HBM.  This
kernel tiles tokens, keeps LN statistics and the intermediate in VMEM, and
streams the weights once (constant block index): traffic drops from
~(2 + 8 + 8 + 2) * tokens * C bytes to ~4 * tokens * C.

Backward recomputes in pure JAX (windows/tokens are small); forward is the
serving path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def ln_mlp_reference(x: Array, ln_scale: Array, ln_bias: Array,
                     w1: Array, b1: Array, w2: Array, b2: Array,
                     eps: float = 1e-5) -> Array:
    """Pure-JAX oracle: mlp(layernorm(x)).

    LN statistics in f32; matmuls in x.dtype (matches the flax module path
    in both f32-golden and bf16-serving modes).
    """
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    h = ln.astype(cdt) @ w1.astype(cdt) + b1.astype(cdt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
    o = h.astype(cdt) @ w2.astype(cdt) + b2.astype(cdt)
    return o.astype(x.dtype)


def _erf(x):
    """f32 erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7) — Mosaic has
    no erf/erfc lowering."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


# odd minimax-style fit of erf(t/sqrt(2)) on [0, 4] (iterated weighted
# lstsq at chebyshev nodes; fit |err| 2.1e-4 -> gelu |err| <= 6.6e-4,
# below the bf16 output resolution everywhere).  Coefficients are scaled
# by 1/erf(4/sqrt(2)) so |t*q(t^2)| reaches exactly 1 at the +-4 clamp:
# clip(p, -1, 1) then yields EXACT 0 / x tails with no selects (selects
# cost VMEM-stack temps at [tokens, 4C] kernel scale).
_GELU_SCALE = 1.0000633487257499  # 1 / erf(4 / sqrt(2))
_GELU_C = tuple(c * _GELU_SCALE for c in (
    0.7970538551214834, -0.1307767008220699, 0.01822588135352402,
    -0.0017579549233134623, 0.00010837990176781752,
    -3.7837278306513423e-06, 5.6320917276818945e-08))


def _gelu_exact(x, precise: bool = False):
    """GELU on the VPU.  ``precise=False`` (the bf16 serving/training
    path): a clamped odd polynomial for erf(x/sqrt(2)) — no divide, no
    exp, no sign/abs.  |gelu err| <= 6.5e-4 absolute on all of R, below
    bf16 output resolution; the previous Abramowitz-Stegun erf spent
    ~2.7 ms/forward across the MLP kernels (stage timings
    6.04/3.43/14.73 -> 4.97/3.02/13.61 ms with GELU removed).
    ``precise=True`` (f32 golden/oracle paths): A-S 7.1.26 erf,
    |err| < 1.5e-7."""
    if precise:
        return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))
    t = jnp.clip(x, -4.0, 4.0)
    u = t * t
    q = _GELU_C[6]
    for c in _GELU_C[5::-1]:
        q = q * u + c
    # |t*q| >= 1 at the clamp (coefficients pre-scaled), so this clip
    # gives exact 0 / x tails for checkpoint-scale activations
    p = jnp.clip(t * q, -1.0, 1.0)
    return 0.5 * x * (1.0 + p)


def _kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            o_ref, *, eps: float, add_residual: bool):
    x = x_ref[:].astype(jnp.float32)  # [TM, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # E[x^2] - mean^2: one fewer [TM, C] pass (f32-safe at LN magnitudes)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    ln = (x - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    # matmul operands in the weights' dtype (bf16 serving) for MXU rate;
    # f32 accumulation
    wdt = w1_ref.dtype
    h = jax.lax.dot_general(
        ln.astype(wdt), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(h, precise=(wdt == jnp.float32))
    o = jax.lax.dot_general(
        h.astype(wdt), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    if add_residual:
        # x + mlp(ln(x)): the input block IS the residual — zero extra HBM
        o_ref[:] = o.astype(o_ref.dtype) + x_ref[:].astype(o_ref.dtype)
    else:
        o_ref[:] = o.astype(o_ref.dtype)


def _forward(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, add_residual):
    M, C = x.shape
    HD = w1.shape[1]
    # token tile: keep TM * HD f32 intermediate ~<= 4 MB; pad the token dim
    # up rather than shrinking TM (round-1: M=9408 at stage 3 collapsed the
    # tile to 64 rows and the grid to 147 dispatch-bound steps)
    TM = max(256, min(2048, (4 * 1024 * 1024) // max(HD * 4, 1)))
    Mp = ((M + TM - 1) // TM) * TM
    xp = jnp.pad(x, ((0, Mp - M), (0, 0))) if Mp != M else x
    vec = lambda a: a.reshape(1, -1)
    grid_spec = pl.GridSpec(
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, add_residual=add_residual),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * C * HD,
            bytes_accessed=4 * Mp * C + 2 * C * HD * 4,
            transcendentals=Mp * HD),
    )(xp, vec(ln_scale), vec(ln_bias), w1, vec(b1), w2, vec(b2))
    return out[:M] if Mp != M else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=1e-5,
                 add_residual=False):
    """mlp(layernorm(x)) for 2-D x [M, C] (+x when add_residual)."""
    return _forward(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, add_residual)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, add_residual):
    return _forward(x, ln_scale, ln_bias, w1, b1, w2, b2, eps,
                    add_residual), (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _bwd(eps, add_residual, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res

    def f(x, s, b, w1_, b1_, w2_, b2_):
        out = ln_mlp_reference(x, s, b, w1_, b1_, w2_, b2_, eps)
        return out + x.astype(out.dtype) if add_residual else out

    _, vjp = jax.vjp(f, x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(g)


fused_ln_mlp.defvjp(_fwd, _bwd)


def weights_fit_vmem(C: int, HD: int, bytes_per: int = 2,
                     budget: int = 10 * 1024 * 1024) -> bool:
    return 2 * C * HD * bytes_per <= budget


def _chunked_kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, o_ref, ln_buf, *, eps: float,
                    add_residual: bool):
    """Grid (token-tile, HD-chunk): LN once per token tile (chunk 0), then
    accumulate each HD chunk's fc2 partial product into the revisited
    output block (the standard K-chunked matmul accumulation pattern)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        x = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
        ln = (x - mean) * jax.lax.rsqrt(var + eps)
        ln = ln * scale_ref[0].astype(jnp.float32) \
            + bias_ref[0].astype(jnp.float32)
        ln_buf[:] = ln.astype(ln_buf.dtype)
        base = b2_ref[0].astype(jnp.float32)
        if add_residual:
            o_ref[:] = (base[None] + x).astype(o_ref.dtype)
        else:
            o_ref[:] = jnp.broadcast_to(
                base[None], o_ref.shape).astype(o_ref.dtype)

    wdt = w1_ref.dtype
    h = jax.lax.dot_general(
        ln_buf[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(h, precise=(wdt == jnp.float32))
    o = jax.lax.dot_general(
        h.astype(wdt), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = o_ref[:] + o.astype(o_ref.dtype)


# LVT_MLPTM / LVT_MLPHD (round-5 stage-4 knobs): token-tile rows and HD
# chunk of the chunked LN+MLP kernel.  The weights (16 MB at C=1024,
# HD=4096) do not fit VMEM, so every token tile re-streams the full set:
# weight traffic = (M/tm) * 2*C*HD*2 bytes.  tm=512 (round-1 default)
# streams 192 MB per stage-4 call (profiled 1.13 ms vs the ~0.52 ms dot
# ideal); larger tm cuts the re-fetch count linearly until the slab +
# double-buffered weight blocks hit the ~16 MB VMEM ceiling.
_MLPTM = int(__import__("os").environ.get("LVT_MLPTM", "512"))
_MLPHD = int(__import__("os").environ.get("LVT_MLPHD", "1024"))


def fused_ln_mlp_chunked(x, ln_scale, ln_bias, w1, b1, w2, b2,
                         eps: float = 1e-5, add_residual: bool = False,
                         hd_chunk: int = None, tm: int = None):
    """LN+MLP(+residual) with the 4x-wide weights streamed in HD chunks —
    for layers whose full weights exceed VMEM (Swin stage 4: C=1024,
    HD=4096 -> 16.8 MB; round 1 fell back to unfused XLA there).

    Forward-only building block (no custom_vjp): the training path uses the
    reference math.
    """
    if hd_chunk is None:
        hd_chunk = _MLPHD
    if tm is None:
        tm = _MLPTM
    M, C = x.shape
    HD = w1.shape[1]
    while HD % hd_chunk != 0:
        hd_chunk //= 2
    nj = HD // hd_chunk
    Mp = ((M + tm - 1) // tm) * tm
    xp = jnp.pad(x, ((0, Mp - M), (0, 0))) if Mp != M else x
    vec = lambda a: a.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_chunked_kernel, eps=eps,
                          add_residual=add_residual),
        grid=(Mp // tm, nj),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hd_chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd_chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd_chunk, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, C), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * C * HD,
            bytes_accessed=4 * Mp * C + 2 * C * HD * 4,
            transcendentals=Mp * HD),
    )(xp, vec(ln_scale), vec(ln_bias), w1, vec(b1), w2, vec(b2))
    return out[:M] if Mp != M else out


def _ffn_post_ln_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, s_ref,
                        lb_ref, o_ref, *, eps: float):
    """BERT FFN sub-block: LN(x + fc2(gelu(fc1(x)))) — post-LN order
    (BertLayer._ffn, models/bert.py; HF BertOutput)."""
    wdt = w1_ref.dtype
    x = x_ref[:]
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(h, precise=(wdt == jnp.float32))
    o = jax.lax.dot_general(
        h.astype(wdt), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    r = o + x.astype(jnp.float32)
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(r * r, axis=-1, keepdims=True) - mean * mean
    ln = (r - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * s_ref[0].astype(jnp.float32) + lb_ref[0].astype(jnp.float32)
    o_ref[:] = ln.astype(o_ref.dtype)


def _ffn_forward(x, w1, b1, w2, b2, ln_scale, ln_bias, eps):
    M, C = x.shape
    HD = w1.shape[1]
    TM = max(256, min(2048, (4 * 1024 * 1024) // max(HD * 4, 1)))
    TM = max(256, (TM // 256) * 256)  # tile must be sublane-aligned
    Mp = ((M + TM - 1) // TM) * TM
    xp = jnp.pad(x, ((0, Mp - M), (0, 0))) if Mp != M else x
    vec = lambda a: a.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_ffn_post_ln_kernel, eps=eps),
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * C * HD,
            bytes_accessed=4 * Mp * C + 2 * C * HD * 4,
            transcendentals=Mp * HD),
    )(xp, w1, vec(b1), w2, vec(b2), vec(ln_scale), vec(ln_bias))
    return out[:M] if Mp != M else out


def _ffn_reference(x, w1, b1, w2, b2, ln_scale, ln_bias, eps):
    cdt = x.dtype
    h = x @ w1.astype(cdt) + b1.astype(cdt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
    o = h.astype(cdt) @ w2.astype(cdt) + b2.astype(cdt)
    r = (o + x).astype(jnp.float32)
    mean = r.mean(-1, keepdims=True)
    var = ((r - mean) ** 2).mean(-1, keepdims=True)
    ln = (r - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    return ln.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ffn_post_ln(x, w1, b1, w2, b2, ln_scale, ln_bias, eps=1e-12):
    """LN(x + fc2(gelu(fc1(x)))) fused — the BERT FFN sub-block."""
    return _ffn_forward(x, w1, b1, w2, b2, ln_scale, ln_bias, eps)


def _ffn_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, eps):
    return _ffn_forward(x, w1, b1, w2, b2, ln_scale, ln_bias, eps), (
        x, w1, b1, w2, b2, ln_scale, ln_bias)


def _ffn_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: _ffn_reference(*a, eps), *res)
    return vjp(g)


fused_ffn_post_ln.defvjp(_ffn_fwd, _ffn_bwd)


# ---------------------------------------------------------------------------
# TRAIN-mode FFN: the same fused fc1+gelu+fc2+residual+post-LN with the
# hidden dropout (HF BertOutput: dense -> dropout -> LN(x + res)) applied
# IN-KERNEL from the TPU PRNG.  The XLA train path round-trips the 4x-wide
# [M, HD] intermediate through HBM in forward; here it stays in VMEM.  The
# kernel exports the BINARY keep mask (bf16 0/1 — exact) so the backward
# (pure-JAX recompute, like the serving path) replays the identical
# dropout; the 1/(1-rate) scale is applied as an f32 constant on both
# sides so fwd and bwd agree bit-for-bit on the masked values.
# ---------------------------------------------------------------------------


def _ffn_post_ln_train_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref,
                              b2_ref, s_ref, lb_ref, o_ref, m_ref, *,
                              eps: float, rate: float):
    wdt = w1_ref.dtype
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(h, precise=(wdt == jnp.float32))
    o = jax.lax.dot_general(
        h.astype(wdt), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    if rate > 0.0:
        bits = pltpu.prng_random_bits(o.shape)
        keep = (bits >= jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1)))
        keepf = keep.astype(jnp.float32)
        m_ref[:] = keepf.astype(m_ref.dtype)
        o = o * keepf * (1.0 / (1.0 - rate))
    else:
        m_ref[:] = jnp.ones_like(o).astype(m_ref.dtype)
    r = o + x.astype(jnp.float32)
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(r * r, axis=-1, keepdims=True) - mean * mean
    ln = (r - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * s_ref[0].astype(jnp.float32) + lb_ref[0].astype(jnp.float32)
    o_ref[:] = ln.astype(o_ref.dtype)


def _ffn_train_forward(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps,
                       rate):
    M, C = x.shape
    HD = w1.shape[1]
    TM = max(256, min(2048, (4 * 1024 * 1024) // max(HD * 4, 1)))
    TM = max(256, (TM // 256) * 256)
    Mp = ((M + TM - 1) // TM) * TM
    xp = jnp.pad(x, ((0, Mp - M), (0, 0))) if Mp != M else x
    vec = lambda a: a.reshape(1, -1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    tile = lambda: pl.BlockSpec((TM, C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out, keep = pl.pallas_call(
        functools.partial(_ffn_post_ln_train_kernel, eps=eps, rate=rate),
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile(), full((C, HD)), full((1, HD)), full((HD, C)),
            full((1, C)), full((1, C)), full((1, C)),
        ],
        out_specs=[tile(), tile()],
        out_shape=[jax.ShapeDtypeStruct((Mp, C), x.dtype),
                   jax.ShapeDtypeStruct((Mp, C), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * C * HD,
            bytes_accessed=6 * Mp * C + 2 * C * HD * 4,
            transcendentals=Mp * HD),
    )(seed_arr, xp, w1, vec(b1), w2, vec(b2), vec(ln_scale), vec(ln_bias))
    if Mp != M:
        out, keep = out[:M], keep[:M]
    return out, keep


def _ffn_reference_masked(x, w1, b1, w2, b2, ln_scale, ln_bias, keep, eps,
                          rate):
    """_ffn_reference with a given binary keep mask (the backward replay)."""
    cdt = x.dtype
    h = x @ w1.astype(cdt) + b1.astype(cdt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
    o = (h.astype(cdt) @ w2.astype(cdt) + b2.astype(cdt)) \
        .astype(jnp.float32)
    if rate > 0.0:
        o = o * keep.astype(jnp.float32) * (1.0 / (1.0 - rate))
    r = o + x.astype(jnp.float32)
    mean = r.mean(-1, keepdims=True)
    var = (r * r).mean(-1, keepdims=True) - mean * mean
    ln = (r - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    return ln.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ffn_post_ln_train(x, w1, b1, w2, b2, ln_scale, ln_bias, seed,
                            eps=1e-12, rate=0.1):
    """Train FFN sub-block: LN(x + dropout(fc2(gelu(fc1(x))))) fused,
    dropout bits drawn in-kernel from ``seed`` (int32 scalar)."""
    out, _ = _ffn_train_forward(x, w1, b1, w2, b2, ln_scale, ln_bias,
                                seed, eps, rate)
    return out


def _ffn_train_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps, rate):
    out, keep = _ffn_train_forward(x, w1, b1, w2, b2, ln_scale, ln_bias,
                                   seed, eps, rate)
    return out, (x, w1, b1, w2, b2, ln_scale, ln_bias, keep)


def _ffn_train_bwd(eps, rate, res, g):
    import numpy as np
    x, w1, b1, w2, b2, ln_scale, ln_bias, keep = res
    _, vjp = jax.vjp(
        lambda *a: _ffn_reference_masked(*a, keep, eps, rate),
        x, w1, b1, w2, b2, ln_scale, ln_bias)
    dseed = np.zeros((), jax.dtypes.float0)
    return vjp(g) + (dseed,)


fused_ffn_post_ln_train.defvjp(_ffn_train_fwd, _ffn_train_bwd)


def ffn_train_debug(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps, rate):
    """Forward that also returns the binary keep mask (test hook)."""
    return _ffn_train_forward(x, w1, b1, w2, b2, ln_scale, ln_bias, seed,
                              eps, rate)


# ---------------------------------------------------------------------------
# TRAIN-mode attention-output sub-block: LN(res + dropout(x @ w + b)) —
# HF BertSelfOutput.  Same in-kernel-dropout + binary-mask-replay-backward
# pattern as fused_ffn_post_ln_train; covers the one remaining
# dropout+LN chain of a BERT layer once the attention and FFN train
# kernels are on.
# ---------------------------------------------------------------------------


def _out_ln_train_kernel(seed_ref, x_ref, res_ref, w_ref, b_ref, s_ref,
                         lb_ref, o_ref, m_ref, *, eps: float, rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    o = jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0].astype(jnp.float32)
    if rate > 0.0:
        bits = pltpu.prng_random_bits(o.shape)
        keep = (bits >= jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1)))
        keepf = keep.astype(jnp.float32)
        m_ref[:] = keepf.astype(m_ref.dtype)
        o = o * keepf * (1.0 / (1.0 - rate))
    else:
        m_ref[:] = jnp.ones_like(o).astype(m_ref.dtype)
    r = o + res_ref[:].astype(jnp.float32)
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(r * r, axis=-1, keepdims=True) - mean * mean
    ln = (r - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * s_ref[0].astype(jnp.float32) + lb_ref[0].astype(jnp.float32)
    o_ref[:] = ln.astype(o_ref.dtype)


def _out_ln_train_forward(x, res, w, b, ln_scale, ln_bias, seed, eps, rate):
    M, C = x.shape
    TM = 512
    Mp = ((M + TM - 1) // TM) * TM
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        res = jnp.pad(res, ((0, Mp - M), (0, 0)))
    vec = lambda a: a.reshape(1, -1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    tile = lambda: pl.BlockSpec((TM, C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out, keep = pl.pallas_call(
        functools.partial(_out_ln_train_kernel, eps=eps, rate=rate),
        grid=(Mp // TM,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile(), tile(), full((C, C)), full((1, C)),
            full((1, C)), full((1, C)),
        ],
        out_specs=[tile(), tile()],
        out_shape=[jax.ShapeDtypeStruct((Mp, C), x.dtype),
                   jax.ShapeDtypeStruct((Mp, C), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * C * C,
            bytes_accessed=8 * Mp * C + C * C * 4,
            transcendentals=0),
    )(seed_arr, x, res, w, vec(b), vec(ln_scale), vec(ln_bias))
    if Mp != M:
        out, keep = out[:M], keep[:M]
    return out, keep


def _out_ln_reference_masked(x, res, w, b, ln_scale, ln_bias, keep, eps,
                             rate):
    cdt = x.dtype
    o = (x @ w.astype(cdt) + b.astype(cdt)).astype(jnp.float32)
    if rate > 0.0:
        o = o * keep.astype(jnp.float32) * (1.0 / (1.0 - rate))
    r = o + res.astype(jnp.float32)
    mean = r.mean(-1, keepdims=True)
    var = (r * r).mean(-1, keepdims=True) - mean * mean
    ln = (r - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    return ln.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_out_ln_train(x, res, w, b, ln_scale, ln_bias, seed, eps=1e-12,
                       rate=0.1):
    """Train attention-output sub-block: LN(res + dropout(x @ w + b)),
    dropout bits drawn in-kernel from ``seed``."""
    out, _ = _out_ln_train_forward(x, res, w, b, ln_scale, ln_bias, seed,
                                   eps, rate)
    return out


def _out_ln_fwd(x, res, w, b, ln_scale, ln_bias, seed, eps, rate):
    out, keep = _out_ln_train_forward(x, res, w, b, ln_scale, ln_bias,
                                      seed, eps, rate)
    return out, (x, res, w, b, ln_scale, ln_bias, keep)


def _out_ln_bwd(eps, rate, res_, g):
    import numpy as np
    x, res, w, b, ln_scale, ln_bias, keep = res_
    _, vjp = jax.vjp(
        lambda *a: _out_ln_reference_masked(*a, keep, eps, rate),
        x, res, w, b, ln_scale, ln_bias)
    dseed = np.zeros((), jax.dtypes.float0)
    return vjp(g) + (dseed,)


fused_out_ln_train.defvjp(_out_ln_fwd, _out_ln_bwd)


def out_ln_train_debug(x, res, w, b, ln_scale, ln_bias, seed, eps, rate):
    """Forward that also returns the binary keep mask (test hook)."""
    return _out_ln_train_forward(x, res, w, b, ln_scale, ln_bias, seed,
                                 eps, rate)
