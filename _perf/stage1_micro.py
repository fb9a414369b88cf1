"""Per-block micro-breakdown of a Swin stage: fused block with/without
shift, raw roll and pad/unpad costs.  Same scalar-carry scan methodology
as time_components.py (the relay makes full-tensor fetches meaningless).

Usage: python _perf/stage1_micro.py [--stage 1] [--batch 16] [--iters 30]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--stage", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/lavender_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from lavender_tpu.ops.swin_block_attn import (
        _round8, fused_swin_block_attn, fused_swin_block_full,
        full_block_fits_vmem, rel_pos_bias_padded)
    from lavender_tpu.models.swin3d import relative_position_index

    B, D = args.batch, args.frames
    dims = {1: (56, 128, 4), 2: (28, 256, 8), 3: (14, 512, 16),
            4: (7, 1024, 32)}
    H, C, nH = dims[args.stage]
    W = H
    window = (D, 7, 7)
    ww = 7
    wwp = _round8(ww)
    HD = 4 * C
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, D, H, W, C), dt)
    ln_s = jnp.ones((C,), jnp.float32)
    ln_b = jnp.zeros((C,), jnp.float32)
    wqkv = (jax.random.normal(key, (C, 3 * C), dt) * 0.02)
    bqkv = jnp.zeros((3 * C,), dt)
    wproj = (jax.random.normal(key, (C, C), dt) * 0.02)
    bproj = jnp.zeros((C,), dt)
    table = jax.random.normal(
        key, ((2 * D - 1) * 13 * 13, nH), jnp.float32)
    rpi = relative_position_index((D, 7, 7))
    bias = rel_pos_bias_padded(table, rpi, D, 7, ww, wwp, dt)
    w1 = (jax.random.normal(key, (C, HD), dt) * 0.02)
    b1 = jnp.zeros((HD,), dt)
    w2 = (jax.random.normal(key, (HD, C), dt) * 0.02)
    b2 = jnp.zeros((C,), dt)
    scale = (C // nH) ** -0.5
    full_ok = full_block_fits_vmem(C, HD, nH, D * 7 * wwp)

    def scan_time(fn, *inputs, label=""):
        @jax.jit
        def run(*inputs):
            def body(c, _):
                return fn(*inputs, c), None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=args.iters)
            return c

        t0 = time.perf_counter()
        float(run(*inputs))
        compile_s = time.perf_counter() - t0
        float(run(*inputs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*inputs))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best / args.iters * 1e3:8.2f} ms/iter"
              f"  (compile {compile_s:.0f}s)", flush=True)

    shift = (0, 3, 3)

    def block(shift_size, xin):
        if full_ok:
            return fused_swin_block_full(
                xin, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias,
                ln_s, ln_b, w1, b1, w2, b2, window, shift_size, nH, scale,
                1e-5)
        return fused_swin_block_attn(
            xin, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, window,
            shift_size, nH, scale, 1e-5)

    scan_time(
        lambda xx, c: block((0, 0, 0),
                            xx + c.astype(dt)).astype(jnp.float32).mean(),
        x, label=f"stage{args.stage} block NO shift (full={full_ok})")
    if H > 7:
        scan_time(
            lambda xx, c: block(shift,
                                xx + c.astype(dt)).astype(jnp.float32
                                                          ).mean(),
            x, label=f"stage{args.stage} block WITH shift")
    scan_time(
        lambda xx, c: jnp.roll(xx + c.astype(dt), (3, 3),
                               axis=(2, 3)).astype(jnp.float32).mean(),
        x, label="raw jnp.roll H+W")

    def padunpad(xx, c):
        nWc = W // ww
        xr = (xx + c.astype(dt)).reshape(B, D, H, nWc, ww, C)
        xr = jnp.pad(xr, ((0, 0),) * 4 + ((0, wwp - ww), (0, 0)))
        xp = xr.reshape(B, D, H, nWc * wwp, C)
        out = xp.reshape(B, D, H, nWc, wwp, C)[:, :, :, :, :ww, :]
        return out.astype(jnp.float32).mean()

    scan_time(padunpad, x, label="raw pad7->8 + unpad")


if __name__ == "__main__":
    main()
