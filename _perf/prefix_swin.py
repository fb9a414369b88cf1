"""Prefix timing of the composed Swin forward: time the real program cut
after each piece (embed, stage1..4 incl. merges, final LN).  Successive
differences give each piece's IN-CONTEXT cost — including the layout
transitions XLA inserts between pieces, which standalone micro-timers
miss (standalone stages sum to ~24 ms vs ~40 ms full).

Usage: python _perf/prefix_swin.py [--batch 16] [--iters 30]
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
    ap.add_argument("--attn", default="fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/lavender_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import dataclasses
    from lavender_tpu.config import SWIN_PRESETS
    from lavender_tpu.models.swin3d import (
        VideoSwin3D, PatchEmbed3D, BasicLayer)
    import flax.linen as nn

    cfg = dataclasses.replace(SWIN_PRESETS["base"], attn_impl=args.attn,
                              scan_blocks=True)
    B, T, S = args.batch, 5, 224
    iters = args.iters
    rng = np.random.RandomState(0)

    backbone = VideoSwin3D(cfg, dtype=jnp.bfloat16)
    x_img = jnp.asarray(rng.rand(B, T, S, S, 3), jnp.bfloat16)
    params = jax.jit(backbone.init)(jax.random.PRNGKey(0), x_img)["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    embed = PatchEmbed3D(patch_size=cfg.patch_size, embed_dim=cfg.embed_dim,
                         patch_norm=cfg.patch_norm,
                         layer_norm_eps=cfg.layer_norm_eps,
                         dtype=jnp.bfloat16)
    num_layers = len(cfg.depths)
    layers = []
    for i in range(num_layers):
        layers.append(BasicLayer(
            dim=int(cfg.embed_dim * 2 ** i), depth=cfg.depths[i],
            num_heads=cfg.num_heads[i], window_size=cfg.window_size,
            mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
            qk_scale=cfg.qk_scale,
            drop_path_rates=tuple([0.0] * cfg.depths[i]),
            has_downsample=i < num_layers - 1, attn_impl=args.attn,
            scan_blocks=True, layer_norm_eps=cfg.layer_norm_eps,
            dtype=jnp.bfloat16))
    ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.bfloat16)

    def prefix_fn(n_pieces):
        def fn(x, carry):
            h = x + carry.astype(jnp.bfloat16)
            h = embed.apply({"params": params["patch_embed"]}, h)
            for i in range(min(n_pieces - 1, num_layers)):
                h = layers[i].apply({"params": params[f"layers_{i}"]}, h)
            if n_pieces - 1 > num_layers:
                h = ln.apply({"params": params["norm"]}, h)
            return h.astype(jnp.float32).mean()
        return fn

    def scan_time(fn, label):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(x, c), None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=iters)
            return c
        t0 = time.perf_counter()
        float(run(x_img))
        compile_t = time.perf_counter() - t0
        float(run(x_img))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x_img))
            best = min(best, time.perf_counter() - t0)
        dt = best / iters
        print(f"{label:44s} {dt * 1e3:9.2f} ms/iter "
              f"(compile {compile_t:.0f}s)", flush=True)
        return dt

    names = ["embed", "+stage1(+merge)", "+stage2(+merge)", "+stage3(+merge)",
             "+stage4", "+final LN"]
    prev = 0.0
    for k in range(1, num_layers + 3):
        dt = scan_time(prefix_fn(k), f"prefix: {' '.join(names[:k])}"[:44])
        print(f"    delta {names[k - 1]:20s} {1e3 * (dt - prev):7.2f} ms",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
