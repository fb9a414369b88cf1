"""Component scan-timing on the real TPU (round-1 PERF.md methodology).

Times each piece with N chained iterations inside ONE lax.scan + a single
host fetch, so relay round-trips don't pollute the numbers.

Usage: python _perf/time_components.py [--attn fused] [--iters 30] \
          [--parts swin,stages,fusion,mlp,attnonly]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", default="fused")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--parts", default="swin,stages,fusion")
    ap.add_argument("--fused-attn", action="store_true",
                    help="(legacy, now default) fusion-encoder attention "
                         "via the Pallas kernel")
    ap.add_argument("--no-fused-attn", action="store_true")
    ap.add_argument("--no-fused-ffn", action="store_true")
    ap.add_argument("--pe-impl", default="s2d", choices=["s2d", "conv"])
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
    from lavender_tpu.config import BertConfig, ModelConfig, SWIN_PRESETS
    from lavender_tpu.models.lavender import LavenderModel
    from lavender_tpu.models.swin3d import VideoSwin3D, PatchEmbed3D

    swin = dataclasses.replace(SWIN_PRESETS["base"], attn_impl=args.attn,
                               scan_blocks=True)
    # Serving defaults (BertConfig: fused_ffn/fused_attn ON) unless
    # explicitly disabled — the old harness silently timed the XLA path.
    bert = BertConfig(fused_ffn=not args.no_fused_ffn,
                      fused_attn=not args.no_fused_attn)
    cfg = ModelConfig(swin=swin, bert=bert, dtype="bfloat16")
    B, T, S = args.batch, 5, 224
    iters = args.iters

    def scan_time(fn, *inputs, label=""):
        """Median-of-1 timing of `iters` chained applications."""
        @jax.jit
        def run(*inputs):
            def body(c, _):
                out = fn(*inputs, carry=c)
                return out, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=iters)
            return c
        t0 = time.perf_counter()
        float(run(*inputs))
        compile_t = time.perf_counter() - t0
        float(run(*inputs))  # warm
        best = float("inf")
        for _ in range(3):  # min-of-3: the fetch RTT varies tens of ms
            t0 = time.perf_counter()
            float(run(*inputs))
            best = min(best, time.perf_counter() - t0)
        dt = best / iters
        print(f"{label:34s} {dt * 1e3:9.2f} ms/iter  "
              f"(compile {compile_t:.0f}s)", flush=True)
        return dt

    parts = args.parts.split(",")
    rng = np.random.RandomState(0)

    if "swin" in parts or "stages" in parts or "mlp" in parts \
            or "attnonly" in parts:
        backbone = VideoSwin3D(swin, dtype=jnp.bfloat16)
        x_img = jnp.asarray(rng.rand(B, T, S, S, 3), jnp.bfloat16)
        bparams = jax.jit(backbone.init)(jax.random.PRNGKey(0), x_img)
        bparams = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, bparams)

    if "swin" in parts:
        def swin_fwd(params, x, carry):
            out = backbone.apply(params, x + carry.astype(jnp.bfloat16))
            return out.astype(jnp.float32).mean()
        scan_time(swin_fwd, bparams, x_img, label=f"Swin-B full ({args.attn})")

    if "stages" in parts:
        # per-stage: embed dim / spatial size per stage of Swin-B
        from lavender_tpu.models.swin3d import BasicLayer
        dims = [(128, 56, 0), (256, 28, 1), (512, 14, 2), (1024, 7, 3)]
        for Cs, HW, i in dims:
            layer = BasicLayer(
                dim=Cs, depth=swin.depths[i], num_heads=swin.num_heads[i],
                window_size=swin.window_size,
                mlp_ratio=swin.mlp_ratio, qkv_bias=swin.qkv_bias,
                qk_scale=swin.qk_scale,
                drop_path_rates=tuple([0.0] * swin.depths[i]),
                has_downsample=False, attn_impl=args.attn,
                scan_blocks=swin.scan_blocks,
                layer_norm_eps=swin.layer_norm_eps, dtype=jnp.bfloat16)
            xs = jnp.asarray(rng.rand(B, 3, HW, HW, Cs), jnp.bfloat16)
            p = jax.jit(layer.init)(jax.random.PRNGKey(0), xs)
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, p)

            def stage_fwd(p, xs, carry, _layer=layer):
                out = _layer.apply(p, xs + carry.astype(jnp.bfloat16))
                return out.astype(jnp.float32).mean()
            scan_time(stage_fwd, p, xs,
                      label=f"stage{i + 1} C={Cs} {HW}x{HW} "
                            f"depth={swin.depths[i]}")

    if "hw" in parts:
        # hardware reality checks: effective HBM BW + MXU floor
        big = jnp.asarray(rng.rand(64 * 1024 * 1024 // 4).astype(np.float32))

        def bw_fn(x, carry):
            y = x * 1.000001 + carry
            return y.mean()
        # traffic per iter: read 64MB + write 64MB intermediate -> ~128MB
        dt_bw = scan_time(bw_fn, big, label="elementwise 64MB f32 (BW probe)")
        print(f"  -> effective HBM BW ~ {2 * big.size * 4 / dt_bw / 1e9:.0f} "
              f"GB/s", flush=True)

        a = jnp.asarray(rng.rand(4096, 4096).astype(np.float32),
                        jnp.bfloat16)

        def mm_fn(a, carry):
            b = a + carry.astype(jnp.bfloat16)
            return (b @ a).astype(jnp.float32).mean()
        dt_mm = scan_time(mm_fn, a, label="matmul 4096^3 bf16")
        print(f"  -> MXU ~ {2 * 4096 ** 3 / dt_mm / 1e12:.0f} TF/s",
              flush=True)

    if "embed" in parts:
        from lavender_tpu.models.swin3d import PatchEmbed3D, PatchMerging
        pe = PatchEmbed3D(patch_size=swin.patch_size,
                          embed_dim=swin.embed_dim, dtype=jnp.bfloat16,
                          impl=getattr(args, "pe_impl", "s2d"))
        x_img2 = jnp.asarray(rng.rand(B, T, S, S, 3), jnp.bfloat16)
        pp = jax.jit(pe.init)(jax.random.PRNGKey(0), x_img2)
        pp = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, pp)

        def pe_fwd(pp, x, carry):
            out = pe.apply(pp, x + carry.astype(jnp.bfloat16))
            return out.astype(jnp.float32).mean()
        scan_time(pe_fwd, pp, x_img2, label="patch embed (2,4,4)")

        for Cs, HW in [(128, 56), (256, 28), (512, 14)]:
            pm = PatchMerging(dim=Cs, dtype=jnp.bfloat16)
            xm = jnp.asarray(rng.rand(B, 3, HW, HW, Cs), jnp.bfloat16)
            pmp = jax.jit(pm.init)(jax.random.PRNGKey(0), xm)
            pmp = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, pmp)

            def pm_fwd(pmp, xm, carry, _pm=pm):
                out = _pm.apply(pmp, xm + carry.astype(jnp.bfloat16))
                return out.astype(jnp.float32).mean()
            scan_time(pm_fwd, pmp, xm, label=f"patch merge C={Cs} {HW}x{HW}")

    if "shifts" in parts:
        # the wm path's per-block-pair relayout cost: wm_shift (reverse ->
        # roll -> partition, one fused XLA copy) at each stage's geometry.
        # Stage i runs depths[i]/2 pairs x 2 shifts of this.
        from lavender_tpu.ops.swin_block_attn import _round8, wm_shift
        geoms = [(128, 56, (1, 2)), (256, 28, (1, 2)), (512, 14, (9, 18)),
                 (1024, 7, (1, 2))]
        for Cs, HW, (pairs, _d) in geoms:
            win = (8, 7, 7)
            D = 3
            weff = (min(D, win[0]), win[1], win[2])
            N = int(np.prod(weff))
            Npad = _round8(N)
            nW = (HW // 7) ** 2
            t = jnp.asarray(rng.rand(B, nW, Npad, Cs), jnp.bfloat16)

            def sh_fwd(t, carry, _w=weff, _hw=HW):
                y = wm_shift(t + carry.astype(jnp.bfloat16), _w, D, _hw,
                             _hw, (0, 3, 3))
                return y.astype(jnp.float32).mean()
            dt_s = scan_time(sh_fwd, t,
                             label=f"wm_shift C={Cs} {HW}x{HW} nW={nW}")
            mb = t.size * 2 / 1e6
            print(f"  -> {mb:.1f} MB tensor, ~{2 * mb / dt_s / 1e3:.0f} "
                  f"GB/s; x{2 * pairs} per fwd = "
                  f"{2 * pairs * dt_s * 1e3:.2f} ms", flush=True)

    if "fusion" in parts:
        model = LavenderModel(cfg, dtype=jnp.bfloat16)
        L = 26
        txt = jnp.asarray(rng.randint(1, 30000, (B, L)), jnp.int32)
        mask = jnp.ones((B, L), jnp.int32)
        img = jnp.asarray(rng.rand(B, T, S, S, 3), jnp.bfloat16)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), img[:1], txt[:1], mask[:1])
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables)
        Lv = T * (1 + 7 * 7)
        fi = jnp.asarray(rng.rand(B, Lv, 768), jnp.bfloat16)
        mi = jnp.ones((B, Lv), jnp.int32)

        def fusion_fwd(variables, fi, mi, txt, mask, carry):
            ft = model.apply(variables, txt,
                             method=lambda m, t: m.enc_txt(t))
            out = model.apply(
                variables, fi + carry.astype(jnp.bfloat16), mi, ft, mask,
                method=LavenderModel.go_cross)
            logits = model.apply(variables, out[:, Lv:],
                                 method=LavenderModel.mlm_head)
            return logits.astype(jnp.float32).mean()
        scan_time(fusion_fwd, variables, fi, mi, txt, mask,
                  label="fusion (12L BERT + MLM head)")

    if "fusionparts" in parts:
        # Localize the fusion cost: 12-layer encoder alone, then a
        # 12x stack of just the attention sub-block / just the FFN
        # sub-block, on the flagship sequence geometry.
        import flax.linen as fnn
        from lavender_tpu.models.bert import (
            BertEncoder, BertLayer, BertAttention, extended_attention_mask)
        Lf = T * (1 + 7 * 7) + 26  # 276
        hb = jnp.asarray(rng.rand(B, Lf, bert.hidden_size), jnp.bfloat16)
        am = extended_attention_mask(
            jnp.ones((B, Lf), jnp.int32), jnp.bfloat16)

        enc = BertEncoder(bert, dtype=jnp.bfloat16)
        pe_ = jax.jit(enc.init)(jax.random.PRNGKey(0), hb, am)
        pe_ = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, pe_)

        def enc_fwd(p, h, am, carry):
            out = enc.apply(p, h + carry.astype(jnp.bfloat16), am)
            return out.astype(jnp.float32).mean()
        scan_time(enc_fwd, pe_, hb, am, label=f"12L encoder alone L={Lf}")

        class _AttnStack(fnn.Module):
            cfg: object
            dtype: object

            @fnn.compact
            def __call__(self, h, am):
                for i in range(12):
                    h = BertAttention(self.cfg, dtype=self.dtype,
                                      name=f"a{i}")(h, am)
                return h

        st = _AttnStack(bert, jnp.bfloat16)
        ps = jax.jit(st.init)(jax.random.PRNGKey(0), hb, am)
        ps = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, ps)

        def attn_fwd(p, h, am, carry):
            out = st.apply(p, h + carry.astype(jnp.bfloat16), am)
            return out.astype(jnp.float32).mean()
        scan_time(attn_fwd, ps, hb, am, label="12x attention sub-block")

        class _FfnStack(fnn.Module):
            cfg: object
            dtype: object

            @fnn.compact
            def __call__(self, h):
                for i in range(12):
                    h = BertLayer(self.cfg, dtype=self.dtype,
                                  name=f"f{i}")._ffn(h, True)
                return h

        sf = _FfnStack(bert, jnp.bfloat16)
        pf = jax.jit(sf.init)(jax.random.PRNGKey(0), hb)
        pf = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, pf)

        def ffn_fwd(p, h, carry):
            out = sf.apply(p, h + carry.astype(jnp.bfloat16))
            return out.astype(jnp.float32).mean()
        scan_time(ffn_fwd, pf, hb, label="12x FFN sub-block")


if __name__ == "__main__":
    main()
# appended: embed/merge micro-parts (invoked via --parts embed)
