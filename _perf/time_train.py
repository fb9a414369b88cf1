"""Train-step decomposition on the real TPU (bench.py --train workload).

Times the retrieval-MLM train step (B x B pairs, fwd+bwd+AdamW) and its
pieces with the scan-chained single-fetch methodology of
time_components.py, so the step's ~360 ms is attributed before any kernel
work: Swin fwd+bwd vs fusion-stack fwd+bwd on the B^2 pairs vs the MLM
head vs the optimizer update.

Usage: python _perf/time_train.py [--batch 8] [--iters 10] [--attn wm]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", default="wm")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--drop-path", type=float, default=0.1)
    ap.add_argument("--parts", default="step,fwd,swin,fusion,opt")
    ap.add_argument("--fused-attn-train", action="store_true")
    ap.add_argument("--fused-ffn-train", action="store_true")
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
    from lavender_tpu.config import (BertConfig, ModelConfig, SWIN_PRESETS,
                                     TrainConfig)
    from lavender_tpu.data.transforms import device_normalize
    from lavender_tpu.models.lavender import LavenderModel
    from lavender_tpu.tasks import retrieval
    from lavender_tpu.train import optimizer as opt_lib
    from lavender_tpu.train import trainer

    swin = dataclasses.replace(SWIN_PRESETS["base"], attn_impl=args.attn,
                               scan_blocks=True,
                               drop_path_rate=args.drop_path)
    bert = BertConfig(fused_ffn=True, fused_attn=True,
                      fused_attn_train=args.fused_attn_train,
                      fused_ffn_train=args.fused_ffn_train)
    cfg = ModelConfig(swin=swin, bert=bert, dtype="bfloat16")
    model = LavenderModel(cfg, dtype=jnp.bfloat16)

    B, T, S = args.batch, 5, 224
    L = 31
    iters = args.iters
    rng = np.random.RandomState(0)
    img_u8 = jnp.asarray(rng.randint(0, 255, (B, T, S, S, 3), np.uint8))
    txt = jnp.asarray(
        rng.randint(1, bert.vocab_size, (B, L)).astype(np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    img0 = device_normalize(img_u8, dtype=jnp.bfloat16)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0[:1],
                                    txt[:1], mask[:1])
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)
    params = variables["params"]

    tcfg = TrainConfig(max_iter=1000, max_grad_norm=1.0)
    tx = opt_lib.build_optimizer(params, tcfg)
    state = trainer.create_train_state(params, tx, seed=0)
    loss_fn = retrieval.make_loss_fn(model, true_id=2081, false_id=6270)
    vid = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)

    def scan_time(fn, *inputs, label=""):
        @jax.jit
        def run(*inputs):
            def body(c, _):
                return fn(*inputs, carry=c), None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=iters)
            return c

        t0 = time.perf_counter()
        float(run(*inputs))
        compile_t = time.perf_counter() - t0
        float(run(*inputs))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*inputs))
            best = min(best, time.perf_counter() - t0)
        dt = best / iters
        clips = B / dt
        print(f"{label:44s} {dt * 1e3:9.2f} ms/iter  ({clips:6.1f} clips/s)"
              f"  (compile {compile_t:.0f}s)", flush=True)
        return dt

    parts = args.parts.split(",")

    def batch_of(c):
        img = device_normalize(img_u8, dtype=jnp.bfloat16)
        img = img + c.astype(jnp.bfloat16)
        return {"img": img, "txt": txt, "mask": mask, "vid": vid}

    if "step" in parts:
        import optax

        def full_step(state, carry):
            batch = batch_of(carry)
            rng_d, _ = jax.random.split(jax.random.wrap_key_data(
                state.rng, impl=trainer.TRAIN_PRNG_IMPL))
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, rng_d)
            updates, _ = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            # fold the new params into the carry so nothing is DCE'd
            leaf = jax.tree_util.tree_leaves(new_params)[0]
            return loss + leaf.astype(jnp.float32).mean()
        scan_time(full_step, state, label="FULL train step (fwd+bwd+AdamW)")

    if "fwd" in parts:
        def fwd_only(params, carry):
            batch = batch_of(carry)
            return loss_fn(params, batch, key)
        scan_time(fwd_only, state.params, label="loss forward only")

        def fwd_bwd(params, carry):
            batch = batch_of(carry)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            # consume EVERY grad leaf — consuming one leaf lets XLA DCE
            # all the other parameter-grad matmuls (dW = x^T dy), which
            # made fwd+bwd measure == fwd-only (round-3 battery artifact)
            acc = sum(leaf.astype(jnp.float32).mean()
                      for leaf in jax.tree_util.tree_leaves(grads))
            return loss + acc
        scan_time(fwd_bwd, state.params, label="loss fwd+bwd (no optimizer)")

    if "swin" in parts:
        # go_feat alone (Swin on B clips + text embed), fwd and fwd+bwd
        def feat_fwd(params, carry):
            img = device_normalize(img_u8, dtype=jnp.bfloat16)
            img = img + carry.astype(jnp.bfloat16)
            fi, mi, ft, mt = model.apply(
                {"params": params}, img, txt, mask, deterministic=False,
                method=LavenderModel.go_feat, rngs={"dropout": key})
            return fi.astype(jnp.float32).mean()
        scan_time(feat_fwd, state.params, label="go_feat fwd (Swin B clips)")

        def feat_loss(params, carry):
            img = device_normalize(img_u8, dtype=jnp.bfloat16)
            img = img + carry.astype(jnp.bfloat16)
            fi, mi, ft, mt = model.apply(
                {"params": params}, img, txt, mask, deterministic=False,
                method=LavenderModel.go_feat, rngs={"dropout": key})
            return fi.astype(jnp.float32).mean()

        def feat_bwd(params, carry):
            loss, grads = jax.value_and_grad(feat_loss)(params, carry)
            acc = sum(leaf.astype(jnp.float32).mean()
                      for leaf in jax.tree_util.tree_leaves(grads))
            return loss + acc
        scan_time(feat_bwd, state.params, label="go_feat fwd+bwd")

    if "fusion" in parts:
        # the cross stage on the B^2 pairs, isolated: precompute feats
        fi, mi, ft, mt = model.apply(
            variables, img0, txt, mask, deterministic=True,
            method=LavenderModel.go_feat)
        b = B
        pfi = jnp.repeat(fi, b, axis=0)
        pmi = jnp.repeat(mi, b, axis=0)
        pft = jnp.tile(ft, (b, 1, 1))
        pmt = jnp.tile(mt, (b, 1))
        Lv = fi.shape[1]

        def cross_loss(params, pfi, carry):
            pfi = pfi + carry.astype(pfi.dtype)
            out = model.apply(
                {"params": params}, pfi, pmi, pft, pmt,
                deterministic=False, method=LavenderModel.go_cross,
                rngs={"dropout": key})
            logits = model.apply(
                {"params": params}, out[:, -1:],
                method=LavenderModel.mlm_head)
            return logits[:, -1, :].astype(jnp.float32).mean()

        def cross_fwd(params, pfi, carry):
            return cross_loss(params, pfi, carry)
        scan_time(cross_fwd, state.params, pfi,
                  label=f"go_cross+head fwd ({B * b} pairs)")

        def cross_bwd(params, pfi, carry):
            loss, grads = jax.value_and_grad(cross_loss)(params, pfi, carry)
            acc = sum(leaf.astype(jnp.float32).mean()
                      for leaf in jax.tree_util.tree_leaves(grads))
            return loss + acc
        scan_time(cross_bwd, state.params, pfi,
                  label=f"go_cross+head fwd+bwd ({B * b} pairs)")

    if "opt" in parts:
        import optax
        grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def opt_only(state, grads, carry):
            g = jax.tree_util.tree_map(
                lambda x: x + carry.astype(x.dtype), grads)
            updates, _ = tx.update(g, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            leaf = jax.tree_util.tree_leaves(new_params)[0]
            return leaf.astype(jnp.float32).mean()
        scan_time(opt_only, state, grads, label="AdamW update alone")


if __name__ == "__main__" and "--crossparts" not in __import__("sys").argv:
    main()


def crossparts():
    """Train-mode sub-block decomposition of the B^2-pair cross encoder
    (the dominant train cost, PERF.md round-4 train decomposition:
    go_cross fwd 62.9 ms at ~27% MXU).  Times the 12x attention
    sub-block and 12x FFN sub-block stacks at the [B^2, 280, 768] train
    shape, fwd and fwd+bwd, plus no-dropout controls (same code,
    dropout probs zero) to isolate the RNG/dropout share.

    Usage: python _perf/time_train.py --crossparts [--batch 8] [--fused-attn-train]
    """
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--crossparts", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fused-attn-train", action="store_true")
    ap.add_argument("--fused-ffn-train", action="store_true")
    args = ap.parse_args()

    import time
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/lavender_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import dataclasses
    import flax.linen as fnn
    from lavender_tpu.config import BertConfig
    from lavender_tpu.models.bert import (BertAttention, BertLayer,
                                          extended_attention_mask)

    iters = args.iters
    P = args.batch * args.batch  # pair count
    Lf = 5 * (1 + 7 * 7) + 30    # 280
    rng = np.random.RandomState(0)

    def scan_time(fn, *inputs, label=""):
        @jax.jit
        def run(*inputs):
            def body(c, _):
                return fn(*inputs, carry=c), None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=iters)
            return c
        t0 = time.perf_counter()
        float(run(*inputs))
        compile_t = time.perf_counter() - t0
        float(run(*inputs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*inputs))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:52s} {best / iters * 1e3:9.2f} ms/iter"
              f"  (compile {compile_t:.0f}s)", flush=True)

    base = BertConfig(fused_attn=True, fused_ffn=True,
                      fused_attn_train=args.fused_attn_train,
                      fused_ffn_train=args.fused_ffn_train)
    nodrop = dataclasses.replace(base, attention_probs_dropout_prob=0.0,
                                 hidden_dropout_prob=0.0)
    hb = jnp.asarray(rng.rand(P, Lf, base.hidden_size), jnp.bfloat16)
    am = extended_attention_mask(jnp.ones((P, Lf), jnp.int32), jnp.bfloat16)
    key = jax.random.PRNGKey(3)

    class _AttnStack(fnn.Module):
        cfg: object

        @fnn.compact
        def __call__(self, h, am, det):
            for i in range(12):
                h = BertAttention(self.cfg, dtype=jnp.bfloat16,
                                  name=f"a{i}")(h, am, det)
            return h

    class _FfnStack(fnn.Module):
        cfg: object

        @fnn.compact
        def __call__(self, h, det):
            for i in range(12):
                h = BertLayer(self.cfg, dtype=jnp.bfloat16,
                              name=f"f{i}")._ffn(h, det)
            return h

    for tag, cfg in (("train", base), ("train-nodrop", nodrop)):
        st = _AttnStack(cfg)
        ps = jax.jit(st.init, static_argnums=3)(
            jax.random.PRNGKey(0), hb, am, True)
        ps = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, ps)

        def attn_loss(p, h, am, carry):
            out = st.apply(p, h + carry.astype(jnp.bfloat16), am, False,
                           rngs={"dropout": key})
            return out.astype(jnp.float32).mean()
        scan_time(attn_loss, ps, hb, am,
                  label=f"12x attn sub-block fwd [{tag}] P={P}")

        def attn_bwd(p, h, am, carry):
            loss, g = jax.value_and_grad(attn_loss)(p, h, am, carry)
            return loss + sum(x.astype(jnp.float32).mean()
                              for x in jax.tree_util.tree_leaves(g))
        scan_time(attn_bwd, ps, hb, am,
                  label=f"12x attn sub-block fwd+bwd [{tag}]")

        sf = _FfnStack(cfg)
        pf = jax.jit(sf.init, static_argnums=2)(
            jax.random.PRNGKey(0), hb, True)
        pf = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, pf)

        def ffn_loss(p, h, carry):
            out = sf.apply(p, h + carry.astype(jnp.bfloat16), False,
                           rngs={"dropout": key})
            return out.astype(jnp.float32).mean()
        scan_time(ffn_loss, pf, hb,
                  label=f"12x FFN sub-block fwd [{tag}]")

        def ffn_bwd(p, h, carry):
            loss, g = jax.value_and_grad(ffn_loss)(p, h, carry)
            return loss + sum(x.astype(jnp.float32).mean()
                              for x in jax.tree_util.tree_leaves(g))
        scan_time(ffn_bwd, pf, hb,
                  label=f"12x FFN sub-block fwd+bwd [{tag}]")


if __name__ == "__main__" and "--crossparts" in __import__("sys").argv:
    import numpy as np  # noqa: F811
    crossparts()
    raise SystemExit(0)
