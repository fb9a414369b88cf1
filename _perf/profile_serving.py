"""Per-HLO-op device profile of the flagship serving forward (VERDICT #3:
"a per-op xprof table proving every remaining ms sits at the measured
MXU/HBM bound" — or, better, showing where the next ms comes from).

Captures a jax.profiler trace of the exact bench.py forward_n program and
prints the top-K HLO ops by self device time via xprof's hlo_stats tool.

Usage: python _perf/profile_serving.py [--batch 24] [--iters 10] [--train]
"""
import argparse
import csv
import glob
import io
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import numpy as np

TRACE_DIR = "/tmp/lvt_prof"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--csv-out", default="")
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
    from lavender_tpu.data.transforms import device_normalize
    from lavender_tpu.models.lavender import LavenderModel

    swin = dataclasses.replace(SWIN_PRESETS["base"], attn_impl="wm",
                               scan_blocks=True)
    bert = BertConfig(fused_ffn=True, fused_attn=True)
    cfg = ModelConfig(swin=swin, bert=bert, dtype="bfloat16")
    model = LavenderModel(cfg, dtype=jnp.bfloat16)

    B, T, S, L = args.batch, 5, 224, 26
    rng = np.random.RandomState(0)
    img_u8 = jnp.asarray(rng.randint(0, 255, (B, T, S, S, 3), np.uint8))
    txt = jnp.asarray(np.random.RandomState(1).randint(
        1, bert.vocab_size, (B, L), np.int32))
    mask = jnp.ones((B, L), jnp.int32)
    img0 = device_normalize(img_u8, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0[:1],
                                    txt[:1], mask[:1])
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)
    if not args.train:
        # match bench.py's shipped serving config: prebuilt bias cache
        from lavender_tpu.models.swin3d import build_serving_bias_cache
        variables = build_serving_bias_cache(
            model, variables, img0[:1], txt[:1], mask[:1])

    iters = args.iters

    if args.train:
        from lavender_tpu.config import TrainConfig
        from lavender_tpu.tasks import retrieval
        from lavender_tpu.train import optimizer as opt_lib
        from lavender_tpu.train import trainer
        import optax
        tcfg = TrainConfig(max_iter=1000, max_grad_norm=1.0)
        tx = opt_lib.build_optimizer(variables["params"], tcfg)
        state = trainer.create_train_state(variables["params"], tx, seed=0)
        loss_fn = retrieval.make_loss_fn(model, true_id=2081, false_id=6270)
        vid = jnp.arange(B, dtype=jnp.int32)

        @jax.jit
        def run(state, img_u8, txt, mask):
            def body(state, _):
                img = device_normalize(img_u8, dtype=jnp.bfloat16)
                batch = {"img": img, "txt": txt, "mask": mask, "vid": vid}
                rng_, new_rng = jax.random.split(state.rng)
                out, grads = jax.value_and_grad(loss_fn)(
                    state.params, batch, rng_)
                updates, new_opt = tx.update(grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
                return trainer.TrainState(
                    step=state.step + 1, params=new_params,
                    opt_state=new_opt, rng=new_rng), out
            state, losses = jax.lax.scan(body, state, None, length=iters)
            return state, losses[-1]

        state, l0 = run(state, img_u8, txt, mask)
        float(l0)  # compile+warm

        def timed():
            s, l = run(state, img_u8, txt, mask)
            return float(l)
    else:
        @jax.jit
        def run(variables, img_u8, txt, mask):
            def body(carry, _):
                img = device_normalize(img_u8, dtype=jnp.bfloat16)
                img = img + (carry * 1e-6).astype(jnp.bfloat16)
                out = model.apply(variables, img, txt, mask)
                return out.astype(jnp.float32).mean(), None
            carry, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=iters)
            return carry

        float(run(variables, img_u8, txt, mask))  # compile
        float(run(variables, img_u8, txt, mask))  # warm

        def timed():
            return float(run(variables, img_u8, txt, mask))

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    timed()
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {iters} iters in {wall * 1e3:.1f} ms "
          f"({wall / iters * 1e3:.2f} ms/iter)", flush=True)

    xplanes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane.pb under {TRACE_DIR}"
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    if data.lstrip().startswith("{"):
        # newer xprof emits a gviz DataTable JSON instead of CSV
        import json as _json
        tbl = _json.loads(data)
        hdr = [c.get("id", "") for c in tbl["cols"]]
        rows = [hdr] + [
            [("" if cell is None else str(cell.get("v", "")))
             for cell in r["c"]] for r in tbl["rows"]]
    else:
        rows = list(csv.reader(io.StringIO(data)))
        hdr = rows[0]
    if args.csv_out:
        with open(args.csv_out, "w") as f:
            f.write(data)
        print(f"full table -> {args.csv_out}")

    def col(name):
        for i, h in enumerate(hdr):
            if name.lower() in h.lower():
                return i
        raise KeyError(f"{name} not in {hdr}")

    try:
        c_time = col("total_self_time")
    except KeyError:
        try:
            c_time = col("total_time_in_us")
        except KeyError:
            c_time = col("total_time")
    c_name = col("hlo_op_expression") if any(
        "hlo_op_expression" in h for h in hdr) else col("hlo_op_name")
    try:
        c_cat = col("hlo_category")
    except KeyError:
        c_cat = col("category")
    body = [r for r in rows[1:] if len(r) == len(hdr)]
    body.sort(key=lambda r: -float(r[c_time] or 0))
    tot = sum(float(r[c_time] or 0) for r in body)
    print(f"\ncolumns: {hdr}\n")
    print(f"total device time: {tot / 1e3:.2f} ms over {iters} iters "
          f"== {tot / 1e3 / iters:.3f} ms/iter")
    print(f"{'us/iter':>9}  {'%':>5}  {'category':<22} op")
    for r in body[: args.top]:
        t = float(r[c_time] or 0)
        name = r[c_name][:110]
        print(f"{t / iters:9.1f}  {t / tot * 100:5.1f}  {r[c_cat]:<22} "
              f"{name}")

    # category rollup
    cats = {}
    for r in body:
        cats[r[c_cat]] = cats.get(r[c_cat], 0.0) + float(r[c_time] or 0)
    print("\nby category (ms/iter):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v / 1e3 / iters:8.3f}  {k}")


if __name__ == "__main__":
    main()
