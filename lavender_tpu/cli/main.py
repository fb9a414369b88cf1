"""Unified CLI — replaces the reference's 17 main_*.py scripts with one
task registry.

Usage (mirrors README.md:91-215 of the reference, minus torch.distributed):

    python -m lavender_tpu.cli.main --task retrieval_mlm \
        --config _args/args_msrvtt-retrieval.json [--path_ckpt ckpt.pt ...]

Task = (dataset adapter, loss fn, eval step) per SURVEY.md §7: the reference's
per-script (Dataset_X, LAVENDER_X, Agent_X) triples become registry entries.
"""
from __future__ import annotations

import argparse
import json
import os.path as op
from datetime import datetime
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from lavender_tpu.config import RunConfig, load_run_config
from lavender_tpu.data.dataset import load_task_data
from lavender_tpu.data.loader import DataLoader
from lavender_tpu.data.tokenizer import BertTokenizer
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.train.agent import Agent, run_finetune
from lavender_tpu.utils.logging import LOGGER

TASKS: Dict[str, Callable] = {}


def register(name):
    def deco(fn):
        TASKS[name] = fn
        return fn
    return deco


def _build_model(cfg: RunConfig, tok, model_cls=None, **kw):
    import dataclasses
    from lavender_tpu.config import BertConfig
    bert = dataclasses.replace(cfg.model.bert, vocab_size=max(
        cfg.model.bert.vocab_size, len(tok)))
    mcfg = dataclasses.replace(cfg.model, bert=bert)
    model = (model_cls or LavenderModel)(
        mcfg, dtype=jnp.dtype(mcfg.dtype), **kw)
    S, T, L = cfg.data.size_img, cfg.data.size_frame, cfg.data.size_txt + 1
    img = jnp.zeros((1, T, S, S, 3), jnp.float32)
    txt = jnp.zeros((1, L), jnp.int32)
    init_method = getattr(model, "init_forward", None)
    variables = jax.jit(
        lambda r: model.init(r, img, txt, jnp.ones((1, L), jnp.int32),
                             **({"method": init_method} if init_method
                                else {})))(jax.random.PRNGKey(cfg.train.seed))
    if cfg.path_ckpt and op.exists(cfg.path_ckpt):
        from lavender_tpu.train.checkpoint import load_reference_checkpoint
        params = load_reference_checkpoint(
            cfg.path_ckpt, variables["params"],
            max_size_frame=mcfg.max_size_frame,
            max_size_patch=mcfg.max_size_patch)
        variables = {"params": params}
        LOGGER.info(f"loaded checkpoint {cfg.path_ckpt}")
    return model, variables


def _loaders(cfg: RunConfig, datasets):
    world = jax.process_count()
    rank = jax.process_index()
    mk = lambda ds, sh: DataLoader(
        ds, cfg.train.size_batch, shuffle=sh, num_workers=cfg.data.n_workers,
        seed=cfg.train.seed, rank=rank, world=world, drop_last=sh)
    return (mk(datasets["train"], True), mk(datasets["val"], False),
            mk(datasets["test"], False) if "test" in datasets else None)


@register("retrieval_mlm")
def run_retrieval_mlm(cfg: RunConfig, tok):
    from lavender_tpu.tasks import retrieval
    datasets = load_task_data(cfg.data, retrieval.RetrievalDataset, tok)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok)
    ds = datasets["val"]
    agent = Agent(
        cfg, model, variables,
        loss_fn=retrieval.make_loss_fn(model, ds.true_token_id,
                                       ds.false_token_id),
        eval_step=_wrap_eval(retrieval.make_eval_step(
            model, ds.true_token_id, ds.false_token_id),
            ["img", "txt", "mask", "vid"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("qamc_mlm")
def run_qamc_mlm(cfg: RunConfig, tok):
    from lavender_tpu.tasks import qamc
    datasets = load_task_data(cfg.data, qamc.QAMCDataset, tok)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok)
    ds = datasets["val"]
    agent = Agent(
        cfg, model, variables, loss_fn=qamc.make_loss_fn(model),
        eval_step=_wrap_eval(qamc.make_eval_step(model, ds.ans_tok_ids),
                             ["img", "txt", "mask", "mask_ans", "ans_idx"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("qaoe_mlm")
def run_qaoe_mlm(cfg: RunConfig, tok):
    from lavender_tpu.tasks import qaoe
    datasets = load_task_data(cfg.data, qaoe.QAOEDataset, tok)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok)
    agent = Agent(
        cfg, model, variables, loss_fn=qaoe.make_loss_fn(model),
        eval_step=_wrap_eval(qaoe.make_eval_step(model),
                             ["img", "txt", "mask", "mask_ans"]))
    log = run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                       zero_shot=bool(cfg.path_ckpt))
    # "adjusted" test accuracy for datasets with missing test videos
    # (main_qaoe_mlm.py:178-188): scale by actual/size_test
    if "test" in datasets and cfg.extra.get("size_test"):
        actual = len(datasets["test"])
        ratio = actual / float(cfg.extra["size_test"])
        log["ac_ts_adjusted"] = [a * ratio for a in log.get("ac_ts", [])]
        agent.logger.info(f"adjusted test acc (x{ratio:.4f}): "
                          f"{log['ac_ts_adjusted']}")
    return log


@register("retmc_mlm")
def run_retmc_mlm(cfg: RunConfig, tok):
    from lavender_tpu.tasks import retmc
    datasets = load_task_data(cfg.data, retmc.RetMCDataset, tok)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok)
    ds = datasets["val"]
    agent = Agent(
        cfg, model, variables,
        loss_fn=retmc.make_loss_fn(model),
        eval_step=_wrap_eval(retmc.make_eval_step(
            model, ds.true_token_id, ds.false_token_id),
            ["img", "txt", "mask", "mask_ans", "ans_idx"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("caption")
def run_caption(cfg: RunConfig, tok):
    from lavender_tpu.models import captioning as cap
    from lavender_tpu.tasks import retrieval
    raw = {}
    if cfg.extra.get("config_path"):
        with open(cfg.extra["config_path"]) as f:
            raw = json.load(f)
    if "train_yaml" in raw:
        # YAML-driven composite corpora (Dataset_Caption, main_caption.py:17)
        from lavender_tpu.data.composite import CompositeCaptionDataset
        datasets = {
            split: CompositeCaptionDataset(
                cfg.data, tok, raw[f"{key}_yaml"], split)
            for split, key in (("train", "train"), ("val", "val"))
            if f"{key}_yaml" in raw}
        if "test_yaml" in raw:
            datasets["test"] = CompositeCaptionDataset(
                cfg.data, tok, raw["test_yaml"], "test")
    else:
        datasets = load_task_data(cfg.data, retrieval.RetrievalDataset, tok,
                                  mlm=False)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok)

    def train_prep(batch):
        masked, ans = cap.caption_masking(
            batch["txt"], tok.pad_token_id, tok.mask_token_id,
            p_mask=cfg.train.p_mask)
        batch = dict(batch)
        batch["txt"] = masked
        batch["ans_mtm"] = ans
        return batch

    agent = Agent(
        cfg, model, variables,
        loss_fn=cap.make_caption_loss_fn(
            model, label_smoothing=cfg.train.label_smoothing),
        train_prep=train_prep)
    generate = cap.make_generate_fn(
        model, tok.cls_token_id, tok.sep_token_id, tok.pad_token_id,
        tok.mask_token_id)

    def eval_captions(dl, predict_file=None):
        """Decode -> gather -> predictions TSV -> COCO metrics
        (Agent_Captioning.test + evaluate, main_caption.py:81-217)."""
        from lavender_tpu.parallel.mesh import all_gather_obj, is_main_process
        from lavender_tpu.utils.metrics import coco_caption_metrics
        cands, confs = {}, {}
        for batch in dl:
            img = agent.batch_to_device(batch)["img"]
            ids, logp = generate({"params": agent.state.params}, img,
                                 jax.random.PRNGKey(0))
            for key, row, lp_ in zip(batch["vid"], np.asarray(ids),
                                     np.asarray(logp)):
                cands[str(key)] = tok.decode(row.tolist())
                confs[str(key)] = float(np.exp(lp_))
        # cross-host gather of per-rank prediction dicts
        gathered = {}
        for per_host in all_gather_obj([cands]):
            for d in per_host:
                gathered.update(d)
        cands = gathered
        if predict_file and is_main_process():
            from lavender_tpu.data.tsv import tsv_writer
            rows = [[k, json.dumps([{"caption": v,
                                     "conf": confs.get(k, 0.0)}])]
                    for k, v in sorted(cands.items())]
            tsv_writer(rows, predict_file)
        refs = {}
        if hasattr(dl.dataset, "get_captions_by_key"):
            for key in cands:
                try:
                    refs[key] = dl.dataset.get_captions_by_key(key)
                except KeyError:
                    pass
        else:
            for item in dl.dataset.txt:
                refs.setdefault(str(item["video"]), []).append(
                    item["caption"] if isinstance(item["caption"], str)
                    else " ".join(item["caption"]))
        cands = {k: v for k, v in cands.items() if k in refs and refs[k]}
        refs = {k: refs[k] for k in cands}
        return coco_caption_metrics(cands, refs)

    agent.save_training_meta()
    for e in range(cfg.train.size_epoch):
        ls = agent.train_epoch(e + 1, dl_tr)
        metrics = eval_captions(
            dl_vl, predict_file=op.join(cfg.path_output,
                                        f"predictions_ep{e + 1}.tsv"))
        agent.log["ls_tr"].append(ls)
        agent.log["metrics_vl"].append(metrics)
        agent.save_model(e + 1)
        agent.logger.info(f"Ep {e + 1}: loss {ls:.4f} {metrics}")
    return dict(agent.log)


@register("pretrain_mlm")
def run_pretrain_mlm(cfg: RunConfig, tok):
    """Unified pretraining over shard-partitioned corpora
    (main_pretrain_mlm.py:235-328).  Expects per-dataset shard files
    ``{data_dir}/{dataset}_train_{part}.tsv`` + ``txt_{dataset}.json``
    (the reference's generic pattern, main_pretrain_task_specific.py:44-48).
    """
    import glob as globmod
    from lavender_tpu.tasks import pretrain as pt
    model, variables = _build_model(cfg, tok)
    loss_fn = pt.make_loss_fn(
        model, tok.convert_tokens_to_ids(["true"])[0],
        tok.convert_tokens_to_ids(["false"])[0],
        vtm_batch=min(cfg.train.size_batch, 4))
    agent = Agent(cfg, model, variables, loss_fn=loss_fn, has_aux=True)
    special = [tok.cls_token_id, tok.sep_token_id, tok.pad_token_id,
               tok.mask_token_id]

    def train_prep(batch):
        masked, ans = pt.mask_tokens(
            batch["txt"], special, tok.mask_token_id, cfg.train.p_mask)
        b = dict(batch)
        b["txt"], b["ans_mtm"] = masked, ans
        return b

    agent.train_prep = train_prep
    agent.save_training_meta()
    ds_name = cfg.data.dataset
    with open(op.join(cfg.data.data_dir, f"txt_{ds_name}.json")) as f:
        txt_data = json.load(f)
    parts = sorted(globmod.glob(
        op.join(cfg.data.data_dir, f"{ds_name}_train_*.tsv")))
    world, rank = jax.process_count(), jax.process_index()
    for e in range(cfg.train.size_epoch):
        for part, tsv_path in enumerate(parts):  # shard-by-shard epoch
            ds = pt.PretrainDataset(
                cfg.data, tok, "train", tsv_path,
                txt_data.get("train", txt_data), dataset_name=ds_name)
            dl = DataLoader(ds, cfg.train.size_batch, shuffle=True,
                            num_workers=cfg.data.n_workers, drop_last=True,
                            seed=cfg.train.seed + e, rank=rank, world=world)
            ls = agent.train_epoch(e + 1, dl)
            agent.log[f"{ds_name}-p{part}"].append(ls)
            agent.save_model(e + 1)
            agent.logger.info(f"Ep {e + 1} part {part}: loss {ls:.4f}")
    return dict(agent.log)


@register("eval_retrieval")
def run_eval_retrieval(cfg: RunConfig, tok):
    """Two-phase full-corpus retrieval eval (eval_retrieval_mlm.py)."""
    from lavender_tpu.tasks import eval_retrieval as er
    datasets = load_task_data(
        cfg.data, er.RetrievalEvalDataset, tok,
        multi_clip=cfg.multi_clip_testing)
    model, variables = _build_model(cfg, tok)
    results = {}
    for split in [s for s in ("val", "test") if s in datasets]:
        res = er.full_retrieval_eval(
            model, variables, datasets[split],
            batch_size=cfg.train.size_batch)
        results[split] = res
        LOGGER.info(f"{split}: {res}")
    if cfg.path_ckpt:
        out = op.splitext(cfg.path_ckpt)[0] + "_results.json"
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
    return results


@register("multi_task_mlm")
def run_multi_task_mlm(cfg: RunConfig, tok):
    """Unified multi-task finetune (main_multi_task_mlm.py).

    Config carries ``multi_task_datasets``: list of {type, task, dataset,
    ratio} entries; each builds its loader and the MetaLoader samples a
    task per step from a shared seeded RNG.
    """
    from lavender_tpu.data.loader import MetaLoader
    from lavender_tpu.models import captioning as cap
    from lavender_tpu.tasks import multi_task, qamc, qaoe, retmc, retrieval
    with open(cfg.extra["config_path"]) as f:
        raw = json.load(f)
    entries = raw.get("multi_task_datasets", [])
    model, variables = _build_model(cfg, tok)
    true_id = tok.convert_tokens_to_ids(["true"])[0]
    false_id = tok.convert_tokens_to_ids(["false"])[0]
    losses = multi_task.build_multi_task_losses(model, true_id, false_id)
    agent = Agent(cfg, model, variables,
                  loss_fn=losses["retrieval"])  # state/opt shared
    steps = multi_task.make_multi_task_train_steps(losses, agent.tx)

    ds_cls = {"retrieval": retrieval.RetrievalDataset,
              "qamc": qamc.QAMCDataset, "qaoe": qaoe.QAOEDataset,
              "retmc": retmc.RetMCDataset,
              "captioning": retrieval.RetrievalDataset}
    world, rank = jax.process_count(), jax.process_index()
    loaders, ratios, kinds = {}, {}, {}
    import dataclasses as dc
    for ent in entries:
        dcfg = dc.replace(cfg.data, dataset=ent["dataset"],
                          task=ent["task"])
        kind = ent["type"]
        kw = {"mlm": False} if kind == "captioning" else {}
        dss = load_task_data(dcfg, ds_cls[kind], tok, **kw)
        name = f'{kind}-{ent["dataset"]}'
        loaders[name] = DataLoader(
            dss["train"], cfg.train.size_batch, shuffle=True,
            num_workers=cfg.data.n_workers, drop_last=True,
            seed=cfg.train.seed, rank=rank, world=world)
        ratios[name] = int(ent.get("ratio", 1))
        kinds[name] = kind
    ml = MetaLoader(loaders, ratios=ratios, seed=cfg.train.seed)
    max_steps = int(raw.get("max_steps", 100))
    agent.save_training_meta()
    for step_i, (name, batch) in enumerate(iter(ml)):
        if step_i >= max_steps:
            break
        kind = kinds[name]
        if kind == "captioning":
            masked, ans = cap.caption_masking(
                batch["txt"], tok.pad_token_id, tok.mask_token_id,
                p_mask=cfg.train.p_mask)
            batch = dict(batch)
            batch["txt"], batch["ans_mtm"] = masked, ans
            batch["mask"] = batch["mask"]
        batch = {k: v for k, v in batch.items() if k != "vid" or
                 kind == "retrieval"}
        if kind == "retrieval":
            batch["vid"] = np.asarray(
                [hash(v) % (2 ** 31) if isinstance(v, str) else v
                 for v in batch["vid"]], np.int32)
        db = agent.batch_to_device(batch)
        agent.state, loss = steps[kind](agent.state, db)
        if step_i % 20 == 0:
            agent.logger.info(f"step {step_i} [{name}] loss {float(loss):.4f}")
    agent.save_model(0)
    return {"steps": max_steps}


def _wrap_eval(step, keys):
    def eval_step(variables, batch):
        return step(variables, *[batch[k] for k in keys])
    return eval_step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=sorted(TASKS))
    ap.add_argument("--config", required=True,
                    help="JSON config (reference _args/*.json key names)")
    ap.add_argument("--path_ckpt", default=None)
    ap.add_argument("--path_output", default=None)
    ap.add_argument("--vocab", default=None, help="WordPiece vocab.txt")
    args = ap.parse_args(argv)

    cfg = load_run_config(args.config)
    cfg.extra["config_path"] = args.config
    with open(args.config) as f:
        _raw = json.load(f)
    if "size_test" in _raw:
        cfg.extra["size_test"] = _raw["size_test"]
    if args.path_ckpt:
        cfg.path_ckpt = args.path_ckpt
    if args.path_output:
        cfg.path_output = args.path_output
    if args.vocab:
        cfg.data.vocab_path = args.vocab
    cfg.path_output = "%s/_%s_%s" % (
        cfg.path_output, cfg.data.task or args.task,
        datetime.now().strftime("%Y%m%d%H%M%S"))

    tok = BertTokenizer(cfg.data.vocab_path)
    return TASKS[args.task](cfg, tok)


if __name__ == "__main__":
    main()
