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
import zlib
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


def _build_model(cfg: RunConfig, tok, model_cls=None, txt_len=None, **kw):
    """Build + init the model.  ``txt_len`` should be the task's actual
    per-sample text length (e.g. ``datasets['val'][0]['txt'].shape[-1]``) so
    the init trace matches the step trace and each task compiles once
    (round-1 weak #6: QAMC/QAOE paid a full retrace at size_txt+3)."""
    import dataclasses
    from lavender_tpu.config import BertConfig
    bert = dataclasses.replace(cfg.model.bert, vocab_size=max(
        cfg.model.bert.vocab_size, len(tok)))
    mcfg = dataclasses.replace(cfg.model, bert=bert)
    model = (model_cls or LavenderModel)(
        mcfg, dtype=jnp.dtype(mcfg.dtype), **kw)
    S, T = cfg.data.size_img, cfg.data.size_frame
    L = txt_len if txt_len is not None else cfg.data.size_txt + 1
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


def _sample_txt_len(datasets) -> int:
    """Per-sample text length of a task's items (init-shape source)."""
    return int(datasets["val"][0]["txt"].shape[-1])


def _pretext(cfg: RunConfig, model, ds, task_name: str):
    """Build the pretext producer for a task (the reference's per-step
    prompt/task-token injection in go_dl, main_retrieval_mlm.py:127-136 /
    main_multi_task_mlm.py:254-275), or None when both flags are off."""
    from lavender_tpu.tasks import common
    prompt = ds.get_prompt() if cfg.model.enable_prompt else None
    return common.make_pretext_fn(model, cfg.model, task_name=task_name,
                                  prompt=prompt)


def _train_batch(cfg: RunConfig) -> int:
    """Per-process train loader batch: ``size_batch`` is per-DEVICE (the
    reference's per-GPU semantics, README.md:91) scaled by this process's
    share of the mesh's data axis."""
    from lavender_tpu.parallel import mesh as pmesh
    mesh = pmesh.global_mesh()
    if mesh is None:
        return cfg.train.size_batch
    return cfg.train.size_batch * pmesh.local_data_extent(mesh)


def _loaders(cfg: RunConfig, datasets):
    world = jax.process_count()
    rank = jax.process_index()
    mk = lambda ds, sh: DataLoader(
        ds, _train_batch(cfg) if sh else cfg.train.size_batch, shuffle=sh,
        num_workers=cfg.data.n_workers,
        seed=cfg.train.seed, rank=rank, world=world, drop_last=sh)
    return (mk(datasets["train"], True), mk(datasets["val"], False),
            mk(datasets["test"], False) if "test" in datasets else None)


@register("retrieval_mlm")
def run_retrieval_mlm(cfg: RunConfig, tok):
    from lavender_tpu.tasks import retrieval
    datasets = load_task_data(cfg.data, retrieval.RetrievalDataset, tok)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok,
                                    txt_len=_sample_txt_len(datasets))
    ds = datasets["val"]
    pre = _pretext(cfg, model, ds, "vtm")
    from lavender_tpu.parallel import mesh as pmesh
    agent = Agent(
        cfg, model, variables,
        loss_fn=retrieval.make_loss_fn(model, ds.true_token_id,
                                       ds.false_token_id, pretext=pre,
                                       group=pmesh.global_dp()),
        eval_step=_wrap_eval(retrieval.make_eval_step(
            model, ds.true_token_id, ds.false_token_id, pretext=pre),
            ["img", "txt", "mask", "vid"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("qamc_mlm")
def run_qamc_mlm(cfg: RunConfig, tok):
    from lavender_tpu.tasks import qamc
    datasets = load_task_data(cfg.data, qamc.QAMCDataset, tok)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok,
                                    txt_len=_sample_txt_len(datasets))
    ds = datasets["val"]
    pre = _pretext(cfg, model, ds, "mc")
    agent = Agent(
        cfg, model, variables, loss_fn=qamc.make_loss_fn(model, pretext=pre),
        eval_step=_wrap_eval(
            qamc.make_eval_step(model, ds.ans_tok_ids, pretext=pre),
            ["img", "txt", "mask", "mask_ans", "ans_idx"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("qaoe_mlm")
def run_qaoe_mlm(cfg: RunConfig, tok):
    from lavender_tpu.tasks import qaoe
    datasets = load_task_data(cfg.data, qaoe.QAOEDataset, tok)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok,
                                    txt_len=_sample_txt_len(datasets))
    pre = _pretext(cfg, model, datasets["val"], "oe")
    agent = Agent(
        cfg, model, variables, loss_fn=qaoe.make_loss_fn(model, pretext=pre),
        eval_step=_wrap_eval(qaoe.make_eval_step(model, pretext=pre),
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
    model, variables = _build_model(cfg, tok,
                                    txt_len=_sample_txt_len(datasets))
    ds = datasets["val"]
    pre = _pretext(cfg, model, ds, "vtm")  # lsmdc-mc uses the vtm token
    agent = Agent(
        cfg, model, variables,
        loss_fn=retmc.make_loss_fn(model, pretext=pre),
        eval_step=_wrap_eval(retmc.make_eval_step(
            model, ds.true_token_id, ds.false_token_id, pretext=pre),
            ["img", "txt", "mask", "mask_ans", "ans_idx"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("qamc_mlm_head")
def run_qamc_mlm_head(cfg: RunConfig, tok):
    """MC-QA scored per-option as VTM true/false at each option's appended
    [MASK] (main_qamc_mlm_head.py:12-121) — reuses the RetMC machinery via
    QAMCHeadDataset."""
    from lavender_tpu.tasks import retmc
    datasets = load_task_data(cfg.data, retmc.QAMCHeadDataset, tok)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok,
                                    txt_len=_sample_txt_len(datasets))
    ds = datasets["val"]
    pre = _pretext(cfg, model, ds, "vtm")
    agent = Agent(
        cfg, model, variables,
        loss_fn=retmc.make_loss_fn(model, pretext=pre),
        eval_step=_wrap_eval(retmc.make_eval_step(
            model, ds.true_token_id, ds.false_token_id, pretext=pre),
            ["img", "txt", "mask", "mask_ans", "ans_idx"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("qaoe_mlm_fib")
def run_qaoe_mlm_fib(cfg: RunConfig, tok):
    """LSMDC fill-in-blank: the [MASK] is embedded in the sentence; dataset
    answers index a label2ans vocab remapped to tokens
    (main_qaoe_mlm_lsmdc_fib.py).  Expects ``label2ans`` (list or dict) in
    the txt json or a sibling ``txt_{task}_label2ans.json``."""
    from lavender_tpu.tasks import qaoe
    la_path = op.join(cfg.data.data_dir,
                      f"txt_{cfg.data.task}_label2ans.json")
    label2ans = None
    if op.exists(la_path):
        with open(la_path) as f:
            label2ans = json.load(f)
    if isinstance(label2ans, dict):
        label2ans = {int(k): v for k, v in label2ans.items()}
    datasets = load_task_data(cfg.data, qaoe.QAOEFibDataset, tok,
                              label2ans=label2ans)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(cfg, tok,
                                    txt_len=_sample_txt_len(datasets))
    pre = _pretext(cfg, model, datasets["val"], "oe")
    agent = Agent(
        cfg, model, variables, loss_fn=qaoe.make_loss_fn(model, pretext=pre),
        eval_step=_wrap_eval(qaoe.make_eval_step(model, pretext=pre),
                             ["img", "txt", "mask", "mask_ans"]))
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
    model, variables = _build_model(cfg, tok,
                                    txt_len=_sample_txt_len(datasets))
    from lavender_tpu.tasks import common as task_common
    ds_vl = datasets["val"]
    # caption prompt text (main_caption.py:33-34)
    cap_prompt = (ds_vl.get_prompt("write a description about the video.")
                  if cfg.model.enable_prompt else None)
    pre = task_common.make_pretext_fn(model, cfg.model, task_name="cap",
                                      prompt=cap_prompt)

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
            model, label_smoothing=cfg.train.label_smoothing, pretext=pre),
        train_prep=train_prep)
    generate = cap.make_generate_fn(
        model, tok.cls_token_id, tok.sep_token_id, tok.pad_token_id,
        tok.mask_token_id, use_task_token=cfg.model.enable_task_token)

    def eval_captions(dl, predict_file=None):
        """Decode -> gather -> predictions TSV -> COCO metrics
        (Agent_Captioning.test + evaluate, main_caption.py:81-217)."""
        from lavender_tpu.parallel.mesh import all_gather_obj, is_main_process
        from lavender_tpu.utils.metrics import coco_caption_metrics
        cands, confs = {}, {}
        eval_p = agent.eval_params()
        prompt_ids = (jnp.asarray(cap_prompt[0], jnp.int32)
                      if cap_prompt is not None else None)
        for batch in dl:
            img = agent.batch_to_device(batch)["img"]
            ids, logp = generate({"params": eval_p}, img,
                                 jax.random.PRNGKey(0),
                                 prompt_txt=prompt_ids)
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
        # the reference evaluates the test split each epoch too
        # (main_caption.py:182-217, val_yaml AND test_yaml)
        metrics_ts = None
        if dl_ts is not None:
            metrics_ts = eval_captions(
                dl_ts, predict_file=op.join(
                    cfg.path_output, f"predictions_test_ep{e + 1}.tsv"))
            agent.log["metrics_ts"].append(metrics_ts)
        agent.save_model(e + 1)
        agent.logger.info(
            f"Ep {e + 1}: loss {ls:.4f} vl {metrics} ts {metrics_ts}")
    return dict(agent.log)


@register("pretrain_mlm")
def run_pretrain_mlm(cfg: RunConfig, tok):
    """Unified pretraining over shard-partitioned corpora
    (main_pretrain_mlm.py:235-328).  Expects per-dataset shard files
    ``{data_dir}/{dataset}_train_{part}.tsv`` + ``txt_{dataset}.json``
    (the reference's generic pattern, main_pretrain_task_specific.py:44-48).
    """
    import glob as globmod
    from lavender_tpu.tasks import common as task_common
    from lavender_tpu.tasks import pretrain as pt
    model, variables = _build_model(cfg, tok)
    # VTM prompt/task-token for the pretrain VTM pass
    # (main_pretrain_mlm.py:78-80,217-219)
    vtm_prompt = None
    if cfg.model.enable_prompt:
        from lavender_tpu.data.dataset import VideoTextDataset
        vtm_prompt = VideoTextDataset(cfg.data, tok).get_prompt(
            "is the video-text paired, true or false?")
    pre = task_common.make_pretext_fn(model, cfg.model, task_name="vtm",
                                      prompt=vtm_prompt)
    loss_fn = pt.make_loss_fn(
        model, tok.convert_tokens_to_ids(["true"])[0],
        tok.convert_tokens_to_ids(["false"])[0],
        vtm_batch=min(cfg.train.size_batch, 4), pretext=pre)
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
            dl = DataLoader(ds, _train_batch(cfg), shuffle=True,
                            num_workers=cfg.data.n_workers, drop_last=True,
                            seed=cfg.train.seed + e, rank=rank, world=world)
            ls = agent.train_epoch(e + 1, dl)
            agent.log[f"{ds_name}-p{part}"].append(ls)
            agent.save_model(e + 1)
            agent.logger.info(f"Ep {e + 1} part {part}: loss {ls:.4f}")
    return dict(agent.log)


def _run_eval_retrieval(cfg: RunConfig, tok, head: str):
    from lavender_tpu.tasks import eval_retrieval as er
    datasets = load_task_data(
        cfg.data, er.RetrievalEvalDataset, tok,
        multi_clip=cfg.multi_clip_testing)
    kw = {}
    if head == "ts":
        from lavender_tpu.tasks.task_specific import LavenderTS
        kw = {"model_cls": LavenderTS, "head_out": 1}
    model, variables = _build_model(
        cfg, tok, txt_len=_sample_txt_len(datasets), **kw)
    # feat-phase pretext injection (eval_retrieval_mlm.py:33-35): without
    # it a task-token/prompt-finetuned checkpoint evaluates wrong
    any_split = next(s for s in ("val", "test") if s in datasets)
    pre = _pretext(cfg, model, datasets[any_split], "vtm")
    results = {}
    for split in [s for s in ("val", "test") if s in datasets]:
        res = er.full_retrieval_eval(
            model, variables, datasets[split],
            batch_size=cfg.train.size_batch, head=head, pretext=pre,
            rerank_top_k=int(cfg.extra.get("rerank_top_k", 0)))
        results[split] = res
        LOGGER.info(f"{split}: {res}")
    if cfg.path_ckpt:
        out = op.splitext(cfg.path_ckpt)[0] + "_results.json"
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
    return results


@register("eval_retrieval")
def run_eval_retrieval(cfg: RunConfig, tok):
    """Two-phase full-corpus retrieval eval (eval_retrieval_mlm.py)."""
    return _run_eval_retrieval(cfg, tok, head="mlm")


@register("eval_retrieval_ts")
def run_eval_retrieval_ts(cfg: RunConfig, tok):
    """Scalar-head full-corpus retrieval eval
    (eval_retrieval_task_specific.py:133-244)."""
    return _run_eval_retrieval(cfg, tok, head="ts")


# task-token name per multi-task kind (add_prompt_or_task_token,
# main_multi_task_mlm.py:254-275; lsmdc-mc -> retmc -> "vtm")
_KIND2TASKTOK = {"retrieval": "vtm", "qamc": "mc", "qaoe": "oe",
                 "retmc": "vtm", "captioning": "cap"}


@register("multi_task_mlm")
def run_multi_task_mlm(cfg: RunConfig, tok):
    """Unified multi-task finetune (main_multi_task_mlm.py).

    Config carries ``multi_task_datasets``: list of {type, task, dataset,
    ratio} entries; each builds its loader and the MetaLoader samples a
    task per step from a shared seeded RNG.  Every ``iter_per_ep`` steps
    every task is evaluated (incl. caption CIDEr) and a snapshot saved;
    best epochs per task/metric are reported at the end
    (Agent_Multi_Task.run, main_multi_task_mlm.py:404-486).
    """
    from lavender_tpu.data.loader import MetaLoader
    from lavender_tpu.models import captioning as cap
    from lavender_tpu.tasks import common as task_common
    from lavender_tpu.tasks import multi_task, qamc, qaoe, retmc, retrieval
    from lavender_tpu.utils.metrics import coco_caption_metrics
    with open(cfg.extra["config_path"]) as f:
        raw = json.load(f)
    entries = raw.get("multi_task_datasets", [])
    model, variables = _build_model(cfg, tok)
    true_id = tok.convert_tokens_to_ids(["true"])[0]
    false_id = tok.convert_tokens_to_ids(["false"])[0]

    from lavender_tpu.parallel import mesh as pmesh
    pretexts = {
        kind: task_common.make_pretext_fn(model, cfg.model, task_name=tt)
        for kind, tt in _KIND2TASKTOK.items()}
    losses = multi_task.build_multi_task_losses(
        model, true_id, false_id, label_smoothing=cfg.train.label_smoothing,
        pretexts=pretexts, group=pmesh.global_dp())
    agent = Agent(cfg, model, variables,
                  loss_fn=losses["retrieval"])  # state/opt shared
    steps = multi_task.make_multi_task_train_steps(losses, agent.tx,
                                                   mesh=agent.mesh)
    ans_tok_ids = tok.convert_tokens_to_ids(
        [f"{i}" for i in range(cfg.data.size_option)])
    evals = multi_task.build_multi_task_evals(
        model, true_id, false_id, ans_tok_ids=ans_tok_ids,
        pretexts=pretexts)
    generate = cap.make_generate_fn(
        model, tok.cls_token_id, tok.sep_token_id, tok.pad_token_id,
        tok.mask_token_id, use_task_token=cfg.model.enable_task_token)

    ds_cls = {"retrieval": retrieval.RetrievalDataset,
              "qamc": qamc.QAMCDataset, "qaoe": qaoe.QAOEDataset,
              "retmc": retmc.RetMCDataset,
              "captioning": retrieval.RetrievalDataset}
    eval_keys = {
        "retrieval": ["img", "txt", "mask", "vid"],
        "qamc": ["img", "txt", "mask", "mask_ans", "ans_idx"],
        "qaoe": ["img", "txt", "mask", "mask_ans"],
        "retmc": ["img", "txt", "mask", "mask_ans", "ans_idx"],
    }
    world, rank = jax.process_count(), jax.process_index()
    loaders, kinds, ratios = {}, {}, {}
    val_loaders, test_loaders = {}, {}
    import dataclasses as dc
    for ent in entries:
        dcfg = dc.replace(cfg.data, dataset=ent["dataset"],
                          task=ent["task"])
        kind = ent["type"]
        kw = {"mlm": False} if kind == "captioning" else {}
        dss = load_task_data(dcfg, ds_cls[kind], tok, **kw)
        name = f'{kind}-{ent["dataset"]}'
        mk = lambda ds, sh: DataLoader(
            ds, _train_batch(cfg) if sh else cfg.train.size_batch,
            shuffle=sh,
            num_workers=cfg.data.n_workers, drop_last=sh,
            seed=cfg.train.seed, rank=rank, world=world)
        loaders[name] = mk(dss["train"], True)
        val_loaders[name] = mk(dss["val"], False)
        if "test" in dss:
            test_loaders[name] = mk(dss["test"], False)
        ratios[name] = int(ent.get("ratio", 1))
        kinds[name] = kind

    def _prep_batch(kind, batch):
        if kind == "captioning":
            masked, ans = cap.caption_masking(
                batch["txt"], tok.pad_token_id, tok.mask_token_id,
                p_mask=cfg.train.p_mask)
            batch = dict(batch)
            batch["txt"], batch["ans_mtm"] = masked, ans
        batch = {k: v for k, v in batch.items() if k != "vid" or
                 kind == "retrieval"}
        if kind == "retrieval":
            batch["vid"] = np.asarray(
                [_stable_vid(v) for v in batch["vid"]], np.int32)
        return batch

    def evaluate_task(name, dl):
        """Per-task eval -> metric dict (Agent_Multi_Task.evaluate)."""
        kind = kinds[name]
        eval_p = agent.eval_params()
        if kind == "captioning":
            cands, refs = {}, {}
            for batch in dl:
                img = agent.batch_to_device(batch)["img"]
                ids, _ = generate({"params": eval_p}, img,
                                  jax.random.PRNGKey(0))
                for key, row in zip(batch["vid"], np.asarray(ids)):
                    cands[str(key)] = tok.decode(row.tolist())
            for item in dl.dataset.txt:
                refs.setdefault(str(item["video"]), []).append(
                    item["caption"] if isinstance(item["caption"], str)
                    else " ".join(item["caption"]))
            cands = {k: v for k, v in cands.items() if k in refs}
            if not cands:
                return {"CIDEr": 0.0}
            return coco_caption_metrics(cands, {k: refs[k] for k in cands})
        accs = []
        step_fn = evals[kind]
        for batch in dl:
            batch = _prep_batch(kind, batch)
            db = agent.eval_batch(batch)
            out = step_fn({"params": eval_p},
                          *[db[k] for k in eval_keys[kind]])
            ac = out[0] if kind == "qaoe" else out[-1]
            accs.extend(np.asarray(ac, np.float64).ravel().tolist())
        from lavender_tpu.parallel.mesh import all_gather_obj
        gathered = []
        for per_host in all_gather_obj(np.asarray(accs, np.float64)):
            gathered.extend(np.ravel(per_host).tolist())
        key = "ac_1" if kind == "qaoe" else "ac"
        return {key: float(np.mean(gathered)) if gathered else 0.0}

    def eval_all(ep):
        for split, dls in (("vl", val_loaders), ("ts", test_loaders)):
            for name, dl in dls.items():
                res = evaluate_task(name, dl)
                for k, v in res.items():
                    agent.log[f"{name}_{split}_{k}"].append(v)
                agent.logger.info(f"Ep {ep} {name} {split}: {res}")

    ml = MetaLoader(loaders, ratios=ratios, seed=cfg.train.seed)
    max_steps = int(raw.get("max_steps", 100))
    iter_per_ep = int(raw.get("iter_per_ep", max_steps))
    agent.save_training_meta()
    ep = 1
    for step_i, (name, batch) in enumerate(iter(ml)):
        if step_i >= max_steps:
            break
        kind = kinds[name]
        batch = _prep_batch(kind, batch)
        db = agent.batch_to_device(batch)
        if agent.mesh is not None:
            db = pmesh.shard_batch(db, agent.mesh)
        agent.state, loss = steps[kind](agent.state, db)
        if step_i % 20 == 0:
            agent.logger.info(f"step {step_i} [{name}] loss {float(loss):.4f}")
        if step_i and step_i % iter_per_ep == 0:
            ep = step_i // iter_per_ep
            eval_all(ep)
            agent.save_model(ep)
    eval_all(ep + 1)
    agent.save_model(ep + 1)

    # best epochs per task (Agent_Multi_Task.best_epoch :481-486)
    best = {}
    for name in val_loaders:
        metric = "CIDEr" if kinds[name] == "captioning" else (
            "ac_1" if kinds[name] == "qaoe" else "ac")
        hist = agent.log.get(f"{name}_vl_{metric}", [])
        if hist:
            i = int(np.argmax(hist))
            best[name] = (i, hist[i])
            agent.logger.info(
                f"Best {metric} on {name} val @ ep {i + 1}, "
                f"{hist[i] * 100:.2f}")
    out = dict(agent.log)
    out["best"] = best
    out["steps"] = max_steps
    return out


@register("multi_task_multi_head")
def run_multi_task_multi_head(cfg: RunConfig, tok):
    """Multi-task baseline with per-task heads (main_multi_task_multi_head.py):
    shared scalar ``fc`` + NormSoftmax for retrieval, per-dataset
    ``fc_<name>`` classifier heads for qamc/qaoe, MLM head for captioning.

    Entry options: {type, task, dataset, ratio, size_option|size_vocab}.
    """
    from lavender_tpu.data.loader import MetaLoader
    from lavender_tpu.models import captioning as cap
    from lavender_tpu.tasks import qamc, qaoe, retrieval
    from lavender_tpu.tasks import task_specific as ts
    from lavender_tpu.utils.metrics import coco_caption_metrics
    with open(cfg.extra["config_path"]) as f:
        raw = json.load(f)
    entries = raw.get("multi_task_datasets", [])
    names = [f'{e["type"]}-{e["dataset"]}' for e in entries]
    kinds = {n: e["type"] for n, e in zip(names, entries)}
    heads = tuple(
        (n, int(e.get("size_option", cfg.data.size_option))
         if e["type"] == "qamc" else int(e.get("size_vocab", 1000)))
        for n, e in zip(names, entries) if e["type"] in ("qamc", "qaoe"))
    model, variables = _build_model(
        cfg, tok, model_cls=ts.LavenderMultiHead,
        txt_len=cfg.data.size_txt, head_out=1, heads=heads)
    from lavender_tpu.parallel import mesh as pmesh
    losses = ts.make_multi_head_losses(
        model, cfg.train.temp, kinds,
        label_smoothing=cfg.train.label_smoothing,
        group=pmesh.global_dp())
    agent = Agent(cfg, model, variables, loss_fn=losses[names[0]])
    from lavender_tpu.tasks.multi_task import make_multi_task_train_steps
    steps = make_multi_task_train_steps(losses, agent.tx, mesh=agent.mesh)
    generate = cap.make_generate_fn(
        model, tok.cls_token_id, tok.sep_token_id, tok.pad_token_id,
        tok.mask_token_id)

    ds_cls = {"retrieval": retrieval.RetrievalDataset,
              "qamc": qamc.QAMCDataset, "qaoe": qaoe.QAOEDataset,
              "captioning": retrieval.RetrievalDataset}
    world, rank = jax.process_count(), jax.process_index()
    loaders, val_loaders, ratios = {}, {}, {}
    import dataclasses as dc
    for name, ent in zip(names, entries):
        dcfg = dc.replace(cfg.data, dataset=ent["dataset"], task=ent["task"])
        dss = load_task_data(dcfg, ds_cls[ent["type"]], tok, mlm=False)
        mk = lambda ds, sh: DataLoader(
            ds, _train_batch(cfg) if sh else cfg.train.size_batch,
            shuffle=sh,
            num_workers=cfg.data.n_workers, drop_last=sh,
            seed=cfg.train.seed, rank=rank, world=world)
        loaders[name] = mk(dss["train"], True)
        val_loaders[name] = mk(dss["val"], False)
        ratios[name] = int(ent.get("ratio", 1))

    evals = {}
    for name in names:
        if kinds[name] == "retrieval":
            evals[name] = (_wrap_eval(ts.make_retrieval_ts_eval(model),
                                      ["img", "txt", "mask", "vid"]))
        elif kinds[name] in ("qamc", "qaoe"):
            evals[name] = _wrap_eval(ts.make_head_cls_eval(model, name),
                                     ["img", "txt", "mask", "ans"])

    def _prep(kind, batch):
        if kind == "captioning":
            masked, ans = cap.caption_masking(
                batch["txt"], tok.pad_token_id, tok.mask_token_id,
                p_mask=cfg.train.p_mask)
            batch = dict(batch)
            batch["txt"], batch["ans_mtm"] = masked, ans
        batch = {k: v for k, v in batch.items()
                 if k != "vid" or kind == "retrieval"}
        if kind == "retrieval":
            batch["vid"] = np.asarray(
                [_stable_vid(v) for v in batch["vid"]], np.int32)
        return batch

    def eval_all(ep):
        eval_p = agent.eval_params()
        for name, dl in val_loaders.items():
            kind = kinds[name]
            if kind == "captioning":
                cands, refs = {}, {}
                for batch in dl:
                    img = agent.batch_to_device(batch)["img"]
                    ids, _ = generate({"params": eval_p}, img,
                                      jax.random.PRNGKey(0))
                    for key, row in zip(batch["vid"], np.asarray(ids)):
                        cands[str(key)] = tok.decode(row.tolist())
                for item in dl.dataset.txt:
                    refs.setdefault(str(item["video"]), []).append(
                        item["caption"] if isinstance(item["caption"], str)
                        else " ".join(item["caption"]))
                cands = {k: v for k, v in cands.items() if k in refs}
                res = (coco_caption_metrics(
                    cands, {k: refs[k] for k in cands}) if cands
                    else {"CIDEr": 0.0})
            else:
                accs = []
                for batch in dl:
                    db = agent.eval_batch(_prep(kind, batch))
                    out = evals[name]({"params": eval_p}, db)
                    ac = out[-1] if isinstance(out, tuple) else out
                    accs.extend(np.asarray(ac, np.float64).ravel().tolist())
                res = {"ac": float(np.mean(accs)) if accs else 0.0}
            for k, v in res.items():
                agent.log[f"{name}_vl_{k}"].append(v)
            agent.logger.info(f"Ep {ep} {name} vl: {res}")

    ml = MetaLoader(loaders, ratios=ratios, seed=cfg.train.seed)
    max_steps = int(raw.get("max_steps", 100))
    iter_per_ep = int(raw.get("iter_per_ep", max_steps))
    agent.save_training_meta()
    ep = 0
    for step_i, (name, batch) in enumerate(iter(ml)):
        if step_i >= max_steps:
            break
        db = agent.batch_to_device(_prep(kinds[name], batch))
        if agent.mesh is not None:
            db = pmesh.shard_batch(db, agent.mesh)
        agent.state, loss = steps[name](agent.state, db)
        if step_i % 20 == 0:
            agent.logger.info(f"step {step_i} [{name}] loss {float(loss):.4f}")
        if step_i and step_i % iter_per_ep == 0:
            ep = step_i // iter_per_ep
            eval_all(ep)
            agent.save_model(ep)
    eval_all(ep + 1)
    agent.save_model(ep + 1)
    return dict(agent.log)


@register("retrieval_ts")
def run_retrieval_ts(cfg: RunConfig, tok):
    """Scalar-head retrieval baseline + NormSoftmax InfoNCE
    (main_retrieval_task_specific.py)."""
    from lavender_tpu.tasks import retrieval
    from lavender_tpu.tasks import task_specific as ts
    datasets = load_task_data(cfg.data, retrieval.RetrievalDataset, tok,
                              mlm=False)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(
        cfg, tok, model_cls=ts.LavenderTS,
        txt_len=_sample_txt_len(datasets), head_out=1)
    variables = _maybe_reinit_head(cfg, variables, 1)
    from lavender_tpu.parallel import mesh as pmesh
    agent = Agent(
        cfg, model, variables,
        loss_fn=ts.make_retrieval_ts_loss(model, cfg.train.temp,
                                          group=pmesh.global_dp()),
        eval_step=_wrap_eval(ts.make_retrieval_ts_eval(model),
                             ["img", "txt", "mask", "vid"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("qamc_ts")
def run_qamc_ts(cfg: RunConfig, tok):
    """size_option classifier-head MC-QA (main_qamc_task_specific.py)."""
    from lavender_tpu.tasks import qamc
    from lavender_tpu.tasks import task_specific as ts
    datasets = load_task_data(cfg.data, qamc.QAMCDataset, tok, mlm=False)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(
        cfg, tok, model_cls=ts.LavenderTS,
        txt_len=_sample_txt_len(datasets), head_out=cfg.data.size_option)
    variables = _maybe_reinit_head(cfg, variables, cfg.data.size_option)
    agent = Agent(
        cfg, model, variables, loss_fn=ts.make_cls_loss(model),
        eval_step=_wrap_eval(ts.make_cls_eval(model),
                             ["img", "txt", "mask", "ans"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("qaoe_ts")
def run_qaoe_ts(cfg: RunConfig, tok):
    """size_vocab classifier-head OE-QA (main_qaoe_task_specific.py)."""
    from lavender_tpu.tasks import qaoe
    from lavender_tpu.tasks import task_specific as ts
    assert cfg.data.size_vocab > 0, "qaoe_ts needs size_vocab"
    datasets = load_task_data(cfg.data, qaoe.QAOEDataset, tok, mlm=False)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(
        cfg, tok, model_cls=ts.LavenderTS,
        txt_len=_sample_txt_len(datasets), head_out=cfg.data.size_vocab)
    variables = _maybe_reinit_head(cfg, variables, cfg.data.size_vocab)
    agent = Agent(
        cfg, model, variables, loss_fn=ts.make_cls_loss(model),
        eval_step=_wrap_eval(ts.make_cls_eval(model),
                             ["img", "txt", "mask", "ans"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("retmc_ts")
def run_retmc_ts(cfg: RunConfig, tok):
    """Scalar-head LSMDC-MC baseline (main_retmc_task_specific.py)."""
    from lavender_tpu.tasks import retmc
    from lavender_tpu.tasks import task_specific as ts
    datasets = load_task_data(cfg.data, retmc.RetMCDataset, tok, mlm=False)
    dl_tr, dl_vl, dl_ts = _loaders(cfg, datasets)
    cfg.train.max_iter = max(1, len(dl_tr) * cfg.train.size_epoch)
    model, variables = _build_model(
        cfg, tok, model_cls=ts.LavenderTS,
        txt_len=_sample_txt_len(datasets), head_out=1)
    variables = _maybe_reinit_head(cfg, variables, 1)
    agent = Agent(
        cfg, model, variables, loss_fn=ts.make_retmc_ts_loss(model),
        eval_step=_wrap_eval(ts.make_retmc_ts_eval(model),
                             ["img", "txt", "mask", "ans"]))
    return run_finetune(agent, dl_tr, dl_vl, dl_ts, cfg.train.size_epoch,
                        zero_shot=bool(cfg.path_ckpt))


@register("pretrain_ts")
def run_pretrain_ts(cfg: RunConfig, tok):
    """Baseline pretraining: MLM + binary scalar-VTM head over shard parts
    (main_pretrain_task_specific.py)."""
    import glob as globmod
    from lavender_tpu.tasks import pretrain as pt
    from lavender_tpu.tasks import task_specific as ts
    model, variables = _build_model(cfg, tok, model_cls=ts.LavenderTS,
                                    txt_len=cfg.data.size_txt, head_out=1)
    loss_fn = ts.make_pretrain_ts_loss(
        model, temp=cfg.train.temp, vtm_batch=min(cfg.train.size_batch, 4))
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
        for part, tsv_path in enumerate(parts):
            ds = pt.PretrainDataset(
                cfg.data, tok, "train", tsv_path,
                txt_data.get("train", txt_data), dataset_name=ds_name,
                mlm=False)
            dl = DataLoader(ds, _train_batch(cfg), shuffle=True,
                            num_workers=cfg.data.n_workers, drop_last=True,
                            seed=cfg.train.seed + e, rank=rank, world=world)
            ls = agent.train_epoch(e + 1, dl)
            agent.log[f"{ds_name}-p{part}"].append(ls)
            agent.save_model(e + 1)
            agent.logger.info(f"Ep {e + 1} part {part}: loss {ls:.4f}")
    return dict(agent.log)


def _stable_vid(v) -> int:
    """Process/host-stable int id for a video key.  ``hash(str)`` is salted
    per process (PYTHONHASHSEED), so it is only valid within one process;
    crc32 keeps vid identity stable for any future cross-host pair
    construction (round-2 weak #6)."""
    if isinstance(v, str):
        return zlib.crc32(v.encode("utf-8")) % (2 ** 31)
    return int(v)


def _maybe_reinit_head(cfg: RunConfig, variables, head_out: int):
    """``args.reinit_head`` equivalent (utils/args.py:71): re-randomize the
    task head after a checkpoint load, as every *_task_specific main does
    (e.g. main_qaoe_task_specific.py:169-170)."""
    if not (cfg.extra.get("reinit_head") and cfg.path_ckpt):
        return variables
    from lavender_tpu.tasks import task_specific as ts
    params = ts.reinit_head(dict(variables["params"]),
                            cfg.model.hidden_size, head_out,
                            seed=cfg.train.seed)
    LOGGER.info("reinit_head: task head re-randomized")
    # pass non-params collections through (e.g. a serving bias 'cache')
    return {**variables, "params": params}


def _wrap_eval(step, keys):
    """Adapt a positional eval step to (variables, batch) and, under a
    mesh, commit its batch args to the data axis via make_eval_forward so
    per-epoch evals run DataParallel over the whole mesh (round-3 weak #5;
    reference parity: eval_retrieval_mlm.py:133)."""
    from lavender_tpu.parallel import mesh as pmesh
    from lavender_tpu.train import trainer
    mesh = pmesh.global_mesh()
    fwd = trainer.make_eval_forward(step, mesh=mesh) if mesh is not None \
        else step

    def eval_step(variables, batch):
        return fwd(variables, *[batch[k] for k in keys])
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

    with open(args.config) as f:
        _raw = json.load(f)
    if args.path_ckpt:
        # set before load so ckpt-args inheritance (config.inherit_ckpt_args)
        # sees the checkpoint directory (utils/args.py:245-293)
        _raw["path_ckpt"] = args.path_ckpt
    cfg = load_run_config(_raw)
    cfg.extra["config_path"] = args.config
    if "size_test" in _raw:
        cfg.extra["size_test"] = _raw["size_test"]
    if "rerank_top_k" in _raw:
        cfg.extra["rerank_top_k"] = _raw["rerank_top_k"]
    if "reinit_head" in _raw:
        cfg.extra["reinit_head"] = bool(_raw["reinit_head"])
    if args.path_ckpt:
        cfg.path_ckpt = args.path_ckpt
    if args.path_output:
        cfg.path_output = args.path_output
    if args.vocab:
        cfg.data.vocab_path = args.vocab
    cfg.path_output = "%s/_%s_%s" % (
        cfg.path_output, cfg.data.task or args.task,
        datetime.now().strftime("%Y%m%d%H%M%S"))

    # distribution: process-group init + run-wide device mesh.  The
    # reference runs EVERY main under DDP (utils/dist.py:20-75,
    # agent.py:252-265); here the equivalent is jax.distributed + one
    # (data, model) mesh that every Agent picks up (round-2 missing #1).
    from lavender_tpu.parallel import mesh as pmesh
    pmesh.distributed_init()
    mesh = pmesh.maybe_make_mesh(tp=cfg.tp)
    pmesh.set_global_mesh(mesh)
    if mesh is not None:
        LOGGER.info(
            f"mesh: {jax.device_count()} devices "
            f"(dp={mesh.shape['data']}, tp={mesh.shape['model']}, "
            f"{jax.process_count()} processes)")

    tok = BertTokenizer(cfg.data.vocab_path)
    try:
        return TASKS[args.task](cfg, tok)
    finally:
        pmesh.set_global_mesh(None)


if __name__ == "__main__":
    main()
