"""Unified multi-task finetuning: one model, per-step task dispatch.

Reference: main_multi_task_mlm.py (get_meta_dataloaders:18-75,
LAVENDER_Multi_Task.forward dispatch:82-103, Agent_Multi_Task:228-486) and
main_multi_task_multi_head.py (per-task fc_<task> heads:81-109).

TPU-first: each task has its own jitted step (a static dispatch table), and
the MetaLoader samples tasks from a shared seeded RNG — all hosts agree with
zero communication (see data/loader.py).
"""
from __future__ import annotations

from typing import Callable, Dict

from lavender_tpu.models.captioning import make_caption_loss_fn
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import qamc, qaoe, retmc, retrieval


def build_multi_task_losses(model: LavenderModel, true_id: int,
                            false_id: int, label_smoothing: float = 0.1,
                            pretexts: Dict[str, Callable] = None,
                            group: int = 1) -> Dict[str, Callable]:
    """Loss-fn table keyed by task kind (LAVENDER_Multi_Task.forward
    dispatch, main_multi_task_mlm.py:82-103).  ``pretexts`` maps kind ->
    pretext producer (add_prompt_or_task_token, :254-275); ``group`` =
    dp extent for per-shard retrieval negatives."""
    p = pretexts or {}
    return {
        "retrieval": retrieval.make_loss_fn(model, true_id, false_id,
                                            pretext=p.get("retrieval"),
                                            group=group),
        "qamc": qamc.make_loss_fn(model, pretext=p.get("qamc")),
        "qaoe": qaoe.make_loss_fn(model, pretext=p.get("qaoe")),
        "retmc": retmc.make_loss_fn(model, pretext=p.get("retmc")),
        "captioning": make_caption_loss_fn(model, label_smoothing,
                                           pretext=p.get("captioning")),
    }


def build_multi_task_evals(model: LavenderModel, true_id: int, false_id: int,
                           ans_tok_ids=None,
                           pretexts: Dict[str, Callable] = None
                           ) -> Dict[str, Callable]:
    p = pretexts or {}
    evals = {
        "retrieval": retrieval.make_eval_step(model, true_id, false_id,
                                              pretext=p.get("retrieval")),
        "qaoe": qaoe.make_eval_step(model, pretext=p.get("qaoe")),
        "retmc": retmc.make_eval_step(model, true_id, false_id,
                                      pretext=p.get("retmc")),
    }
    if ans_tok_ids is not None:
        evals["qamc"] = qamc.make_eval_step(model, ans_tok_ids,
                                            pretext=p.get("qamc"))
    return evals


def make_multi_task_train_steps(losses: Dict[str, Callable], tx,
                                mesh=None) -> Dict[str, Callable]:
    """One jitted train step per task (static shapes per task)."""
    from lavender_tpu.train.trainer import make_train_step
    return {name: make_train_step(fn, tx, mesh=mesh, donate=False)
            for name, fn in losses.items()}
