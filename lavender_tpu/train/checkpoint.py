"""Checkpoint save/restore (Orbax) + PyTorch ``.pt`` import.

Reference behaviors covered:
* per-epoch model snapshots ``ckpt_violet_{task}_{ep}.pt`` + log.json
  (agent.py:164-182) -> Orbax checkpoints ``ckpt_{task}_{ep}``;
* args.json training-meta dump (agent.py:155-162);
* tolerant loading with shape-mismatch handling and emb truncate/pad
  (model.py:352-429) -> convert.merge_params;
* full train-state resume (optimizer state + step), which the reference only
  had in dead code (utils/load_save.py TrainingRestorer) — first-class here.
"""
from __future__ import annotations

import dataclasses
import json
import os
import os.path as op
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def _saver(ocp):
    """StandardCheckpointer for the rank-0-only save paths.

    Under ``jax.distributed`` the default checkpointer synchronizes ALL
    processes around every save (async-save barrier through the
    coordination service), but ``Agent.save_model``/``save_state`` gather
    params host-local and then save from the main process only
    (agent.py:164-182 semantics) — the other ranks never enter Orbax, so
    the default global barrier deadlocks (observed: rank 0 hung in the
    async-save shutdown barrier of the 2-process CLI smoke).  Scope the
    barriers to the calling process instead; single-process behavior is
    unchanged."""
    if jax.process_count() > 1:
        me = jax.process_index()
        return ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me}))
    return ocp.StandardCheckpointer()


def save_params(params, path: str):
    """Save a params pytree to an Orbax checkpoint directory."""
    ocp = _ocp()
    path = op.abspath(path)
    with _saver(ocp) as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, like: Optional[Any] = None):
    ocp = _ocp()
    path = op.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree_util.tree_map(np.asarray, like)
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def save_train_state(state, path: str):
    """Save params + optimizer state + step for true resume."""
    ocp = _ocp()
    payload = {"step": state.step, "params": state.params,
               "opt_state": state.opt_state, "rng": state.rng}
    with _saver(ocp) as ckptr:
        ckptr.save(op.abspath(path), payload, force=True)


def restore_train_state(path: str, like_state):
    ocp = _ocp()
    payload = {"step": like_state.step, "params": like_state.params,
               "opt_state": like_state.opt_state, "rng": like_state.rng}
    target = jax.tree_util.tree_map(np.asarray, payload)
    with ocp.StandardCheckpointer() as ckptr:
        # Tolerate an rng saved under a different PRNG impl (LVT_RBG flip
        # between save and resume): threefry key data is (2,) uint32, rbg
        # (4,) — restore with the STORED shape, then re-derive below.
        try:
            meta = ckptr.metadata(op.abspath(path))
            tree = getattr(meta, "item_metadata", meta)
            stored_shape = tuple(tree["rng"].shape)
        except Exception:
            stored_shape = tuple(target["rng"].shape)
        if stored_shape != tuple(target["rng"].shape):
            target = dict(target, rng=np.zeros(stored_shape, np.uint32))
        restored = ckptr.restore(op.abspath(path), target)
    rng = restored["rng"]
    if tuple(np.shape(rng)) != tuple(np.shape(like_state.rng)):
        # Cross-impl resume: the stored stream cannot continue bit-exactly
        # under the new impl; re-seed the new impl from the stored bits so
        # the resumed run is deterministic (just not stream-continuous).
        from lavender_tpu.train import trainer as _trainer
        from lavender_tpu.utils.logging import main_logger
        main_logger().warning(
            "train-state rng saved under a different PRNG impl (shape %s "
            "vs expected %s; LVT_RBG changed between save and resume) — "
            "re-seeding the %s dropout stream from the stored bits",
            tuple(np.shape(rng)), tuple(np.shape(like_state.rng)),
            _trainer.TRAIN_PRNG_IMPL)
        rng = _trainer.make_rng_data(int(np.asarray(rng).ravel()[-1]))
    return type(like_state)(
        step=restored["step"], params=restored["params"],
        opt_state=restored["opt_state"], rng=rng)


def save_training_meta(cfg, path_output: str):
    """args.json equivalent (agent.py:155-162)."""
    os.makedirs(path_output, exist_ok=True)

    def to_dict(obj):
        if dataclasses.is_dataclass(obj):
            return {f.name: to_dict(getattr(obj, f.name))
                    for f in dataclasses.fields(obj)}
        if isinstance(obj, (list, tuple)):
            return [to_dict(v) for v in obj]
        return obj

    with open(op.join(path_output, "args.json"), "w") as f:
        json.dump(to_dict(cfg), f, indent=2)


def save_log(log: Dict, path_output: str):
    with open(op.join(path_output, "log.json"), "w") as f:
        json.dump(log, f, indent=2)


def load_reference_checkpoint(pt_path: str, init_params,
                              max_size_frame: Optional[int] = None,
                              max_size_patch: Optional[int] = None):
    """Load a released LAVENDER ``.pt`` into our param tree.

    Combines convert (key rewrite) + merge (tolerant shapes), the equivalent
    of LAVENDER_Base.load_ckpt/__load_ckpt__ (model.py:352-429).
    """
    from lavender_tpu.convert import (
        convert_lavender_checkpoint, load_torch_checkpoint, match_scan_layout,
        merge_params, remap_swinbert_keys)
    sd = load_torch_checkpoint(pt_path)
    import os.path as _op
    if "swinbert" in _op.basename(pt_path).lower():
        sd = remap_swinbert_keys(sd)  # model.py:364-366 filename dispatch
    loaded = convert_lavender_checkpoint(
        sd, max_size_frame=max_size_frame, max_size_patch=max_size_patch)
    # scan_blocks default-on: restack per-block swin params to the init
    # tree's scan layout (merge_params would otherwise silently skip them)
    loaded = match_scan_layout(loaded, init_params)
    return merge_params(init_params, loaded)
