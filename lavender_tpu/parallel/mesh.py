"""Device mesh + sharding rules (TPU-native replacement for C1-C3).

The reference's distribution layer is NCCL DDP + DeepSpeed ZeRO-1
(utils/dist.py, utils/deepspeed.py, agent.py:252-265).  Here the equivalent
is one ``jax.sharding.Mesh`` with axes ``("data", "model")``:

* **data** — batch sharding (== DDP) plus optimizer-state sharding falls out
  of pjit automatically (== ZeRO-1);
* **model** — optional tensor parallelism over the fusion encoder / Swin
  channel dims for the Swin-Large-384 config (SURVEY.md §2.5).

Collectives are compiled by XLA from the shardings; there is no hand-written
communication layer.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. tp = model-axis size."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# (path regex, PartitionSpec) — first match wins.  Column-parallel layers
# (qkv / query / key / value / mlp-in) shard the output dim; row-parallel
# layers (attn proj / mlp-out) shard the input dim so XLA inserts a single
# all-reduce per block (Megatron layout).
_PARAM_RULES = (
    # fusion / text transformer
    (re.compile(r"(query|key|value)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"(query|key|value)/bias$"), P(MODEL_AXIS)),
    (re.compile(r"attention/output/dense/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r"intermediate_dense/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"intermediate_dense/bias$"), P(MODEL_AXIS)),
    (re.compile(r"(?<!attention/)output_dense/kernel$"), P(MODEL_AXIS, None)),
    # swin window attention / mlp
    (re.compile(r"attn/qkv/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"attn/qkv/bias$"), P(MODEL_AXIS)),
    (re.compile(r"attn/proj/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r"mlp/fc1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"mlp/fc1/bias$"), P(MODEL_AXIS)),
    (re.compile(r"mlp/fc2/kernel$"), P(MODEL_AXIS, None)),
    # big vocab matrices
    (re.compile(r"word_embeddings/embedding$"), P(MODEL_AXIS, None)),
    (re.compile(r"fc_mtm/decoder/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"fc_mtm/decoder/bias$"), P(MODEL_AXIS)),
)


def _path_key(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def _rule_spec(key: str, ndim: int) -> P:
    """TP spec for a param-path suffix (P() when no rule matches).

    Scanned stages stack params with extra leading axes (blocks_scan); the
    spec is padded with leading Nones to the leaf's ndim."""
    for pat, spec in _PARAM_RULES:
        if pat.search(key):
            extra = ndim - len(spec)
            if extra > 0:
                spec = P(*((None,) * extra + tuple(spec)))
            return spec
    return P()


def param_pspecs(params) -> Any:
    """PartitionSpec pytree for the model params under (data, model)."""
    flat, tree = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        tree,
        [_rule_spec(_path_key(path), getattr(leaf, "ndim", 0))
         for path, leaf in flat])


def opt_state_pspecs(opt_state, mesh: Mesh) -> Any:
    """ZeRO-1 PartitionSpecs for the optimizer state.

    The reference shards optimizer state across ranks via DeepSpeed ZeRO
    stage 1 (utils/deepspeed.py:42-44, engaged at agent.py:252-259).  The
    pjit equivalent: every AdamW moment leaf keeps its param's TP spec and
    is ADDITIONALLY sharded over the data axis along the first free
    (unsharded) dimension divisible by dp — each device then holds 1/dp of
    m/v and XLA gathers the per-shard updates on use.  Scalars (step
    counts) and leaves with no dp-divisible free axis stay replicated.
    """
    dp = mesh.shape[DATA_AXIS]
    flat, tree = jax.tree_util.tree_flatten_with_path(opt_state)
    specs = []
    for path, leaf in flat:
        shape = tuple(getattr(leaf, "shape", ()))
        ndim = len(shape)
        if ndim == 0:
            specs.append(P())
            continue
        spec = list(_rule_spec(_path_key(path), ndim)) + [None] * ndim
        spec = spec[:ndim]
        if dp > 1:
            for ax in range(ndim):
                if spec[ax] is None and shape[ax] % dp == 0 \
                        and shape[ax] >= dp:
                    spec[ax] = DATA_AXIS
                    break
        specs.append(P(*spec))
    return jax.tree_util.tree_unflatten(tree, specs)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the rules."""
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_pspec() -> P:
    return P(DATA_AXIS)


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a (process-local) batch on the mesh's data axis.

    Single process: plain ``device_put``.  Multi-process: each process
    holds its rank's slice of the global batch (the rank-aware DataLoader
    split), assembled into one global array with
    ``jax.make_array_from_process_local_data`` — the pjit-native
    equivalent of DDP's per-rank batches (agent.py:252-265)."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), batch)


def local_data_extent(mesh: Mesh) -> int:
    """Number of data-axis rows whose shards live on THIS process — the
    factor by which the per-device batch scales to a per-process loader
    batch."""
    n_local = sum(1 for d in mesh.devices.flat
                  if d.process_index == jax.process_index())
    tp = mesh.shape[MODEL_AXIS]
    return max(1, n_local // tp)


def maybe_make_mesh(tp: int = 1) -> Optional[Mesh]:
    """The CLI's mesh policy: a (data, model) mesh over all devices when
    there is anything to shard over, else None (single-device fast path —
    no with_sharding_constraint noise in the compiled program)."""
    if jax.device_count() == 1 and tp <= 1:
        return None
    return make_mesh(tp=tp)


# The run-wide mesh the CLI installs at startup (cli/main.py) so every
# Agent it constructs trains distributed without threading a mesh kwarg
# through all 17 task runners — the moral equivalent of the reference's
# global torch.distributed process group (utils/dist.py:20).
_GLOBAL_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Optional[Mesh]) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def global_mesh() -> Optional[Mesh]:
    return _GLOBAL_MESH


def tp_active() -> bool:
    """True when the installed global mesh has a model axis > 1 — used to
    gate the Pallas kernel paths: Mosaic custom calls carry no GSPMD
    partitioning rules, so a pallas_call consuming a model-sharded weight
    (e.g. ``attn/qkv/kernel`` = P(None, 'model')) forces GSPMD to
    all-gather the operand and compute the block fully replicated on
    every device — numerically correct (test_parallel asserts parity) but
    it erases TP's compute scaling.  Under tp>1 the auto paths use the
    XLA modules so GSPMD shards the dots Megatron-style per the param
    rules above."""
    m = global_mesh()
    return m is not None and m.shape[MODEL_AXIS] > 1


def global_dp() -> int:
    """Data-axis extent of the installed mesh (1 when none) — the group
    count for per-shard in-batch negative pools."""
    return _GLOBAL_MESH.shape[DATA_AXIS] if _GLOBAL_MESH is not None else 1


# ---- multi-host helpers (utils/dist.py equivalents) ----

def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host process-group init (the reference's dist_init,
    utils/dist.py:20-75, NCCL -> jax.distributed).

    Mirrors the reference's env detection: explicit args win, then
    OpenMPI's ``OMPI_COMM_WORLD_*`` (utils/dist.py:22-46), then the
    launcher-style ``WORLD_SIZE``/``RANK``/``MASTER_ADDR``/``MASTER_PORT``
    (:47-62), else single-process fallback (:63-68).  Returns True when a
    multi-process group was initialized.  Safe to call twice.
    """
    import os
    if jax.distributed.is_initialized():  # already up
        return jax.process_count() > 1
    env = os.environ
    if coordinator_address is None:
        if "OMPI_COMM_WORLD_SIZE" in env:
            num_processes = int(env["OMPI_COMM_WORLD_SIZE"])
            process_id = int(env["OMPI_COMM_WORLD_RANK"])
            coordinator_address = (f'{env.get("MASTER_ADDR", "127.0.0.1")}:'
                                   f'{env.get("MASTER_PORT", "29500")}')
        elif int(env.get("WORLD_SIZE", "1")) > 1:
            num_processes = int(env["WORLD_SIZE"])
            process_id = int(env["RANK"])
            coordinator_address = (f'{env.get("MASTER_ADDR", "127.0.0.1")}:'
                                   f'{env.get("MASTER_PORT", "29500")}')
        else:
            return False  # single process; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_obj(obj):
    """Gather an arbitrary picklable across hosts -> list, one entry per
    process (the reference's byte-tensor all_gather, utils/dist.py:187-227).

    Arrays of identical shape go through ``process_allgather`` directly;
    anything else is pickled, length-gathered, zero-padded to the max byte
    length, gathered, and unpickled — the exact size-pad protocol of the
    reference.  Single-process: returns ``[obj]``.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle
    from jax.experimental import multihost_utils
    buf = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([buf.size], np.int64))  # [P, 1]
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)  # [P, max_size]
    out = []
    for rank, size in enumerate(np.ravel(sizes).tolist()):
        out.append(pickle.loads(gathered[rank, :size].tobytes()))
    return out
