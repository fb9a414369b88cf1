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


def param_pspecs(params) -> Any:
    """PartitionSpec pytree for the model params under (data, model)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf) -> P:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path)
        for pat, spec in _PARAM_RULES:
            if pat.search(key):
                # scanned stages stack params with extra leading axes
                # (blocks_scan); pad the spec with leading Nones
                extra = getattr(leaf, "ndim", len(spec)) - len(spec)
                if extra > 0:
                    spec = P(*((None,) * extra + tuple(spec)))
                return spec
        return P()

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [spec_for(path, leaf) for path, leaf in flat])


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the rules."""
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_pspec() -> P:
    return P(DATA_AXIS)


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


# ---- multi-host helpers (utils/dist.py equivalents) ----

def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_obj(obj):
    """Gather picklable metrics across hosts (utils/dist.py:187-227 equiv).

    Single-process: returns [obj].  Multi-host: uses
    multihost_utils.process_allgather on arrays, or broadcast-of-bytes.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    return list(multihost_utils.process_allgather(obj))
