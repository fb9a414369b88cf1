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
