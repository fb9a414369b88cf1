"""The driver contracts, exercised the way the driver exercises them.

Round-1 post-mortem: ``dryrun_multichip`` passed when run via ``__main__``
(which pinned jax_platforms=cpu) but was RED when the driver imported the
module and called the function directly — the bare ``jax.devices()`` inside
initialized the remote-TPU backend.  These tests import-and-call in a fresh
subprocess with no special env, exactly like the driver.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_style():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "train step OK" in r.stdout, r.stdout
