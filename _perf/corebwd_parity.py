"""On-device (TPU) gradient parity for the LVT_COREBWD flash backward.

ADVICE round 3: the core backward kernel (ops/swin_core_attn.py) was
parity-tested only under the CPU interpreter; Mosaic-specific lowering
hazards (revisited-output dbias accumulation, VMEM scheduling) were
unexercised.  This script runs the REAL kernels at flagship stage-3
geometry and compares every gradient of the wm block against the XLA
recompute path (_wm_ref_native) that round 3 trained with.

Prints per-leaf relative errors and PASS/FAIL (rel L2 < 5e-2 for bf16).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/lavender_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from lavender_tpu.ops import swin_block_attn as sba


def main():
    # flagship Swin-B stage 3 on the wm layout: window (5,7,7) -> N=245,
    # Npad=248; C=512, nH=16; 4 spatial windows, shifted (masked) variant
    B, nW, Npad, C, nH = 4, 4, 248, 512, 16
    window = (5, 7, 7)
    spatial = (5, 14, 14)
    N = int(np.prod(window))
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)

    x = jnp.asarray(rs.randn(B, nW, Npad, C) * 0.5, dt)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(C), dt)
    ln_b = jnp.asarray(0.1 * rs.randn(C), dt)
    wqkv = jnp.asarray(rs.randn(C, 3 * C) / np.sqrt(C), dt)
    bqkv = jnp.asarray(0.02 * rs.randn(3 * C), dt)
    wproj = jnp.asarray(rs.randn(C, C) / np.sqrt(C), dt)
    bproj = jnp.asarray(0.02 * rs.randn(C), dt)
    bias = 2.0 * rs.randn(nH, Npad, Npad).astype(np.float32)
    bias[:, :, N:] = -100.0  # the wm pad-key bake-in (precondition)
    bias = jnp.asarray(bias, dt)
    # shifted-window additive mask: random {0, -100} region pattern
    m = np.where(rs.rand(nW, N, N) < 0.2, -100.0, 0.0).astype(np.float32)
    mask = jnp.asarray(m, dt)
    scale = (C // nH) ** -0.5
    args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, mask)
    g = jnp.asarray(rs.randn(B, nW, Npad, C), dt)

    def run(ref):
        def f(*a):
            return ref(*a, spatial, window, nH, scale, 1e-5)
        out, vjp = jax.vjp(f, *args)
        return out, vjp(g)

    out_core, g_core = jax.jit(lambda: run(sba._wm_ref_core))()
    out_nat, g_nat = jax.jit(lambda: run(sba._wm_ref_native))()

    names = ["x", "ln_scale", "ln_bias", "wqkv", "bqkv", "wproj", "bproj",
             "bias", "mask"]
    ok = True
    fo = np.asarray(out_core, np.float32)
    fn = np.asarray(out_nat, np.float32)
    rel = np.linalg.norm(fo - fn) / max(np.linalg.norm(fn), 1e-9)
    print(f"forward rel L2: {rel:.3e}")
    ok &= rel < 5e-2
    for name, a, b in zip(names, g_core, g_nat):
        if name == "mask":
            # zero-cotangent contract: core returns exact zeros
            z = float(jnp.abs(a).max())
            print(f"d{name}: core max|.| = {z:.1e} (contract: 0)")
            continue
        fa = np.asarray(a, np.float32)
        fb = np.asarray(b, np.float32)
        nb = np.linalg.norm(fb)
        rel = np.linalg.norm(fa - fb) / max(nb, 1e-9)
        print(f"d{name}: rel L2 {rel:.3e}  (|ref| {nb:.3e})")
        ok &= rel < 5e-2
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
