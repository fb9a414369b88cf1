"""Flash window-attention core (ops/swin_core_attn.py): Pallas fwd+bwd
vs the pure-JAX oracle, and the wm block vjps routed through it
(LVT_COREBWD) vs the XLA-recompute backward.  CPU interpret mode."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lavender_tpu.ops import swin_core_attn as core
from lavender_tpu.ops import swin_block_attn as sba


def _mk(B=2, nW=4, N=12, Npad=16, C=16, nH=2, seed=0):
    g = np.random.RandomState(seed)
    qkv = jnp.asarray(g.randn(B, nW, Npad, 3 * C).astype(np.float32))
    bias = jnp.asarray(g.randn(nH, Npad, Npad).astype(np.float32) * 0.3)
    bias = bias.at[:, :, N:].set(-100.0)  # pad keys dead, like the wm prep
    mask = jnp.asarray((g.rand(nW, N, N) > 0.8) * -100.0, jnp.float32)
    scale = (C // nH) ** -0.5
    return qkv, bias, mask, scale, nH, N, Npad


@pytest.mark.parametrize("use_mask", [False, True])
def test_core_forward_parity(use_mask):
    qkv, bias, mask, scale, nH, N, Npad = _mk()
    m = mask if use_mask else None
    want = core._core_ref(qkv, bias, m, nH, scale)
    with pltpu.force_tpu_interpret_mode():
        got = core._core_fwd_call(qkv, bias, m, nH, scale)
    np.testing.assert_allclose(np.asarray(got[:, :, :N]),
                               np.asarray(want[:, :, :N]),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("use_mask", [False, True])
def test_core_grad_parity(use_mask):
    """Pallas backward == jax.grad of the oracle for qkv AND bias,
    valid rows only (pad-row cotangents are zero by construction)."""
    qkv, bias, mask, scale, nH, N, Npad = _mk(seed=1)
    m = mask if use_mask else jnp.zeros((1, Npad, Npad), jnp.float32)
    mm = mask if use_mask else None

    def f_ref(qkv, bias):
        o = core._core_ref(qkv, bias, mm, nH, scale)
        return jnp.sum(o[:, :, :N] ** 2)

    def f_ker(qkv, bias):
        o = core.swin_core_attn(qkv, bias, m, use_mask, nH, scale)
        return jnp.sum(o[:, :, :N] ** 2)

    go = jax.grad(f_ref, argnums=(0, 1))(qkv, bias)
    with pltpu.force_tpu_interpret_mode():
        gn = jax.grad(f_ker, argnums=(0, 1))(qkv, bias)
    # qkv grads on valid rows
    np.testing.assert_allclose(np.asarray(gn[0][:, :, :N]),
                               np.asarray(go[0][:, :, :N]),
                               atol=3e-4, rtol=3e-3)
    # bias grad on the live [N, N] region (pad region is denormal-zero
    # in the kernel vs exact zero in the oracle)
    np.testing.assert_allclose(np.asarray(gn[1][:, :N, :N]),
                               np.asarray(go[1][:, :N, :N]),
                               atol=3e-4, rtol=3e-3)
    assert float(jnp.max(jnp.abs(gn[1][:, :, N:]))) < 1e-6


@pytest.mark.parametrize("use_mask", [False, True])
def test_wm_ref_core_matches_native(use_mask):
    """_wm_ref_core (flash-core recompute) == _wm_ref_native, values and
    gradients, through the full block composition."""
    g = np.random.RandomState(2)
    B, nW, C, nH = 2, 4, 16, 2
    window = (2, 2, 3)
    N, Npad = 12, 16
    spatial = (2, 4, 6)
    x = jnp.asarray(g.randn(B, nW, Npad, C).astype(np.float32))
    x = x.at[:, :, N:].set(0.0)
    ln_s = 1.0 + 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    ln_b = 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    wqkv = jnp.asarray(g.randn(C, 3 * C).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(g.randn(3 * C).astype(np.float32) * 0.1)
    wproj = jnp.asarray(g.randn(C, C).astype(np.float32) * 0.1)
    bproj = jnp.asarray(g.randn(C).astype(np.float32) * 0.1)
    bias = jnp.asarray(g.randn(nH, Npad, Npad).astype(np.float32) * 0.1)
    bias = bias.at[:, :, N:].set(-100.0)
    mask = jnp.asarray((g.rand(nW, N, N) > 0.85) * -100.0, jnp.float32)
    m = mask if use_mask else None
    scale = (C // nH) ** -0.5

    def f_nat(x, wqkv, wproj, bias):
        y = sba._wm_ref_native(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                               bias, m, spatial, window, nH, scale, 1e-5)
        return jnp.sum(y[:, :, :N] ** 2)

    def f_core(x, wqkv, wproj, bias):
        y = sba._wm_ref_core(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                             bias, m, spatial, window, nH, scale, 1e-5)
        return jnp.sum(y[:, :, :N] ** 2)

    with pltpu.force_tpu_interpret_mode():
        np.testing.assert_allclose(float(f_core(x, wqkv, wproj, bias)),
                                   float(f_nat(x, wqkv, wproj, bias)),
                                   rtol=1e-5)
        gn = jax.grad(f_core, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
    go = jax.grad(f_nat, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
    for a, b in zip(gn, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=3e-3)


def test_block_vjp_through_core(monkeypatch):
    """fused_swin_block_wm + wm_full gradients with LVT_COREBWD routing ==
    the XLA-recompute backward (same custom_vjp, different recompute)."""
    g = np.random.RandomState(3)
    B, nW, C, nH = 2, 4, 16, 2
    window = (2, 2, 3)
    N, Npad = 12, 16
    spatial = (2, 4, 6)
    x = jnp.asarray(g.randn(B, nW, Npad, C).astype(np.float32))
    x = x.at[:, :, N:].set(0.0)
    ln_s = 1.0 + 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    ln_b = 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    wqkv = jnp.asarray(g.randn(C, 3 * C).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(g.randn(3 * C).astype(np.float32) * 0.1)
    wproj = jnp.asarray(g.randn(C, C).astype(np.float32) * 0.1)
    bproj = jnp.asarray(g.randn(C).astype(np.float32) * 0.1)
    bias = jnp.asarray(g.randn(nH, Npad, Npad).astype(np.float32) * 0.1)
    bias = bias.at[:, :, N:].set(-100.0)
    mask = jnp.asarray((g.rand(nW, N, N) > 0.85) * -100.0, jnp.float32)
    scale = (C // nH) ** -0.5

    def loss(x, wqkv, bias, core_on):
        monkeypatch.setattr(sba, "_COREBWD", core_on)
        y = sba.fused_swin_block_wm(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                    bproj, bias, mask, spatial, window,
                                    nH, scale, 1e-5)
        return jnp.sum(y[:, :, :N] ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_off = jax.grad(loss, argnums=(0, 1, 2))(x, wqkv, bias, False)
        g_on = jax.grad(loss, argnums=(0, 1, 2))(x, wqkv, bias, True)
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=3e-3)
