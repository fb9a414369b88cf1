"""Parity of the one-pass Pallas shift (ops/wm_permute.py) vs the XLA
reverse+roll+partition wm_shift, incl. gradients and the fwd/inverse
round trip, across the stage geometries the model actually uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lavender_tpu.ops.swin_block_attn import (wm_partition, wm_shift)
from lavender_tpu.ops.wm_permute import (supports_pallas_shift,
                                         wm_shift_pallas)


def _mk(window, D, H, W, C, Npad, B=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    return wm_partition(x, window, Npad)


GEOMS = [
    # (window, D, H, W, C, Npad, shift) — bench Swin-B stage shapes
    # (scaled-down C) + a d-shift case + the no-tail-pad case
    ((3, 7, 7), 3, 56, 56, 128, 152, (0, 3, 3)),
    ((3, 7, 7), 3, 28, 28, 128, 152, (0, 3, 3)),
    ((3, 7, 7), 3, 14, 14, 128, 152, (0, 3, 3)),
    ((3, 7, 7), 3, 7, 7, 128, 152, (0, 3, 3)),
    ((2, 7, 7), 2, 14, 14, 128, 104, (1, 3, 3)),
    ((1, 12, 12), 1, 24, 24, 128, 144, (0, 6, 6)),  # Npad == N
]


@pytest.mark.parametrize("geom", GEOMS)
@pytest.mark.parametrize("inverse", [False, True])
def test_shift_parity(geom, inverse):
    window, D, H, W, C, Npad, shift = geom
    assert supports_pallas_shift(window, D, H, W, Npad)
    t = _mk(window, D, H, W, C, Npad)
    ref = wm_shift(t, window, D, H, W, shift, inverse=inverse)
    with pltpu.force_tpu_interpret_mode():
        got = wm_shift_pallas(t, window, D, H, W, shift, inverse=inverse)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_round_trip_and_pads():
    window, D, H, W, C, Npad, shift = GEOMS[0]
    t = _mk(window, D, H, W, C, Npad)
    # garbage in the pad rows must not leak into real rows, and the
    # output pads must be zero (XLA-path semantics)
    N = window[0] * window[1] * window[2]
    dirty = t.at[:, :, N:, :].set(1e9)
    with pltpu.force_tpu_interpret_mode():
        out = wm_shift_pallas(dirty, window, D, H, W, shift)
    ref = wm_shift(t, window, D, H, W, shift)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert np.all(np.asarray(out[:, :, N:, :]) == 0.0)
    with pltpu.force_tpu_interpret_mode():
        back = wm_shift_pallas(out, window, D, H, W, shift, inverse=True)
    np.testing.assert_array_equal(np.asarray(back[:, :, :N, :]),
                                  np.asarray(t[:, :, :N, :]))


@pytest.mark.parametrize("inverse", [False, True])
def test_shift_grad_parity(inverse):
    window, D, H, W, C, Npad, shift = GEOMS[2]
    t = _mk(window, D, H, W, C, Npad)
    w = _mk(window, D, H, W, C, Npad, seed=1)

    def loss_ref(t):
        return jnp.sum(wm_shift(t, window, D, H, W, shift,
                                inverse=inverse) * w)

    def loss_fast(t):
        return jnp.sum(wm_shift_pallas(t, window, D, H, W, shift,
                                       inverse=inverse) * w)

    g_ref = jax.grad(loss_ref)(t)
    with pltpu.force_tpu_interpret_mode():
        g_fast = jax.grad(loss_fast)(t)
    # the XLA path's vjp zeroes pad-row grads the same way
    np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_ref))
