"""Whole-block fused Swin attention kernel vs oracles (CPU interpret mode).

Three layers of checking:
1. the pure-JAX reference of the fused op == the existing module math
   (attn_impl="fused" backbone output == attn_impl="xla" backbone output);
2. the Pallas kernel (interpret mode) == the pure-JAX reference, shifted and
   non-shifted, including the 7->8 pad masking;
3. gradients flow through the custom_vjp (backward = reference recompute).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lavender_tpu.config import SwinConfig
from lavender_tpu.models.swin3d import VideoSwin3D
from lavender_tpu.ops.swin_block_attn import (
    _round8, fused_swin_block_attn, padded_shift_mask, rel_pos_bias_padded,
    supports_fused_block, swin_block_attn_reference)
from lavender_tpu.models.swin3d import (
    compute_shift_mask_jnp, relative_position_index)


def _params(C, nH, window, seed=0):
    g = np.random.RandomState(seed)
    N = int(np.prod(window))
    L = (2 * window[0] - 1) * (2 * window[1] - 1) * (2 * window[2] - 1)
    mk = lambda *s: jnp.asarray(g.randn(*s).astype(np.float32) * 0.05)
    table = mk(L, nH)
    rpi = relative_position_index(tuple(window))[:N, :N]
    bias = table[jnp.asarray(rpi.reshape(-1))].reshape(N, N, nH)
    bias = bias.transpose(2, 0, 1)
    bias_p = rel_pos_bias_padded(table, rpi, window[0], window[1],
                                 window[2], _round8(window[2]), jnp.float32)
    return dict(
        ln_scale=1.0 + 0.1 * mk(C), ln_bias=0.1 * mk(C),
        wqkv=mk(C, 3 * C), bqkv=mk(3 * C), wproj=mk(C, C), bproj=mk(C),
        bias=bias, bias_p=bias_p)


@pytest.mark.parametrize("shift", [(0, 0, 0), (0, 2, 2)])
def test_kernel_matches_reference(shift):
    B, D, H, W, C, nH = 2, 3, 14, 14, 32, 4
    window = (3, 7, 7)
    assert supports_fused_block(D, H, W, window)
    p = _params(C, nH, window)
    g = np.random.RandomState(1)
    x = jnp.asarray(g.randn(B, D, H, W, C).astype(np.float32))
    shift_mask = None
    if any(shift):
        shift_mask = compute_shift_mask_jnp(D, H, W, window, shift)
    want = swin_block_attn_reference(
        x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"], p["wproj"],
        p["bproj"], p["bias"], window, shift, nH, (C // nH) ** -0.5, 1e-5,
        shift_mask)
    with pltpu.force_tpu_interpret_mode():
        got = fused_swin_block_attn(
            x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"],
            p["wproj"], p["bproj"], p["bias_p"], window, shift, nH,
            (C // nH) ** -0.5, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_aligned_window_no_pad():
    # ww already a multiple of 8 -> no pad path
    B, D, H, W, C, nH = 1, 2, 8, 16, 16, 2
    window = (2, 4, 8)
    p = _params(C, nH, window, seed=3)
    g = np.random.RandomState(4)
    x = jnp.asarray(g.randn(B, D, H, W, C).astype(np.float32))
    want = swin_block_attn_reference(
        x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"], p["wproj"],
        p["bproj"], p["bias"], window, (0, 0, 0), nH, (C // nH) ** -0.5,
        1e-5, None)
    with pltpu.force_tpu_interpret_mode():
        got = fused_swin_block_attn(
            x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"],
            p["wproj"], p["bproj"], p["bias_p"], window, (0, 0, 0), nH,
            (C // nH) ** -0.5, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_backbone_fused_equals_xla():
    """attn_impl='fused' == 'xla' through the whole backbone (interpret)."""
    cfg_x = SwinConfig(embed_dim=8, depths=(1, 2, 1, 1),
                       num_heads=(1, 2, 4, 8), window_size=(8, 7, 7),
                       drop_path_rate=0.0, attn_impl="xla")
    cfg_f = SwinConfig(embed_dim=8, depths=(1, 2, 1, 1),
                       num_heads=(1, 2, 4, 8), window_size=(8, 7, 7),
                       drop_path_rate=0.0, attn_impl="fused")
    g = np.random.RandomState(0)
    x = jnp.asarray(g.randn(1, 2, 112, 112, 3).astype(np.float32))
    mx = VideoSwin3D(cfg_x)
    params = mx.init(jax.random.PRNGKey(0), x)
    want = mx.apply(params, x)
    mf = VideoSwin3D(cfg_f)
    with pltpu.force_tpu_interpret_mode():
        # param trees must be interchangeable
        pf = mf.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(pf))
        got = mf.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_gradients_flow():
    B, D, H, W, C, nH = 1, 2, 7, 7, 16, 2
    window = (2, 7, 7)
    p = _params(C, nH, window, seed=5)
    g = np.random.RandomState(6)
    x = jnp.asarray(g.randn(B, D, H, W, C).astype(np.float32))

    def loss(x, wqkv):
        with pltpu.force_tpu_interpret_mode():
            out = fused_swin_block_attn(
                x, p["ln_scale"], p["ln_bias"], wqkv, p["bqkv"],
                p["wproj"], p["bproj"], p["bias_p"], window, (0, 0, 0), nH,
                (C // nH) ** -0.5, 1e-5)
        return jnp.sum(out ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, p["wqkv"])

    def loss_ref(x, wqkv):
        out = swin_block_attn_reference(
            x, p["ln_scale"], p["ln_bias"], wqkv, p["bqkv"], p["wproj"],
            p["bproj"], p["bias"], window, (0, 0, 0), nH,
            (C // nH) ** -0.5, 1e-5, None)
        return jnp.sum(out ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, p["wqkv"])
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-4)


@pytest.mark.parametrize("shift", [(0, 0, 0), (0, 2, 2)])
def test_full_block_kernel_matches_reference(shift):
    """Merged attn+MLP kernel == attn reference + LN2/MLP reference."""
    from lavender_tpu.ops.fused_mlp import ln_mlp_reference
    from lavender_tpu.ops.swin_block_attn import fused_swin_block_full
    B, D, H, W, C, nH = 2, 3, 14, 14, 32, 4
    window = (3, 7, 7)
    p = _params(C, nH, window, seed=7)
    g = np.random.RandomState(8)
    x = jnp.asarray(g.randn(B, D, H, W, C).astype(np.float32))
    HD = 2 * C
    n2s = 1.0 + 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    n2b = 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    w1 = jnp.asarray(g.randn(C, HD).astype(np.float32) * 0.05)
    b1 = jnp.asarray(g.randn(HD).astype(np.float32) * 0.05)
    w2 = jnp.asarray(g.randn(HD, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(g.randn(C).astype(np.float32) * 0.05)

    shift_mask = None
    if any(shift):
        shift_mask = compute_shift_mask_jnp(D, H, W, window, shift)
    y = swin_block_attn_reference(
        x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"], p["wproj"],
        p["bproj"], p["bias"], window, shift, nH, (C // nH) ** -0.5, 1e-5,
        shift_mask)
    flat = y.reshape(-1, C)
    want = (flat + ln_mlp_reference(flat, n2s, n2b, w1, b1, w2, b2,
                                    1e-5)).reshape(y.shape)
    with pltpu.force_tpu_interpret_mode():
        got = fused_swin_block_full(
            x, p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"],
            p["wproj"], p["bproj"], p["bias_p"], n2s, n2b, w1, b1, w2, b2,
            window, shift, nH, (C // nH) ** -0.5, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_drop_path_traced_rate_keeps_dtype():
    """A traced drop-path rate must not promote bf16 activations (breaks
    the scanned-stage carry dtype); caught by the TPU train bench."""
    from lavender_tpu.models.swin3d import drop_path
    x = jnp.ones((4, 3, 3), jnp.bfloat16)

    def f(rate):
        return drop_path(x, rate, False, jax.random.PRNGKey(0))

    out = jax.jit(f)(jnp.float32(0.2))
    assert out.dtype == jnp.bfloat16


def test_train_drop_path_fused_matches_xla_with_grads():
    """drop_path 0.1 training parity (round-2 weak #2): the fused path now
    runs the kernels through stochastic-depth-as-lerp, and with one shared
    dropout seed a single SwinBlock3D's outputs AND parameter gradients
    match the XLA module path exactly (same bernoulli draws, same math)."""
    from lavender_tpu.models.swin3d import SwinBlock3D
    B, D, H, W, C, nH = 3, 2, 14, 14, 16, 2
    window = (2, 7, 7)
    g = np.random.RandomState(1)
    x = jnp.asarray(g.randn(B, D, H, W, C).astype(np.float32))

    def block(impl, shift):
        return SwinBlock3D(
            dim=C, num_heads=nH, window_size=window,
            shift_size=shift, drop_path_rate=0.1, attn_impl=impl)

    for shift in ((0, 0, 0), (1, 3, 3)):
        bx, bf = block("xla", shift), block("fused", shift)
        params = bx.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x)
        rngs = {"dropout": jax.random.PRNGKey(7)}

        def loss(blk, p):
            return jnp.sum(blk.apply(p, x, deterministic=False,
                                     rngs=rngs) ** 2)

        lx, gx = jax.value_and_grad(lambda p: loss(bx, p))(params)
        with pltpu.force_tpu_interpret_mode():
            lf, gf = jax.value_and_grad(lambda p: loss(bf, p))(params)
        np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
        flat_x = jax.tree_util.tree_leaves_with_path(gx)
        flat_f = dict(
            ("/".join(str(k) for k in path), leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(gf))
        checked = 0
        for path, leaf in flat_x:
            key = "/".join(str(k) for k in path)
            np.testing.assert_allclose(
                np.asarray(flat_f[key]), np.asarray(leaf),
                atol=5e-4, rtol=5e-3, err_msg=f"{shift} {key}")
            checked += 1
        assert checked >= 10  # ln1/2, qkv, proj, bias table, mlp


def test_backbone_wm_equals_xla():
    """attn_impl='wm' (window-major stages) == 'xla' through the whole
    backbone, shifted blocks included, with an interchangeable param
    tree (both scanned)."""
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    cfg_x = SwinConfig(attn_impl="xla", **common)
    cfg_w = SwinConfig(attn_impl="wm", **common)
    g = np.random.RandomState(0)
    x = jnp.asarray(g.randn(1, 2, 56, 56, 3).astype(np.float32))
    mx = VideoSwin3D(cfg_x)
    params = mx.init(jax.random.PRNGKey(0), x)
    want = mx.apply(params, x)
    mw = VideoSwin3D(cfg_w)
    with pltpu.force_tpu_interpret_mode():
        pw = mw.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(pw))
        got = mw.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_backbone_wm_gradients_match_xla():
    """Parameter gradients through the wm custom_vjp (reference recompute
    composed with the wm relayouts; pad rows pass through as identity) ==
    the XLA module path's gradients."""
    common = dict(embed_dim=8, depths=(2,), num_heads=(2,),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    g = np.random.RandomState(3)
    x = jnp.asarray(g.randn(1, 2, 28, 28, 3).astype(np.float32))
    mx = VideoSwin3D(SwinConfig(attn_impl="xla", **common))
    params = mx.init(jax.random.PRNGKey(0), x)

    def loss_x(p):
        return jnp.sum(mx.apply(p, x) ** 2)

    want = jax.grad(loss_x)(params)
    mw = VideoSwin3D(SwinConfig(attn_impl="wm", **common))

    def loss_w(p):
        return jnp.sum(mw.apply(p, x) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_w)(params)
    flat_w, _ = jax.tree_util.tree_flatten(got)
    flat_x, _ = jax.tree_util.tree_flatten(want)
    for a, b in zip(flat_w, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_train_drop_path_wm_matches_xla_with_grads():
    """drop_path-active training through the wm kernels (stochastic-depth
    -as-lerp): outputs and parameter gradients match the XLA path exactly
    under one shared dropout seed."""
    common = dict(embed_dim=8, depths=(2,), num_heads=(2,),
                  window_size=(8, 7, 7), drop_path_rate=0.1,
                  scan_blocks=True)
    g = np.random.RandomState(4)
    x = jnp.asarray(g.randn(2, 2, 28, 28, 3).astype(np.float32))
    mx = VideoSwin3D(SwinConfig(attn_impl="xla", **common))
    params = mx.init(jax.random.PRNGKey(0), x)
    rngs = {"dropout": jax.random.PRNGKey(7)}

    def loss_x(p):
        return jnp.sum(mx.apply(p, x, deterministic=False,
                                rngs=rngs) ** 2)

    want_l, want_g = jax.value_and_grad(loss_x)(params)
    mw = VideoSwin3D(SwinConfig(attn_impl="wm", **common))

    def loss_w(p):
        return jnp.sum(mw.apply(p, x, deterministic=False,
                                rngs=rngs) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got_l, got_g = jax.value_and_grad(loss_w)(params)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    flat_w, _ = jax.tree_util.tree_flatten(got_g)
    flat_x, _ = jax.tree_util.tree_flatten(want_g)
    for a, b in zip(flat_w, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_wm_native_ref_matches_wm_ref_with_grads():
    """_wm_ref_native (the wm backward's recompute path) == _wm_ref on
    valid rows, values AND gradients, masked and unmasked, Npad > N."""
    from lavender_tpu.ops.swin_block_attn import (
        _wm_full_ref, _wm_full_ref_native, _wm_ref, _wm_ref_native)
    g = np.random.RandomState(0)
    B, nW, C, nH = 2, 4, 16, 2
    window = (2, 2, 3)   # N = 12, Npad = 16
    N, Npad = 12, 16
    spatial = (2, 4, 6)
    x = jnp.asarray(g.randn(B, nW, Npad, C).astype(np.float32))
    x = x.at[:, :, N:].set(0.0)  # pads enter zeroed (wm_partition)
    ln_s = 1.0 + 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    ln_b = 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    wqkv = jnp.asarray(g.randn(C, 3 * C).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(g.randn(3 * C).astype(np.float32) * 0.1)
    wproj = jnp.asarray(g.randn(C, C).astype(np.float32) * 0.1)
    bproj = jnp.asarray(g.randn(C).astype(np.float32) * 0.1)
    bias = jnp.asarray(g.randn(nH, Npad, Npad).astype(np.float32) * 0.1)
    bias = bias.at[:, :, N:].set(-100.0)
    mask = jnp.asarray(
        (g.rand(nW, N, N) > 0.85) * -100.0, jnp.float32)
    n2s = 1.0 + 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    n2b = 0.1 * jnp.asarray(g.randn(C).astype(np.float32))
    w1 = jnp.asarray(g.randn(C, 2 * C).astype(np.float32) * 0.1)
    b1 = jnp.asarray(g.randn(2 * C).astype(np.float32) * 0.1)
    w2 = jnp.asarray(g.randn(2 * C, C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(g.randn(C).astype(np.float32) * 0.1)
    scale = (C // nH) ** -0.5

    for m in (None, mask):
        args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, m)

        def f_old(x, wqkv, wproj, bias):
            y = _wm_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, m,
                        spatial, window, nH, scale, 1e-5)
            return jnp.sum(y[:, :, :N] ** 2)  # valid rows only

        def f_new(x, wqkv, wproj, bias):
            y = _wm_ref_native(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                               bias, m, spatial, window, nH, scale, 1e-5)
            return jnp.sum(y[:, :, :N] ** 2)

        np.testing.assert_allclose(float(f_new(x, wqkv, wproj, bias)),
                                   float(f_old(x, wqkv, wproj, bias)),
                                   rtol=1e-5)
        go = jax.grad(f_old, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
        gn = jax.grad(f_new, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
        for a, b in zip(gn, go):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)

        def F_old(x, w1, w2):
            y = _wm_full_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias,
                             m, n2s, n2b, w1, b1, w2, b2, spatial, window,
                             nH, scale, 1e-5)
            return jnp.sum(y[:, :, :N] ** 2)

        def F_new(x, w1, w2):
            y = _wm_full_ref_native(x, ln_s, ln_b, wqkv, bqkv, wproj,
                                    bproj, bias, m, n2s, n2b, w1, b1, w2,
                                    b2, spatial, window, nH, scale, 1e-5)
            return jnp.sum(y[:, :, :N] ** 2)

        np.testing.assert_allclose(float(F_new(x, w1, w2)),
                                   float(F_old(x, w1, w2)), rtol=1e-5)
        Go = jax.grad(F_old, argnums=(0, 1, 2))(x, w1, w2)
        Gn = jax.grad(F_new, argnums=(0, 1, 2))(x, w1, w2)
        for a, b in zip(Gn, Go):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)


def test_backbone_wm_window12_like_no_tail_pad():
    """The large_384 preset runs window 12 -> N = wd*12*12 is already
    8-aligned, i.e. the wm path's Npad == N / no-pad-rows case (every
    other wm test uses window 7's 245 -> 248 tail pad).  wm == xla
    through a backbone with an 8-aligned window, shifted blocks
    included."""
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 4, 4), drop_path_rate=0.0,
                  scan_blocks=True)
    # window (8,4,4), T=2 -> window_eff (2,4,4): N = 32, Npad = 32
    cfg_x = SwinConfig(attn_impl="xla", **common)
    cfg_w = SwinConfig(attn_impl="wm", **common)
    g = np.random.RandomState(1)
    x = jnp.asarray(g.randn(1, 2, 32, 32, 3).astype(np.float32))
    mx = VideoSwin3D(cfg_x)
    params = mx.init(jax.random.PRNGKey(0), x)
    want = mx.apply(params, x)
    mw = VideoSwin3D(cfg_w)
    with pltpu.force_tpu_interpret_mode():
        got = mw.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_inkernel_shift_kernel_matches_composition():
    """fused_swin_block_wm_shifted (cyclic shift fused into the kernel:
    gather windows from the unshifted slab, scatter outputs back) ==
    the wm_shift -> wm block -> inverse wm_shift composition it replaces,
    values and gradients, Npad > N and Npad == N."""
    from lavender_tpu.ops.swin_block_attn import (
        _wm_shifted_ref, fused_swin_block_wm_shifted,
        supports_inkernel_shift)
    from lavender_tpu.models.swin3d import compute_shift_mask_jnp

    for window, spatial, Cc in (((2, 2, 3), (2, 4, 6), 16),
                                ((2, 2, 4), (2, 4, 8), 16)):
        g = np.random.RandomState(0)
        D, H, W = spatial
        nW = (H // window[1]) * (W // window[2])
        N = int(np.prod(window))
        Npad = _round8(N)
        nH = 2
        shift = (0, 1, 1)
        assert supports_inkernel_shift(window, spatial, Npad, Cc, nH, nW)
        B = 2
        x = jnp.asarray(g.randn(B, nW, Npad, Cc).astype(np.float32))
        x = x.at[:, :, N:].set(0.0)
        ln_s = 1.0 + 0.1 * jnp.asarray(g.randn(Cc).astype(np.float32))
        ln_b = 0.1 * jnp.asarray(g.randn(Cc).astype(np.float32))
        wqkv = jnp.asarray(g.randn(Cc, 3 * Cc).astype(np.float32) * 0.1)
        bqkv = jnp.asarray(g.randn(3 * Cc).astype(np.float32) * 0.1)
        wproj = jnp.asarray(g.randn(Cc, Cc).astype(np.float32) * 0.1)
        bproj = jnp.asarray(g.randn(Cc).astype(np.float32) * 0.1)
        bias = jnp.asarray(g.randn(nH, Npad, Npad).astype(np.float32) * 0.1)
        if Npad > N:
            bias = bias.at[:, :, N:].set(-100.0)
        mask = compute_shift_mask_jnp(D, H, W, window, shift)
        scale = (Cc // nH) ** -0.5
        args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, mask)
        statics = (spatial, window, shift, nH, scale, 1e-5)

        with pltpu.force_tpu_interpret_mode():
            got = fused_swin_block_wm_shifted(*args, *statics)
        want = _wm_shifted_ref(*args, *statics)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)
        # pad rows come out zeroed, exactly like the wm_shift pair
        if Npad > N:
            assert float(jnp.abs(got[:, :, N:]).max()) == 0.0

        def f_kernel(x, wqkv, wproj, bias):
            y = fused_swin_block_wm_shifted(
                x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, mask,
                *statics)
            return jnp.sum(y[:, :, :N] ** 2)

        def f_ref(x, wqkv, wproj, bias):
            y = _wm_shifted_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                                bias, mask, *statics)
            return jnp.sum(y[:, :, :N] ** 2)

        with pltpu.force_tpu_interpret_mode():
            gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(
                x, wqkv, wproj, bias)
        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, wqkv, wproj, bias)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)


def test_wm_bias_hoist_and_serving_cache_match_per_block_gather():
    """The serving rel-pos-bias hoist (LVT_BIASHOIST) and the prebuilt
    serving cache (build_serving_bias_cache) are pure layout moves: all
    three paths — per-block in-scan gather, vmapped pre-scan gather, and
    cache-collection read — produce identical backbone outputs."""
    import lavender_tpu.models.swin3d as swin3d_mod
    from lavender_tpu.models.swin3d import build_serving_bias_cache
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    cfg = SwinConfig(attn_impl="wm", **common)
    g = np.random.RandomState(11)
    x = jnp.asarray(g.randn(1, 2, 56, 56, 3).astype(np.float32))
    m = VideoSwin3D(cfg)
    old = swin3d_mod._BIASHOIST
    old_fold = swin3d_mod._FOLDCACHE
    try:
        with pltpu.force_tpu_interpret_mode():
            variables = m.init(jax.random.PRNGKey(0), x)
            swin3d_mod._BIASHOIST = False
            want = m.apply(variables, x)          # per-block gather
            swin3d_mod._BIASHOIST = True
            got_hoist = m.apply(variables, x)     # pre-scan vmapped gather
            # bit-exactness holds for the BIAS layout moves; the fold
            # cache is a separate (rounding-level) transform — tested in
            # test_serving_fold_cache_matches_unfolded
            swin3d_mod._FOLDCACHE = False
            vcache = build_serving_bias_cache(m, variables, x,
                                              use_jit=False)
            assert "cache" in vcache, "no cache collection built"
            cache_paths = [
                jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(vcache["cache"])[0]]
            assert any("rel_bias_a" in p for p in cache_paths), cache_paths
            got_cache = m.apply(vcache, x)        # prebuilt cache read
    finally:
        swin3d_mod._BIASHOIST = old
        swin3d_mod._FOLDCACHE = old_fold
    np.testing.assert_allclose(np.asarray(got_hoist), np.asarray(want),
                               atol=0, rtol=0)
    np.testing.assert_allclose(np.asarray(got_cache), np.asarray(want),
                               atol=0, rtol=0)


def test_serving_fold_cache_matches_unfolded():
    """LVT_FOLDCACHE: the prebuilt LN-affine-folded weights (fold_a/fold_b
    in the cache collection) produce the same backbone output as the
    unfolded kernels — same math by (x_norm*s + b) @ W == x_norm @
    (diag(s) W) + b W; cacheless applies are untouched by the flag."""
    import lavender_tpu.models.swin3d as swin3d_mod
    from lavender_tpu.models.swin3d import build_serving_bias_cache
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    cfg = SwinConfig(attn_impl="wm", **common)
    g = np.random.RandomState(12)
    x = jnp.asarray(g.randn(1, 2, 56, 56, 3).astype(np.float32))
    m = VideoSwin3D(cfg)
    old_fold = swin3d_mod._FOLDCACHE
    try:
        swin3d_mod._FOLDCACHE = True
        with pltpu.force_tpu_interpret_mode():
            variables = m.init(jax.random.PRNGKey(0), x)
            want = m.apply(variables, x)          # no cache: unfolded
            vcache = build_serving_bias_cache(m, variables, x,
                                              use_jit=False)
            cache_paths = [
                jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(vcache["cache"])[0]]
            assert any("fold_a" in p for p in cache_paths), cache_paths
            got = m.apply(vcache, x)              # folded weights read
    finally:
        swin3d_mod._FOLDCACHE = old_fold
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_serving_cache_staleness_guard():
    """check_serving_cache passes on a fresh cache, raises after any
    param update that moves a rel-pos bias table (advisor round-4 low:
    a stale cache silently served wrong biases before)."""
    import lavender_tpu.models.swin3d as swin3d_mod
    from lavender_tpu.models.swin3d import (build_serving_bias_cache,
                                            check_serving_cache)
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    cfg = SwinConfig(attn_impl="wm", **common)
    x = jnp.zeros((1, 2, 56, 56, 3), jnp.float32)
    m = VideoSwin3D(cfg)
    old = swin3d_mod._BIASHOIST
    try:
        swin3d_mod._BIASHOIST = True
        with pltpu.force_tpu_interpret_mode():
            variables = m.init(jax.random.PRNGKey(0), x)
            vcache = build_serving_bias_cache(m, variables, x,
                                              use_jit=False)
    finally:
        swin3d_mod._BIASHOIST = old
    # no cache -> False (nothing to check); fresh cache -> True
    assert check_serving_cache(variables) is False
    assert check_serving_cache(vcache) is True
    # simulate a param update (optimizer step / checkpoint swap)
    stale = jax.tree_util.tree_map(lambda v: v, vcache)
    params = jax.tree_util.tree_map(
        lambda v: v, jax.device_get(stale["params"]))

    def bump_tables(t):
        if isinstance(t, dict) or hasattr(t, "items"):
            return {k: (np.asarray(v) + 1.0
                        if k == "relative_position_bias_table"
                        else bump_tables(v))
                    for k, v in dict(t).items()}
        return t

    stale = {**stale, "params": bump_tables(params)}
    with pytest.raises(ValueError, match="stale serving bias cache"):
        check_serving_cache(stale)

    # fold-cache staleness: a norm1 update leaves the bias tables alone
    # but must trip the fold fingerprint (LVT_FOLDCACHE)
    def bump_norm1(t):
        if isinstance(t, dict) or hasattr(t, "items"):
            return {k: ({**dict(v), "scale": np.asarray(v["scale"]) + 1.0}
                        if k == "norm1" else bump_norm1(v))
                    for k, v in dict(t).items()}
        return t

    stale2 = {**vcache, "params": bump_norm1(
        jax.tree_util.tree_map(lambda v: v, jax.device_get(
            vcache["params"])))}
    with pytest.raises(ValueError, match="LN-folded weights"):
        check_serving_cache(stale2)


def test_backbone_wm_group_bump_matches_default():
    """LVT_WMGMAX=8 / LVT_WMSLAB=1M (bigger windows-per-grid-step, the
    G6 A/B stanza) must be bit-identical to the default G — the group
    size is a pure scheduling choice."""
    import lavender_tpu.ops.swin_block_attn as sba
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    cfg_w = SwinConfig(attn_impl="wm", **common)
    g = np.random.RandomState(1)
    x = jnp.asarray(g.randn(1, 2, 56, 56, 3).astype(np.float32))
    mw = VideoSwin3D(cfg_w)
    with pltpu.force_tpu_interpret_mode():
        params = mw.init(jax.random.PRNGKey(0), x)
        old_g, old_s = sba._WMGMAX, sba._WMSLAB
        try:
            # force a SMALL group for the control side (the shipping
            # default is the round-5 G<=8 cap, which already picks 8 at
            # this tiny geometry)
            sba._WMGMAX, sba._WMSLAB = 2, 524288
            assert sba._pick_wm_group(64, 120, 8) == 2
            want = mw.apply(params, x)
            sba._WMGMAX, sba._WMSLAB = 8, 1048576
            assert sba._pick_wm_group(64, 120, 8) == 8
            got = mw.apply(params, x)
        finally:
            sba._WMGMAX, sba._WMSLAB = old_g, old_s
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_backbone_wm_lnfold_matches_default():
    """LVT_LNFOLD (LN affine pre-folded into the qkv and MLP-w1 weights,
    kernel applies the pure normalize only) must match the unfolded path
    — same math by (x_norm*s + b) @ W == x_norm @ (diag(s) W) + b W."""
    import lavender_tpu.ops.swin_block_attn as sba
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    cfg_w = SwinConfig(attn_impl="wm", **common)
    g = np.random.RandomState(4)
    x = jnp.asarray(g.randn(1, 2, 56, 56, 3).astype(np.float32))
    mw = VideoSwin3D(cfg_w)
    with pltpu.force_tpu_interpret_mode():
        params = mw.init(jax.random.PRNGKey(0), x)
        want = mw.apply(params, x)
        old = sba._LNFOLD
        sba._LNFOLD = True
        try:
            got = mw.apply(params, x)
        finally:
            sba._LNFOLD = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_swintrain_composition_matches_fused_path():
    """LVT_SWINTRAIN (train-mode plain-AD composition: XLA LN/qkv/proj +
    flash core kernel, stored residuals) matches the fused custom_vjp
    path in BOTH forward and gradients — the two train backends must be
    interchangeable (round-5 Swin-backward lever)."""
    import os
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    cfg = SwinConfig(attn_impl="wm", **common)
    g = np.random.RandomState(3)
    x = jnp.asarray(g.randn(1, 2, 56, 56, 3).astype(np.float32))
    m = VideoSwin3D(cfg)

    def run(flag):
        os.environ["LVT_SWINTRAIN"] = flag
        try:
            with pltpu.force_tpu_interpret_mode():
                variables = m.init(jax.random.PRNGKey(0), x)

                def loss(params):
                    out = m.apply({"params": params}, x,
                                  deterministic=False,
                                  rngs={"dropout": jax.random.PRNGKey(9)})
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                val, grads = jax.value_and_grad(loss)(variables["params"])
            return float(val), grads
        finally:
            os.environ.pop("LVT_SWINTRAIN", None)

    v_comp, g_comp = run("1")
    v_fused, g_fused = run("0")
    np.testing.assert_allclose(v_comp, v_fused, rtol=1e-4)
    flat_c = jax.tree_util.tree_leaves_with_path(g_comp)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    # also assert at least one rel-pos table gradient is nonzero (dtable
    # flows through the composition's differentiable bias gather)
    saw_table = False
    for path, a in flat_c:
        b = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path))
        if "relative_position_bias_table" in jax.tree_util.keystr(path):
            saw_table = True
            assert float(jnp.abs(a).max()) > 0
    assert saw_table


def test_embed_ingress_matches_standard_path():
    """LVT_EMBING (window-major u8 embed ingress) == the standard
    u8-embed + wm_partition path through the whole backbone: the im2col
    composes the s2d transpose with stage 1's partition, the per-token
    matmul math is identical (round-5 patch-embed lever)."""
    import os
    common = dict(embed_dim=8, depths=(2, 2), num_heads=(1, 2),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=True)
    cfg = SwinConfig(attn_impl="wm", **common)
    g = np.random.RandomState(5)
    x_u8 = jnp.asarray(
        g.randint(0, 256, (1, 2, 56, 56, 3)).astype(np.uint8))
    m = VideoSwin3D(cfg)
    os.environ["LVT_PL_INTERPRET"] = "1"
    try:
        variables = m.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2, 56, 56, 3), jnp.float32))
        want = np.asarray(m.apply(variables, x_u8))
        os.environ["LVT_EMBING"] = "1"
        got = np.asarray(m.apply(variables, x_u8))
    finally:
        os.environ.pop("LVT_PL_INTERPRET", None)
        os.environ.pop("LVT_EMBING", None)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
