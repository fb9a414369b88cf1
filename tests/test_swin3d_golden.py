"""Golden-parity tests: JAX VideoSwin3D vs the PyTorch reference.

Strategy (SURVEY.md §4): random-init the reference SwinTransformer3D, convert
its state_dict with lavender_tpu.convert, run both on the same input, compare
activations in f32.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavender_tpu.config import SwinConfig
from lavender_tpu.convert import convert_state_dict
from lavender_tpu.models import swin3d

torch = pytest.importorskip("torch")
from tests.reference_oracle import import_reference_video_swin  # noqa: E402

video_swin = import_reference_video_swin()


def _tiny_cfg():
    return SwinConfig(
        embed_dim=16, depths=(2, 2), num_heads=(2, 4), window_size=(8, 7, 7),
        drop_path_rate=0.0, scan_blocks=False)


def _make_pair(cfg: SwinConfig, seed=0):
    torch.manual_seed(seed)
    ref = video_swin.SwinTransformer3D(
        pretrained=None, pretrained2d=False,
        patch_size=list(cfg.patch_size), embed_dim=cfg.embed_dim,
        depths=list(cfg.depths), num_heads=list(cfg.num_heads),
        window_size=cfg.window_size, drop_path_rate=0.0,
        patch_norm=cfg.patch_norm)
    ref.eval()
    params = convert_state_dict(ref.state_dict())
    model = swin3d.VideoSwin3D(cfg)
    return ref, model, {"params": params}


def _compare(cfg, B=1, T=3, H=56, W=56, seed=0, tol=2e-4):
    ref, model, variables = _make_pair(cfg, seed)
    rng = np.random.RandomState(seed)
    x = rng.randn(B, T, H, W, 3).astype(np.float32)
    with torch.no_grad():
        # reference takes NCDHW
        y_ref = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    y_ref = y_ref.numpy().transpose(0, 2, 3, 4, 1)  # -> [B, D, H', W', C]
    y = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    err = np.max(np.abs(y - y_ref)) / max(1e-6, np.max(np.abs(y_ref)))
    assert err < tol, f"relative max err {err}"


def test_window_partition_reverse_roundtrip():
    x = jnp.arange(2 * 4 * 14 * 14 * 3, dtype=jnp.float32).reshape(
        2, 4, 14, 14, 3)
    ws = (2, 7, 7)
    wins = swin3d.window_partition(x, ws)
    assert wins.shape == (2 * 2 * 2 * 2, 2 * 7 * 7, 3)
    x2 = swin3d.window_reverse(wins, ws, 2, 4, 14, 14)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_window_partition_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 14, 14, 3).astype(np.float32)
    ws = (2, 7, 7)
    ours = np.asarray(swin3d.window_partition(jnp.asarray(x), ws))
    theirs = video_swin.window_partition(torch.from_numpy(x), ws).numpy()
    np.testing.assert_allclose(ours, theirs)


def test_relative_position_index_matches_torch():
    attn = video_swin.WindowAttention3D(16, (3, 5, 5), 2)
    theirs = attn.relative_position_index.numpy()
    ours = swin3d.relative_position_index((3, 5, 5))
    np.testing.assert_array_equal(ours, theirs)


def test_shift_mask_matches_torch():
    ws, ss = (2, 7, 7), (1, 3, 3)
    theirs = video_swin.compute_mask(4, 14, 14, ws, ss, "cpu").numpy()
    ours = swin3d.compute_shift_mask(4, 14, 14, ws, ss)
    # torch mask sign convention may differ per cell; values are 0 or -100
    np.testing.assert_array_equal(ours, theirs)


def test_swin_tiny_depth2_golden():
    _compare(_tiny_cfg())


def test_swin_golden_T5_224_like():
    # T=5 (the finetune size_frame), smaller spatial for speed: exercises
    # temporal window shrink 8->5 and shift drop.
    cfg = SwinConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 4),
                     window_size=(8, 7, 7), drop_path_rate=0.0,
                     scan_blocks=False)
    _compare(cfg, B=2, T=5, H=56, W=56)


def test_swin_golden_4stages():
    cfg = SwinConfig(embed_dim=8, depths=(2, 2, 2, 2), num_heads=(1, 2, 4, 8),
                     window_size=(8, 7, 7), drop_path_rate=0.0,
                     scan_blocks=False)
    _compare(cfg, B=1, T=2, H=112, W=112, tol=5e-4)


def test_swin_golden_odd_spatial_padding():
    # Non-multiple-of-7 spatial dims exercise the window padding path.
    cfg = SwinConfig(embed_dim=8, depths=(2,), num_heads=(2,),
                     window_size=(8, 7, 7), drop_path_rate=0.0,
                     scan_blocks=False)
    _compare(cfg, B=1, T=2, H=40, W=40)


def test_swin_scan_blocks_golden():
    """Scanned-stage layout (weight-stacked lax.scan pairs) must match the
    torch reference exactly after converting + stacking the weights."""
    import dataclasses
    from lavender_tpu.convert import swin_to_scan_layout
    cfg = SwinConfig(embed_dim=8, depths=(2, 4), num_heads=(2, 4),
                     window_size=(8, 7, 7), drop_path_rate=0.0,
                     scan_blocks=True)
    torch.manual_seed(3)
    ref = video_swin.SwinTransformer3D(
        pretrained=None, pretrained2d=False,
        patch_size=list(cfg.patch_size), embed_dim=cfg.embed_dim,
        depths=list(cfg.depths), num_heads=list(cfg.num_heads),
        window_size=cfg.window_size, drop_path_rate=0.0)
    ref.eval()
    params = swin_to_scan_layout(
        convert_state_dict(ref.state_dict()), cfg.depths)
    model = swin3d.VideoSwin3D(cfg)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    y_ref = y_ref.numpy().transpose(0, 2, 3, 4, 1)
    y = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    err = np.max(np.abs(y - y_ref)) / max(1e-6, np.max(np.abs(y_ref)))
    assert err < 2e-4, err


def test_swin_scan_matches_unrolled_gradients():
    """scan and unrolled paths share math: same outputs AND same grads when
    params are re-laid-out."""
    import dataclasses
    from lavender_tpu.convert import swin_to_scan_layout
    cfg = SwinConfig(embed_dim=8, depths=(4,), num_heads=(2,),
                     window_size=(8, 7, 7), drop_path_rate=0.0,
                     scan_blocks=False)
    m_unroll = swin3d.VideoSwin3D(cfg)
    m_scan = swin3d.VideoSwin3D(dataclasses.replace(cfg, scan_blocks=True))
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 2, 14, 14, 3).astype(np.float32))
    v = m_unroll.init(jax.random.PRNGKey(0), x)
    scan_params = swin_to_scan_layout(v["params"], cfg.depths)
    y1 = m_unroll.apply(v, x)
    y2 = m_scan.apply({"params": scan_params}, x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               atol=2e-5, rtol=1e-4)


def test_device_built_masks_match_numpy():
    """iota-built rel-pos index and shift mask == numpy oracles (the device
    variants exist to keep multi-MB literals out of the compiled program)."""
    for ws in [(2, 7, 7), (3, 5, 5), (8, 7, 7)]:
        np.testing.assert_array_equal(
            np.asarray(swin3d.relative_position_index_jnp(ws)),
            swin3d.relative_position_index(ws))
    for (D, H, W), ws, ss in [
        ((4, 14, 14), (2, 7, 7), (1, 3, 3)),
        ((5, 14, 14), (5, 7, 7), (0, 3, 3)),   # zero temporal shift
        ((4, 21, 14), (2, 7, 7), (1, 3, 3)),
    ]:
        np.testing.assert_array_equal(
            np.asarray(swin3d.compute_shift_mask_jnp(D, H, W, ws, ss)),
            swin3d.compute_shift_mask(D, H, W, ws, ss))


def test_patch_embed_impls_match():
    """PatchEmbed3D impl='s2d' == impl='conv' on the same params."""
    import jax
    import jax.numpy as jnp
    from lavender_tpu.models.swin3d import PatchEmbed3D
    g = np.random.RandomState(0)
    x = jnp.asarray(g.rand(2, 5, 32, 32, 3).astype(np.float32))
    pe_conv = PatchEmbed3D(embed_dim=32, impl="conv")
    params = pe_conv.init(jax.random.PRNGKey(0), x)
    want = pe_conv.apply(params, x)
    got = PatchEmbed3D(embed_dim=32, impl="s2d").apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_patch_embed_u8_matches_normalize_conv():
    """RAW-uint8 patch embed (normalize folded into the conv weights +
    s2d MXU matmul, incl. the temporal-pad shift correction) == the
    legacy device_normalize -> zero-pad -> conv path, in f32."""
    from lavender_tpu.data.transforms import device_normalize
    rng = np.random.RandomState(7)
    B, D, H, W = 2, 5, 16, 16
    u8 = rng.randint(0, 256, (B, D, H, W, 3)).astype(np.uint8)
    pe = swin3d.PatchEmbed3D(embed_dim=24, dtype=jnp.float32)
    xf = device_normalize(jnp.asarray(u8), dtype=jnp.float32)
    v = pe.init(jax.random.PRNGKey(0), xf)
    want = pe.apply(v, xf)
    got = pe.apply(v, jnp.asarray(u8))
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_backbone_u8_input_matches_normalized_input():
    """Whole backbone fed raw uint8 == fed device_normalize output
    (flagship geometry class: no spatial pad)."""
    from lavender_tpu.data.transforms import device_normalize
    cfg = SwinConfig(embed_dim=8, depths=(2,), num_heads=(2,),
                     window_size=(8, 7, 7), drop_path_rate=0.0)
    m = swin3d.VideoSwin3D(cfg)
    rng = np.random.RandomState(9)
    u8 = rng.randint(0, 256, (1, 2, 28, 28, 3)).astype(np.uint8)
    xf = device_normalize(jnp.asarray(u8), dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(1), xf)
    want = m.apply(v, xf)
    got = m.apply(v, jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-4)
