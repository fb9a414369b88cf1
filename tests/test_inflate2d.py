"""Golden parity for the 2D->3D Swin weight inflation.

The reference inflates ImageNet 2D Swin checkpoints into Video Swin 3D
(``SwinTransformer3D.inflate_weights``, video_swin.py:482-533): temporal
repeat/scale of the patch embed and bicubic-resized + temporally-tiled
relative-position-bias tables.  We run the reference function on a random
2D state dict and require bit-comparable outputs from
``convert.inflate_swin2d_state_dict``.
"""
import numpy as np
import pytest

from lavender_tpu.config import SwinConfig
from lavender_tpu.convert import (
    convert_swin2d_checkpoint, inflate_swin2d_state_dict, _bicubic_resize)

torch = pytest.importorskip("torch")

from tests.reference_oracle import import_reference_video_swin  # noqa: E402

SWIN = SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 4),
                  window_size=(8, 7, 7), drop_path_rate=0.0)


def _rand_2d_state_dict(window2d=12):
    """A minimal 2D-Swin-shaped state dict: patch embed + per-block
    rel-pos tables (2D window ``window2d``, i.e. L1=(2w-1)^2)."""
    g = np.random.RandomState(0)
    sd = {
        "patch_embed.proj.weight": g.randn(8, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": g.randn(8).astype(np.float32),
    }
    for i, (depth, nh) in enumerate(zip(SWIN.depths, SWIN.num_heads)):
        for b in range(depth):
            L1 = (2 * window2d - 1) ** 2
            sd[f"layers.{i}.blocks.{b}.attn.relative_position_bias_table"] \
                = g.randn(L1, nh).astype(np.float32)
            # buffers the reference deletes
            sd[f"layers.{i}.blocks.{b}.attn.relative_position_index"] = \
                np.zeros((49, 49), np.int64)
    return sd


def test_bicubic_matches_torch():
    g = np.random.RandomState(1)
    x = g.randn(3, 23, 23).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x)[None], size=(13, 13),
        mode="bicubic").numpy()[0]
    got = _bicubic_resize(x, 13, 13)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inflate_golden(tmp_path):
    video_swin = import_reference_video_swin()
    sd2d = _rand_2d_state_dict()
    ckpt = tmp_path / "swin2d.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd2d.items()}},
               str(ckpt))

    torch.manual_seed(0)
    model3d = video_swin.SwinTransformer3D(
        pretrained=str(ckpt), pretrained2d=True,
        patch_size=list(SWIN.patch_size), embed_dim=SWIN.embed_dim,
        depths=list(SWIN.depths), num_heads=list(SWIN.num_heads),
        window_size=SWIN.window_size, drop_path_rate=0.0)
    model3d.inflate_weights()
    ref_sd = {k: v.numpy() for k, v in model3d.state_dict().items()}

    ours = inflate_swin2d_state_dict(sd2d, SWIN.window_size,
                                     SWIN.patch_size[0])
    np.testing.assert_allclose(
        ours["patch_embed.proj.weight"], ref_sd["patch_embed.proj.weight"],
        atol=1e-6)
    for i, (depth, _) in enumerate(zip(SWIN.depths, SWIN.num_heads)):
        for b in range(depth):
            k = f"layers.{i}.blocks.{b}.attn.relative_position_bias_table"
            np.testing.assert_allclose(ours[k], ref_sd[k], atol=1e-5,
                                       err_msg=k)
    assert not any("relative_position_index" in k for k in ours)


def test_convert_swin2d_checkpoint_tree():
    tree = convert_swin2d_checkpoint({"model": _rand_2d_state_dict()}, SWIN)
    pe = tree["patch_embed"]["proj"]["kernel"]
    # flax Conv kernel layout DHWIO with temporal depth = patch_size[0]
    assert pe.shape == (SWIN.patch_size[0], 4, 4, 3, 8)
    tab = tree["layers_0"]["blocks_0"]["attn"][
        "relative_position_bias_table"]
    wd, wh, ww = SWIN.window_size
    assert tab.shape == ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), 2)
