"""fused_patch_embed_u8 Pallas kernel vs the normalize->pad->conv oracle
(CPU interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from lavender_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                          device_normalize)
from lavender_tpu.models import swin3d
from lavender_tpu.ops.patch_embed_u8 import (fused_patch_embed_u8,
                                             supports_fused_patch_embed)


def _oracle_and_params(u8, E):
    """device_normalize -> temporal zero-pad -> conv (the reference
    semantics, video_swin.py:388-405), plus the raw conv kernel/bias."""
    xf = device_normalize(jnp.asarray(u8), dtype=jnp.float32)
    pe = swin3d.PatchEmbed3D(embed_dim=E, patch_norm=False,
                             dtype=jnp.float32)
    v = pe.init(jax.random.PRNGKey(0), xf)
    want = pe.apply(v, xf)
    kern = v["params"]["proj"]["kernel"]
    bias = v["params"]["proj"]["bias"]
    return want, kern, bias


def test_patch_embed_kernel_matches_conv():
    rng = np.random.RandomState(3)
    B, D, H, W, E = 2, 5, 32, 32, 16
    u8 = rng.randint(0, 256, (B, D, H, W, 3)).astype(np.uint8)
    assert supports_fused_patch_embed(B, D, H, W, 3, (2, 4, 4))
    want, kern, bias = _oracle_and_params(u8, E)
    with pltpu.force_tpu_interpret_mode():
        got = fused_patch_embed_u8(jnp.asarray(u8), kern, bias,
                                   IMAGENET_MEAN, IMAGENET_STD,
                                   dtype=jnp.float32)
    assert got.shape == want.shape
    # bf16 operand rounding inside the kernel (u8->bf16 exact; weights
    # bf16) vs the f32 oracle: tolerance matches the backbone-level u8
    # tests
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


def test_patch_embed_kernel_temporal_pad_exactness():
    """The last output time must see a normalized-ZERO pad frame, not a
    u8-zero frame (the kd=1 shift fold must be absent at t = D-1)."""
    rng = np.random.RandomState(4)
    B, D, H, W, E = 1, 2, 32, 32, 8
    u8 = rng.randint(0, 256, (B, D, H, W, 3)).astype(np.uint8)
    want, kern, bias = _oracle_and_params(u8, E)
    with pltpu.force_tpu_interpret_mode():
        got = fused_patch_embed_u8(jnp.asarray(u8), kern, bias,
                                   IMAGENET_MEAN, IMAGENET_STD,
                                   dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got[:, -1]),
                               np.asarray(want[:, -1]),
                               atol=3e-2, rtol=3e-2)


def test_patch_embed_module_wiring():
    """PatchEmbed3D routes through the kernel when LVT_PEK=1 (geometry
    permitting) and matches its own s2d path."""
    import lavender_tpu.models.swin3d as s3
    rng = np.random.RandomState(5)
    u8 = rng.randint(0, 256, (1, 3, 32, 32, 3)).astype(np.uint8)
    pe = swin3d.PatchEmbed3D(embed_dim=16, dtype=jnp.float32)
    xf = device_normalize(jnp.asarray(u8), dtype=jnp.float32)
    v = pe.init(jax.random.PRNGKey(1), xf)
    want = pe.apply(v, jnp.asarray(u8))
    old = s3._PEK
    s3._PEK = True
    try:
        with pltpu.force_tpu_interpret_mode():
            got = pe.apply(v, jnp.asarray(u8))
    finally:
        s3._PEK = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)
