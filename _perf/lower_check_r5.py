"""Real Mosaic lowering check (no execution) for the round-5 kernels."""
import sys, os.path as _op
sys.path.insert(0, _op.dirname(_op.dirname(_op.abspath(__file__))))
import jax, numpy as np
import jax.numpy as jnp

# 1. WMQKV wm kernel at stage-1 and stage-3 serving geometry
from lavender_tpu.ops.swin_block_attn import fused_swin_block_wm
def check_wm(B, nW, Npad, C, nH, masked):
    g = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.zeros((B, nW, Npad, C), dt)
    mk = lambda *s: jnp.zeros(s, dt)
    N = Npad - 3
    mask = jnp.zeros((nW, N, N), jnp.float32) if masked else None
    f = lambda x: fused_swin_block_wm(
        x, mk(C), mk(C), mk(C, 3*C), mk(3*C), mk(C, C), mk(C),
        mk(nH, Npad, Npad), mask, (5, 56, 56), (5, 7, 7), nH,
        (C//nH) ** -0.5, 1e-5)
    jax.jit(f).lower(x).compile if False else jax.jit(f).lower(x)
    print(f"wm ok B={B} nW={nW} C={C} nH={nH} masked={masked}")

check_wm(2, 64, 248, 128, 4, False)
check_wm(2, 64, 248, 128, 4, True)
check_wm(2, 16, 248, 256, 8, True)
check_wm(2, 4, 248, 512, 16, False)
check_wm(2, 1, 248, 1024, 32, False)

# 2. lanes train kernels fwd+bwd at flagship cross shape (scaled down B)
from lavender_tpu.ops.encoder_attention import (
    fused_encoder_attention_train_lanes)
B, L, C, nH = 4, 280, 768, 12
q = jnp.zeros((B, L, C), jnp.bfloat16)
mask = jnp.zeros((B, L, L), jnp.float32)
def loss(q, k, v):
    return jnp.sum(fused_encoder_attention_train_lanes(
        q, k, v, mask, jnp.int32(3), (C//nH) ** -0.5, 0.1, nH)
        .astype(jnp.float32) ** 2)
jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(q, q, q)
print("lanes fwd+bwd ok")
print("ALL LOWERED")
