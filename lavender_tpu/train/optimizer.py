"""Optimizer + LR schedule (reference: agent.py Agent_Base.build_optimizer).

Reproduces the 4-param-group AdamW of agent.py:96-140 — {decay, no-decay} x
{swin, other} with the swin groups' LR scaled by ``vis_backbone_lr_mul`` —
and the per-iteration WarmupLinearLR (agent.py:13-43), as optax transforms.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax

from lavender_tpu.config import TrainConfig


def warmup_linear_schedule(base_lr: float, max_iter: int,
                           warmup_ratio: float = 0.1,
                           min_lr: float = 1e-8) -> Callable:
    """LR factor: linear 0->1 over warmup, then linear 1->0 to max_iter
    (agent.py:28-43), floored at min_lr."""
    warmup = int(warmup_ratio * max_iter)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        wu = jnp.maximum(warmup, 1)
        rise = step / wu
        span = jnp.maximum(max_iter - warmup, 1)
        fall = (max_iter - jnp.minimum(step, max_iter)) / span
        factor = jnp.where(step < warmup, rise, fall)
        return jnp.maximum(base_lr * factor, min_lr)

    return schedule


def _group_label(path, leaf) -> str:
    key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
    is_swin = "swin" in key
    leafname = key.rsplit("/", 1)[-1]
    # reference no-decay: any 'bias' substring + LayerNorm weight
    # (agent.py:98); in our tree LayerNorm weights are 'scale' leaves and
    # relative_position_bias_table contains 'bias'.
    no_decay = ("bias" in leafname) or (leafname == "scale")
    return ("swin_" if is_swin else "other_") + (
        "nodecay" if no_decay else "decay")


def param_group_labels(params):
    flat, tree = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        tree, [_group_label(p, v) for p, v in flat])


def build_optimizer(params, cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with the reference's 4 groups + warmup-linear LR + optional
    global-norm clipping (agent.py:96-140, 241-246)."""
    max_iter = max(cfg.max_iter, 1)

    def adamw(lr_mul: float, wd: float):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(
                warmup_linear_schedule(
                    cfg.lr * lr_mul, max_iter, cfg.warmup_ratio, cfg.min_lr)),
        )

    tx = optax.multi_transform(
        {
            "swin_decay": adamw(cfg.vis_backbone_lr_mul, cfg.decay),
            "swin_nodecay": adamw(cfg.vis_backbone_lr_mul, 0.0),
            "other_decay": adamw(1.0, cfg.decay),
            "other_nodecay": adamw(1.0, 0.0),
        },
        param_group_labels,
    )
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    return tx
