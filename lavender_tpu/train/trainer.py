"""Training step builder: pjit-sharded forward/backward/update.

Replaces the reference's Agent_Base forward/backward machinery
(agent.py:203-250: AMP autocast + GradScaler + clip + step).  On TPU the
equivalents are: bf16 compute (no loss scaling needed — grads accumulate in
f32), optax clipping inside the optimizer chain, and one jitted function for
the whole step with donated state.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lavender_tpu.parallel import mesh as pmesh


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


# LVT_RBG (default ON; TPU A/B 36.57 vs 35.33 train clips/s, +3.5%):
# derive the train dropout rngs from the rbg PRNG instead of threefry.
# The XLA threefry mask generation on the FFN's [M, 3072] intermediate
# measured 4.2 ms fwd / 11.2 ms fwd+bwd per step at the flagship train
# shape (PERF.md round-4 crossparts); rbg lowers to the TPU hardware
# RNG.  Dropout masks are the only train-step jax.random consumers, so
# the bit-pattern change is statistically irrelevant; LVT_RBG=0 restores
# threefry for bit-reproducibility with old runs.
#
# Round-5 (advisor medium): scoped to the TRAIN DROPOUT STREAM ONLY via
# TYPED keys — TrainState.rng stores raw uint32 key data (checkpoint-
# friendly) and the step wraps it with jax.random.wrap_key_data(...,
# impl='rbg') before splitting.  Typed keys carry their impl through
# split/fold_in (raw keys do not — the round-4 global-config flip existed
# because per-key impl= on a raw key was reinterpreted as threefry by
# split).  No jax.config mutation: importing this module changes nothing
# outside the train step; model.init and decode sampling keep default
# threefry semantics.
_RBG = __import__("os").environ.get("LVT_RBG", "1") == "1"
TRAIN_PRNG_IMPL = "rbg" if _RBG else "threefry2x32"


def make_rng_data(seed: int) -> jax.Array:
    """Raw uint32 key data for the train dropout stream ((4,) for rbg,
    (2,) for threefry) — stored in TrainState so Orbax sees a plain
    array; wrapped back to a typed key inside the step."""
    return jax.random.key_data(jax.random.key(seed, impl=TRAIN_PRNG_IMPL))


def create_train_state(params, tx: optax.GradientTransformation,
                       seed: int = 88) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=make_rng_data(seed))


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True, has_aux: bool = False) -> Callable:
    """Build a jitted train step.

    loss_fn(params, batch, dropout_rng) -> scalar loss (or (loss, aux) with
    has_aux).  With a mesh, inputs/outputs are sharded: params/opt_state by
    the TP rules, batch over the data axis (== DDP + ZeRO-1, SURVEY.md §2.5).
    """

    def step_fn(state: TrainState, batch: Dict) -> tuple:
        key = jax.random.wrap_key_data(state.rng, impl=TRAIN_PRNG_IMPL)
        rng, new_key = jax.random.split(key)
        new_rng = jax.random.key_data(new_key)
        out, grads = jax.value_and_grad(loss_fn, has_aux=has_aux)(
            state.params, batch, rng)
        loss = out[0] if has_aux else out
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            rng=new_rng)
        return new_state, loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    # Explicit shardings (round-1 weak #7): don't rely on input placement —
    # params restored from Orbax or bf16-cast lose their sharding, and a
    # committed constraint keeps XLA from silently replicating TP params.
    # Optimizer state is additionally data-axis sharded (ZeRO-1; the
    # reference's DeepSpeed stage 1, utils/deepspeed.py:42-44) — see
    # pmesh.opt_state_pspecs.
    batch_sharding = NamedSharding(mesh, P(pmesh.DATA_AXIS))

    def _constrain_opt(opt_state):
        opt_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            pmesh.opt_state_pspecs(opt_state, mesh))
        return jax.tree_util.tree_map(
            jax.lax.with_sharding_constraint, opt_state, opt_shardings)

    @functools.partial(
        jax.jit, donate_argnums=(0,) if donate else ())
    def sharded_step(state, batch):
        param_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            pmesh.param_pspecs(state.params))
        params = jax.tree_util.tree_map(
            jax.lax.with_sharding_constraint, state.params, param_shardings)
        state = state.replace(params=params,
                              opt_state=_constrain_opt(state.opt_state))
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding),
            batch)
        new_state, loss = step_fn(state, batch)
        new_params = jax.tree_util.tree_map(
            jax.lax.with_sharding_constraint, new_state.params,
            param_shardings)
        return new_state.replace(
            params=new_params,
            opt_state=_constrain_opt(new_state.opt_state)), loss

    return sharded_step


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Eagerly place a freshly-created train state on the mesh: params by
    the TP rules, optimizer state by the ZeRO-1 specs — so per-device
    memory shrinks from step 0, not only after the first constrained step.
    Single-process only (multi-process states flow through the in-jit
    constraints, which handle global arrays)."""
    if jax.process_count() > 1:
        return state
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state.params, pmesh.param_pspecs(state.params))
    opt_state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state.opt_state, pmesh.opt_state_pspecs(state.opt_state, mesh))
    return state.replace(params=params, opt_state=opt_state)


def make_eval_forward(forward_fn: Callable, mesh: Optional[Mesh] = None):
    if mesh is None:
        return jax.jit(forward_fn)
    batch_sharding = NamedSharding(mesh, P(pmesh.DATA_AXIS))

    @jax.jit
    def fwd(variables, *args):
        args = tuple(
            jax.lax.with_sharding_constraint(a, batch_sharding)
            if hasattr(a, "ndim") and a.ndim >= 1 else a for a in args)
        return forward_fn(variables, *args)

    return fwd
