"""Misc utilities (reference: utils/misc.py).

Covers the live pieces of the reference module: retry wrapper
(limited_retry_agent, :86-98), flock-guarded reads (exclusive_open_to_read,
:101-120), and parameter freeze/unfreeze by regex (:190-214) — expressed as
an optax gradient mask for the functional world.
"""
from __future__ import annotations

import contextlib
import os
import re
import time
from typing import Callable, Sequence

from lavender_tpu.utils.logging import LOGGER


def limited_retry(func: Callable, num_retries: int = 5, delay: float = 1.0,
                  *args, **kwargs):
    """Call func with retries + exponential backoff (utils/misc.py:86-98)."""
    for i in range(num_retries):
        try:
            return func(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — IO retry wrapper
            if i == num_retries - 1:
                raise
            LOGGER.warning(f"retry {i + 1}/{num_retries} after {e!r}")
            time.sleep(delay * (2 ** i))


@contextlib.contextmanager
def exclusive_open_to_read(path: str, mode: str = "r"):
    """Open with an exclusive flock on a sidecar lock file
    (utils/misc.py:101-120) — protects concurrent lineidx generation."""
    import fcntl
    lock_path = path + ".lock"
    with open(lock_path, "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        try:
            with open(path, mode) as f:
                yield f
        finally:
            fcntl.flock(lockf, fcntl.LOCK_UN)
    try:
        os.remove(lock_path)
    except OSError:
        pass


def freeze_mask(params, patterns: Sequence[str]):
    """Pytree of bools: False (frozen) where the param path matches any
    regex (reference freeze/unfreeze by regex, utils/misc.py:190-214).

    Use with ``optax.masked(tx, freeze_mask(params, [...]))`` or multiply
    into gradients.
    """
    import jax
    regs = [re.compile(p) for p in patterns]

    def label(path, _):
        key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        return not any(r.search(key) for r in regs)

    flat, tree = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        tree, [label(p, v) for p, v in flat])


def zero_frozen_grads(grads, mask):
    """Zero gradients where mask is False (frozen params stay put)."""
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
