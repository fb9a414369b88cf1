"""Task-specific baseline heads (the reference's *_task_specific variants).

Reference: the 2-layer MLP heads built per task —
main_retrieval_task_specific.py:71-75 (scalar match), main_qamc_task_specific
.py:70-74 (size_option), main_qaoe_task_specific.py:68-72 (size_vocab),
main_pretrain_task_specific.py:128-132 (binary VTM).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPHead(nn.Module):
    """Dropout -> Dense(2H) -> ReLU -> Dense(out)."""

    hidden_size: int
    out_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if not deterministic and self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=False)
        x = nn.Dense(self.hidden_size * 2, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x
