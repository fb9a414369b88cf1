"""BERT components in JAX/flax: embeddings, encoder, MLM head.

These re-implement the HuggingFace BERT modules the reference model borrows
(reference: model.py:96-165 uses ``bert.embeddings``, ``bert.encoder`` and
``bert.cls`` from ``AutoModelForMaskedLM``).  Module names deliberately mirror
the HF/torch state-dict layout (``layer_{i}/attention/self/query`` etc.) so
checkpoint conversion (lavender_tpu/convert.py) is a mechanical key rewrite.

TPU notes: attention runs as batched einsum matmuls (MXU-friendly), additive
masks are pre-broadcast ``[B, 1, Lq, Lk]`` float tensors built at trace time,
softmax accumulates in f32 even when compute dtype is bf16.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lavender_tpu.config import BertConfig

Array = jax.Array


def extended_attention_mask(mask: Array, dtype=jnp.float32) -> Array:
    """HF ``get_extended_attention_mask`` equivalent.

    mask: [B, L] or [B, Lq, Lk] with 1 = attend, 0 = masked.
    Returns additive mask [B, 1, Lq, Lk] (or [B,1,1,L]) with 0 / min-value.
    """
    if mask.ndim == 2:
        ext = mask[:, None, None, :]
    elif mask.ndim == 3:
        ext = mask[:, None, :, :]
    else:
        raise ValueError(f"mask ndim must be 2 or 3, got {mask.ndim}")
    big_neg = jnp.finfo(dtype).min
    return (1.0 - ext.astype(dtype)) * big_neg


class BertEmbeddings(nn.Module):
    """word + position + token-type embeddings + LayerNorm (HF BertEmbeddings)."""

    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array,
                 token_type_ids: Optional[Array] = None,
                 position_ids: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        B, L = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(L, dtype=jnp.int32)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), dtype=jnp.int32)

        we = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                      name="word_embeddings")(input_ids)
        pe = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                      dtype=self.dtype, name="position_embeddings")(position_ids)
        te = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                      name="token_type_embeddings")(token_type_ids)
        x = we + pe + te
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(x)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=False)
        return x


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        B, L, H = x.shape
        nH, hd = cfg.num_attention_heads, cfg.head_dim

        def split_heads(t):
            return t.reshape(B, L, nH, hd).transpose(0, 2, 1, 3)

        q = split_heads(nn.Dense(H, dtype=self.dtype, name="query")(x))
        k = split_heads(nn.Dense(H, dtype=self.dtype, name="key")(x))
        v = split_heads(nn.Dense(H, dtype=self.dtype, name="value")(x))

        attn = jnp.einsum("bhld,bhmd->bhlm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(hd).astype(attn.dtype)
        attn = attn + attn_bias.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        if not deterministic and cfg.attention_probs_dropout_prob > 0:
            attn = nn.Dropout(cfg.attention_probs_dropout_prob)(
                attn, deterministic=False)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, H)
        return out


class BertSelfOutput(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, residual: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="dense")(x)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=False)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(x + residual)


class BertAttention(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        h = BertSelfAttention(self.config, self.dtype, name="self")(
            x, attn_bias, deterministic)
        return BertSelfOutput(self.config, self.dtype, name="output")(
            h, x, deterministic)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        x = BertAttention(cfg, self.dtype, name="attention")(
            x, attn_bias, deterministic)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(h)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="output_LayerNorm")(h + x)
        return x


class BertEncoder(nn.Module):
    """Stack of BertLayers (HF BertEncoder; fusion encoder ``trsfr`` in
    model.py:163)."""

    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        for i in range(self.config.num_hidden_layers):
            x = BertLayer(self.config, self.dtype, name=f"layer_{i}")(
                x, attn_bias, deterministic)
        return x


class BertMLMHead(nn.Module):
    """BertOnlyMLMHead: transform (dense+gelu+LN) then vocab decoder.

    Reference usage: the single unified head ``fc_mtm`` taken from
    ``AutoModelForMaskedLM`` (main_retrieval_mlm.py:38-44).
    """

    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     name="transform_dense")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="transform_LayerNorm")(x)
        x = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="decoder")(x)
        return x
