"""BERT components in JAX/flax: embeddings, encoder (+KV-cache decode), MLM head.

These re-implement the HuggingFace BERT modules the reference model borrows
(reference: model.py:96-165 uses ``bert.embeddings``, ``bert.encoder`` and
``bert.cls`` from ``AutoModelForMaskedLM``).  Module names deliberately mirror
the HF/torch state-dict layout (``layer_{i}/attention/self/query`` etc.) so
checkpoint conversion (lavender_tpu/convert.py) is a mechanical key rewrite.

Beyond the reference, the encoder supports **incremental decoding with a
static KV cache** — the reference's fast caption-decode path exists but is
disabled (``NotImplementedError`` at model_for_captioning.py:123,298); here it
is first-class: ``prefill`` encodes the video prefix once and returns per-layer
K/V caches, ``decode_step`` extends them by n positions under ``lax.scan``.

TPU notes: attention runs as batched einsum matmuls (MXU-friendly), additive
masks are pre-broadcast float tensors built at trace time, softmax runs in f32
even when compute dtype is bf16, caches are fixed-size (static shapes).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lavender_tpu.config import BertConfig


def _fused_backend_ok() -> bool:
    """Mosaic kernels lower on TPU only.  LVT_FORCE_FUSED=1 lets the CPU
    test suite route the fused paths under force_tpu_interpret_mode (the
    backend gate would otherwise silently fall back to the module path,
    making kernel-vs-module parity tests vacuous).

    Under a tp>1 mesh the kernels are gated OFF (unless forced): Mosaic
    custom calls have no GSPMD partitioning rules, so the model-sharded
    query/key/value/proj weights would be all-gathered per apply and the
    sub-block computed replicated — the XLA module path lets GSPMD shard
    the dots instead (see swin3d.resolve_attn_impl, the same policy)."""
    import os
    if os.environ.get("LVT_FORCE_FUSED") == "1":
        return True
    from lavender_tpu.parallel import mesh as pmesh
    return jax.default_backend() == "tpu" and not pmesh.tp_active()

Array = jax.Array
KVCache = Tuple[Array, Array]  # k, v: [B, nH, Lcache, hd]


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

    def setup(self):
        H = self.config.hidden_size
        self.query = nn.Dense(H, dtype=self.dtype, name="query")
        self.key = nn.Dense(H, dtype=self.dtype, name="key")
        self.value = nn.Dense(H, dtype=self.dtype, name="value")
        self.attn_dropout = nn.Dropout(
            self.config.attention_probs_dropout_prob)

    def _heads(self, t: Array) -> Array:
        B, L, _ = t.shape
        cfg = self.config
        return t.reshape(B, L, cfg.num_attention_heads,
                         cfg.head_dim).transpose(0, 2, 1, 3)

    def _attend(self, q: Array, k: Array, v: Array, attn_bias: Array,
                deterministic: bool) -> Array:
        cfg = self.config
        if (getattr(cfg, "fused_attn", False) and deterministic
                and q.dtype == jnp.bfloat16 and q.shape[2] == k.shape[2]
                and _fused_backend_ok()
                and not self.is_initializing()):
            # serving path: keep the [B, nH, L, L] scores in VMEM — the XLA
            # path round-trips them through HBM around the softmax (the
            # dominant fusion-encoder traffic at the measured ~122 GB/s)
            from lavender_tpu.ops.encoder_attention import (
                fused_encoder_attention)
            B, nH, L, hd = q.shape
            mask = jnp.broadcast_to(attn_bias, (B, 1, L, L)).reshape(B, L, L)
            out = fused_encoder_attention(q, k, v, mask.astype(jnp.float32),
                                          float(cfg.head_dim) ** -0.5)
            return out.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)
        if (getattr(cfg, "fused_attn_train", False) and not deterministic
                and q.dtype == jnp.bfloat16 and q.shape[2] == k.shape[2]
                and _fused_backend_ok()
                and not self.is_initializing()):
            # train path: softmax probs + attention dropout stay in VMEM in
            # BOTH directions; the backward regenerates the dropout bits
            # from the seed (ops/encoder_attention.py train kernels).  On
            # the B x B pair product the XLA path's [B^2, nH, L, L] probs
            # + mask round trips dominate the train step's HBM traffic.
            from lavender_tpu.ops.encoder_attention import (
                fused_encoder_attention_train)
            B, nH, L, hd = q.shape
            mask = jnp.broadcast_to(attn_bias, (B, 1, L, L)).reshape(B, L, L)
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 2 ** 31 - 1, jnp.int32)
            out = fused_encoder_attention_train(
                q, k, v, mask.astype(jnp.float32), seed,
                float(cfg.head_dim) ** -0.5,
                float(cfg.attention_probs_dropout_prob))
            return out.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)
        attn = jnp.einsum("bhld,bhmd->bhlm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(cfg.head_dim).astype(attn.dtype)
        attn = attn + attn_bias.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        if not deterministic and cfg.attention_probs_dropout_prob > 0:
            attn = self.attn_dropout(attn, deterministic=False)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        B, _, L, _ = out.shape
        return out.transpose(0, 2, 1, 3).reshape(B, L, cfg.hidden_size)

    def __call__(self, x: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        import os as _os
        if (getattr(cfg, "fused_attn_train", False) and not deterministic
                and x.dtype == jnp.bfloat16 and _fused_backend_ok()
                and not self.is_initializing()
                and _os.environ.get("LVT_ATTNLANES", "1") == "1"):
            # round-5 train path: LANES-layout train kernel — q/k/v/o stay
            # [B, L, C] (heads = static lane slices in-kernel), deleting
            # the 4 fwd + 4 bwd [B, L, C] <-> [B, nH, L, hd] relayouts the
            # heads-layout kernel forces per layer (~110 MB/layer/dir at
            # the B^2-pair train shape; attn sub-block measured 29% of
            # peak, PERF.md crossparts).  Math/dropout semantics identical
            # (ops/encoder_attention.py lanes kernels, parity-tested).
            from lavender_tpu.ops.encoder_attention import (
                fused_encoder_attention_train_lanes)
            B, L, _ = x.shape
            mask = jnp.broadcast_to(attn_bias, (B, 1, L, L)).reshape(B, L, L)
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 2 ** 31 - 1, jnp.int32)
            return fused_encoder_attention_train_lanes(
                self.query(x), self.key(x), self.value(x),
                mask.astype(jnp.float32), seed,
                float(cfg.head_dim) ** -0.5,
                float(cfg.attention_probs_dropout_prob),
                cfg.num_attention_heads)
        q = self._heads(self.query(x))
        k = self._heads(self.key(x))
        v = self._heads(self.value(x))
        return self._attend(q, k, v, attn_bias, deterministic)

    def kv(self, x: Array) -> KVCache:
        """K/V for cache prefill."""
        return self._heads(self.key(x)), self._heads(self.value(x))

    def decode_step(self, x_new: Array, cache: KVCache, slot: Array,
                    attn_bias: Array) -> Tuple[Array, KVCache]:
        """Extend the cache with x_new (written at ``slot``) and attend over
        the full static cache.  attn_bias: [B, 1, n_new, Lcache]."""
        q = self._heads(self.query(x_new))
        k_new = self._heads(self.key(x_new))
        v_new = self._heads(self.value(x_new))
        ck, cv = cache
        ck = jax.lax.dynamic_update_slice(ck, k_new.astype(ck.dtype),
                                          (0, 0, slot, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_new.astype(cv.dtype),
                                          (0, 0, slot, 0))
        out = self._attend(q, ck, cv, attn_bias, deterministic=True)
        return out, (ck, cv)


class BertSelfOutput(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.dense = nn.Dense(self.config.hidden_size, dtype=self.dtype,
                              name="dense")
        self.LayerNorm = nn.LayerNorm(
            epsilon=self.config.layer_norm_eps, dtype=self.dtype,
            name="LayerNorm")
        self.dropout = nn.Dropout(self.config.hidden_dropout_prob)

    def __call__(self, x: Array, residual: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        if (getattr(cfg, "fused_attn_train", False) and not deterministic
                and x.dtype == jnp.bfloat16 and _fused_backend_ok()
                and not self.is_initializing()):
            # train path companion of the attention train kernel: proj +
            # in-kernel hidden dropout + residual + LN in one pallas_call
            # (ops/fused_mlp.py fused_out_ln_train, mask-replay backward)
            from lavender_tpu.ops.fused_mlp import fused_out_ln_train
            sh = x.shape
            dt = x.dtype
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 2 ** 31 - 1, jnp.int32)
            out = fused_out_ln_train(
                x.reshape(-1, sh[-1]), residual.reshape(-1, sh[-1]),
                self.dense.variables["params"]["kernel"].astype(dt),
                self.dense.variables["params"]["bias"].astype(dt),
                self.LayerNorm.variables["params"]["scale"],
                self.LayerNorm.variables["params"]["bias"],
                seed, cfg.layer_norm_eps,
                float(cfg.hidden_dropout_prob))
            return out.reshape(sh)
        x = self.dense(x)
        if not deterministic and self.config.hidden_dropout_prob > 0:
            x = self.dropout(x, deterministic=False)
        return self.LayerNorm(x + residual)


class BertAttention(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.self = BertSelfAttention(self.config, self.dtype, name="self")
        self.output = BertSelfOutput(self.config, self.dtype, name="output")

    def __call__(self, x: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        if (getattr(cfg, "fused_attn", False) and deterministic
                and x.dtype == jnp.bfloat16 and _fused_backend_ok()
                and not self.is_initializing()):
            # serving path: the WHOLE sub-block (qkv + attention + proj +
            # residual + post-LN) in one pallas_call — no [B, nH, L, hd]
            # head transpose and a single [L, C] slab round-trip, vs the
            # module path's ~4 (ops/encoder_attention.fused_bert_attn_block)
            from lavender_tpu.ops.encoder_attention import (
                fused_bert_attn_block, fused_bert_attn_block_kmask)
            dt = x.dtype
            sp = self.self.variables["params"]
            op = self.output.variables["params"]
            B, L, _ = x.shape
            import os as _os
            if (attn_bias.ndim == 4 and attn_bias.shape[-2] == 1
                    and _os.environ.get("LVT_KMASK", "1") == "1"):
                # key-padding-only mask ([B,1,1,L] from
                # extended_attention_mask on a 2D mask): the kmask kernel
                # deletes the per-head [L, L] mask-add pass (zeroed k/v
                # rows + scalar denominator correction — exact)
                keep = (attn_bias[:, 0, 0, :] >= -0.5).astype(jnp.float32)
                return fused_bert_attn_block_kmask(
                    x, sp["query"]["kernel"].astype(dt),
                    sp["key"]["kernel"].astype(dt),
                    sp["value"]["kernel"].astype(dt),
                    sp["query"]["bias"].astype(dt),
                    sp["key"]["bias"].astype(dt),
                    sp["value"]["bias"].astype(dt),
                    op["dense"]["kernel"].astype(dt),
                    op["dense"]["bias"].astype(dt),
                    op["LayerNorm"]["scale"], op["LayerNorm"]["bias"],
                    keep, cfg.num_attention_heads,
                    float(cfg.head_dim) ** -0.5, cfg.layer_norm_eps)
            mask = jnp.broadcast_to(attn_bias, (B, 1, L, L)).reshape(B, L, L)
            return fused_bert_attn_block(
                x, sp["query"]["kernel"].astype(dt),
                sp["key"]["kernel"].astype(dt),
                sp["value"]["kernel"].astype(dt),
                sp["query"]["bias"].astype(dt),
                sp["key"]["bias"].astype(dt),
                sp["value"]["bias"].astype(dt),
                op["dense"]["kernel"].astype(dt),
                op["dense"]["bias"].astype(dt),
                op["LayerNorm"]["scale"], op["LayerNorm"]["bias"],
                mask.astype(jnp.float32), cfg.num_attention_heads,
                float(cfg.head_dim) ** -0.5, cfg.layer_norm_eps)
        h = self.self(x, attn_bias, deterministic)
        return self.output(h, x, deterministic)

    def kv(self, x: Array) -> KVCache:
        return self.self.kv(x)

    def decode_step(self, x_new, cache, slot, attn_bias):
        h, cache = self.self.decode_step(x_new, cache, slot, attn_bias)
        return self.output(h, x_new, deterministic=True), cache


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.attention = BertAttention(cfg, self.dtype, name="attention")
        self.intermediate_dense = nn.Dense(
            cfg.intermediate_size, dtype=self.dtype, name="intermediate_dense")
        self.output_dense = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, name="output_dense")
        self.output_LayerNorm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype,
            name="output_LayerNorm")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def _ffn(self, x: Array, deterministic: bool) -> Array:
        cfg = self.config
        if (getattr(cfg, "fused_ffn", False) and deterministic
                and x.dtype == jnp.bfloat16
                and _fused_backend_ok()
                and not self.is_initializing()):
            # fused fc1+gelu+fc2+residual+post-LN (serving path) on the
            # SAME params as the module path
            from lavender_tpu.ops.fused_mlp import fused_ffn_post_ln
            sh = x.shape
            dt = x.dtype
            out = fused_ffn_post_ln(
                x.reshape(-1, sh[-1]),
                self.intermediate_dense.variables["params"]["kernel"
                                                            ].astype(dt),
                self.intermediate_dense.variables["params"]["bias"
                                                            ].astype(dt),
                self.output_dense.variables["params"]["kernel"].astype(dt),
                self.output_dense.variables["params"]["bias"].astype(dt),
                self.output_LayerNorm.variables["params"]["scale"],
                self.output_LayerNorm.variables["params"]["bias"],
                cfg.layer_norm_eps)
            return out.reshape(sh)
        if (getattr(cfg, "fused_ffn_train", False) and not deterministic
                and x.dtype == jnp.bfloat16
                and _fused_backend_ok()
                and not self.is_initializing()):
            # train path: fused FFN with IN-KERNEL hidden dropout (the 4x
            # [M, HD] intermediate never reaches HBM); backward replays
            # the exported binary keep mask (ops/fused_mlp.py train kernel)
            from lavender_tpu.ops.fused_mlp import fused_ffn_post_ln_train
            sh = x.shape
            dt = x.dtype
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 2 ** 31 - 1, jnp.int32)
            out = fused_ffn_post_ln_train(
                x.reshape(-1, sh[-1]),
                self.intermediate_dense.variables["params"]["kernel"
                                                            ].astype(dt),
                self.intermediate_dense.variables["params"]["bias"
                                                            ].astype(dt),
                self.output_dense.variables["params"]["kernel"].astype(dt),
                self.output_dense.variables["params"]["bias"].astype(dt),
                self.output_LayerNorm.variables["params"]["scale"],
                self.output_LayerNorm.variables["params"]["bias"],
                seed, cfg.layer_norm_eps,
                float(cfg.hidden_dropout_prob))
            return out.reshape(sh)
        h = self.intermediate_dense(x)
        h = nn.gelu(h, approximate=False)
        h = self.output_dense(h)
        if not deterministic and self.config.hidden_dropout_prob > 0:
            h = self.dropout(h, deterministic=False)
        return self.output_LayerNorm(h + x)

    def __call__(self, x: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        x = self.attention(x, attn_bias, deterministic)
        return self._ffn(x, deterministic)

    def kv(self, x: Array) -> KVCache:
        return self.attention.kv(x)

    def decode_step(self, x_new, cache, slot, attn_bias):
        h, cache = self.attention.decode_step(x_new, cache, slot, attn_bias)
        return self._ffn(h, deterministic=True), cache


class BertEncoder(nn.Module):
    """Stack of BertLayers (HF BertEncoder; fusion encoder ``trsfr`` in
    model.py:163).  Supports standard forward and cached incremental decode.
    """

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            BertLayer(self.config, self.dtype, name=f"layer_{i}")
            for i in range(self.config.num_hidden_layers)]

    def __call__(self, x: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        if self.config.remat and not deterministic:
            # recompute each layer in backward instead of storing its
            # [B, nH, L, L] attention probs + intermediates — the B x B
            # retrieval pass makes that traffic the train bottleneck
            def run(mdl, h, bias):
                return mdl(h, bias, False)

            run = nn.remat(run)
            for layer in self.layers:
                x = run(layer, x, attn_bias)
            return x
        for layer in self.layers:
            x = layer(x, attn_bias, deterministic)
        return x

    def prefill(self, x: Array, attn_bias: Array, cache_len: int
                ) -> Tuple[Array, List[KVCache]]:
        """Run the prefix through the stack; return output + per-layer caches
        sized ``cache_len`` with the prefix K/V written at slots [0, Lp)."""
        cfg = self.config
        B, Lp, _ = x.shape
        caches = []
        for layer in self.layers:
            k, v = layer.kv(x)
            pad = cache_len - Lp
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            caches.append((k, v))
            x = layer(x, attn_bias, deterministic=True)
        return x, caches

    def decode_step(self, x_new: Array, caches: List[KVCache], slot: Array,
                    attn_bias: Array) -> Tuple[Array, List[KVCache]]:
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x_new, cache = layer.decode_step(x_new, cache, slot, attn_bias)
            new_caches.append(cache)
        return x_new, new_caches


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
