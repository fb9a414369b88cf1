"""LAVENDER core model: video encoder adapter + text embeddings + fusion.

Behavioral reference: ``/root/reference/model.py`` (classes EncVideo, EncTxt,
LAVENDER_Base).  Every video-language task runs through:

    encode_video + encode_text  (go_feat, model.py:185-192)
    -> concat [video; (pretext); text] + attention mask (go_cross, :223-243)
    -> BERT fusion encoder -> unified MLM head on the text slice.

TPU-first differences from the reference:
* all shapes static under jit — text is always padded to ``size_txt`` and the
  mask position is carried as data, not control flow;
* the B x B retrieval pair blow-up (main_retrieval_mlm.py:62-84) is expressed
  as a broadcast (``jnp.repeat`` / ``jnp.tile``) in the task head instead of a
  Python loop;
* masks are additive f32 biases built at trace time.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lavender_tpu.config import ModelConfig, TASK_TOK2ID
from lavender_tpu.models.bert import (
    BertEmbeddings, BertEncoder, BertMLMHead, extended_attention_mask)
from lavender_tpu.models.swin3d import VideoSwin3D

Array = jax.Array


def build_cross_mask(mask_img: Array, mask_txt: Array,
                     attn_mask_type: str = "full",
                     mask_pretxt: Optional[Array] = None) -> Array:
    """Joint attention mask over [video; (pretext); text] (model.py:194-221).

    Returns [B, L] for "full" or [B, L, L] for "seq2seq" (causal on text,
    full on video+pretext; video rows cannot attend to text).
    """
    if mask_pretxt is not None:
        full_mask = jnp.concatenate([mask_img, mask_pretxt], axis=1)
    else:
        full_mask = mask_img
    B, Lfull = full_mask.shape
    Lt = mask_txt.shape[1]
    L = Lfull + Lt
    if attn_mask_type == "seq2seq":
        mask = jnp.zeros((B, L, L), dtype=jnp.int32)
        tri = jnp.tril(jnp.ones((Lt, Lt), dtype=jnp.int32))
        mask = mask.at[:, :, :Lfull].set(full_mask[:, None, :].astype(jnp.int32))
        mask = mask.at[:, Lfull:, Lfull:].set(tri[None])
        return mask
    return jnp.concatenate([full_mask, mask_txt], axis=1)


class EncVideo(nn.Module):
    """Visual adapter: Swin features -> BERT token space (model.py:5-93).

    Projects swin features to hidden size, prepends a learned per-frame [CLS],
    adds spatial + temporal position embeddings, LayerNorms and flattens to
    ``[B, T*(1+h*w), hidden]``.
    """

    config: ModelConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.swin = VideoSwin3D(cfg.swin, dtype=self.dtype, name="swin")
        latent = cfg.swin.num_features
        hidden = cfg.hidden_size
        if cfg.swinbert:
            # SwinBERT-initialized variant (model.py:32-35)
            self.fc = nn.Dense(512, dtype=self.dtype, name="fc")
            self.img_embedding = nn.Dense(hidden, dtype=self.dtype,
                                          name="img_embedding")
            return
        if latent != hidden:
            self.fc = nn.Dense(hidden, dtype=self.dtype, name="fc")
        else:
            self.fc = None
        init = nn.initializers.normal(stddev=1.0)

        def scaled(key, shape):
            return 0.02 * init(key, shape)

        self.emb_cls = self.param("emb_cls", scaled, (1, 1, 1, hidden))
        self.emb_pos = self.param(
            "emb_pos", scaled, (1, 1, 1 + cfg.max_size_patch ** 2, hidden))
        self.emb_len = self.param(
            "emb_len", scaled, (1, cfg.max_size_frame, 1, hidden))
        self.emb_odr = self.param("emb_odr", scaled, (1, 1, 1, hidden))
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")

    def __call__(self, img: Array, odr: Optional[Array] = None,
                 vt_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        """img: [B, T, H, W, 3] normalized; returns (f_img [B, Lv, H], m_img [B, Lv])."""
        B, T, H, W, _ = img.shape
        h, w = H // 32, W // 32

        f = self.swin(img, deterministic=deterministic)  # [B, T, h, w, latent]
        f = f.reshape(B, T, h * w, -1)
        if self.config.swinbert:
            # SwinBERT path (model.py:52-67): fc -> img_embedding, a fake
            # zero [CLS] whose attention-mask entry is 0
            f = self.img_embedding(self.fc(f))
            fake_cls = jnp.zeros((B, T, 1, f.shape[-1]), f.dtype)
            f = jnp.concatenate([fake_cls, f], axis=2)
            m = jnp.ones((B, T, 1 + h * w), dtype=jnp.int32)
            m = m.at[:, :, 0].set(0)
            return (f.reshape(B, T * (1 + h * w), -1),
                    m.reshape(B, T * (1 + h * w)))
        if self.fc is not None:
            f = self.fc(f)

        cls_tok = jnp.broadcast_to(
            self.emb_cls.astype(f.dtype), (B, T, 1, f.shape[-1]))
        f = jnp.concatenate([cls_tok, f], axis=2)  # [B, T, 1+hw, hidden]
        f = f + self.emb_pos[:, :, :1 + h * w, :].astype(f.dtype)

        if odr is not None:
            # frame-order pretraining variant (model.py:72-81): positions
            # matching odr get their emb_len row, others get emb_odr.
            pos = jnp.arange(T)[None, :]  # [1, T]
            match = (odr == pos).astype(f.dtype)[:, :, None, None]  # [B,T,1,1]
            emb = (match * self.emb_len[:, :T].astype(f.dtype)
                   + (1.0 - match) * self.emb_odr.astype(f.dtype))
            f = f + emb
        else:
            f = f + self.emb_len[:, :T, :, :].astype(f.dtype)

        f = self.norm(f).reshape(B, T * (1 + h * w), -1)

        m = jnp.ones((B, T, 1 + h * w), dtype=jnp.int32)
        if vt_mask is not None:
            m = m * vt_mask.astype(jnp.int32)
        m = m.reshape(B, T * (1 + h * w))
        return f, m


class EncTxt(nn.Module):
    """Text encoder: BERT embeddings (+ optional full encoder).

    Reference: EncTxt (model.py:96-142).  Default is embeddings-only
    (txt_backbone_embed_only, utils/args.py:91-93).
    """

    config: ModelConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.emb_txt = BertEmbeddings(self.config.bert, dtype=self.dtype,
                                      name="emb_txt")
        if not self.config.txt_backbone_embed_only:
            self.txt_trsfr = BertEncoder(self.config.bert, dtype=self.dtype,
                                         name="txt_trsfr")
        else:
            self.txt_trsfr = None

    def __call__(self, txt: Array, mask_txt: Optional[Array] = None,
                 attn_mask_type: str = "full",
                 deterministic: bool = True) -> Array:
        f = self.emb_txt(txt, deterministic=deterministic)
        if self.txt_trsfr is not None:
            if mask_txt is None:
                mask_txt = jnp.ones_like(txt)
            if attn_mask_type == "seq2seq":
                B, Lt = mask_txt.shape
                m = jnp.broadcast_to(
                    jnp.tril(jnp.ones((Lt, Lt), jnp.int32))[None], (B, Lt, Lt))
            else:
                m = mask_txt
            bias = extended_attention_mask(m, dtype=jnp.float32)
            f = self.txt_trsfr(f, bias, deterministic=deterministic)
        return f


class LavenderModel(nn.Module):
    """LAVENDER_Base equivalent: all tasks as MLM through one head.

    Reference: model.py:145-243 + per-task fc_mtm construction
    (main_retrieval_mlm.py:38-48).
    """

    config: ModelConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.enc_txt = EncTxt(cfg, dtype=self.dtype, name="enc_txt")
        self.trsfr = BertEncoder(cfg.bert, dtype=self.dtype, name="trsfr")
        self.enc_img = EncVideo(cfg, dtype=self.dtype, name="enc_img")
        self.fc_mtm = BertMLMHead(cfg.bert, dtype=self.dtype, name="fc_mtm")
        init = nn.initializers.normal(stddev=1.0)
        self.emb_task = self.param(
            "emb_task", lambda k, s: 0.02 * init(k, s),
            (cfg.num_task_tokens, cfg.hidden_size))

    # ---- building blocks (mirroring model.py method names) ----

    def go_feat(self, img: Array, txt: Array, mask: Array,
                odr: Optional[Array] = None, vt_mask: Optional[Array] = None,
                attn_mask_type: str = "full", deterministic: bool = True):
        """Encode both modalities (model.py:185-192)."""
        feat_img, mask_img = self.enc_img(
            img, odr=odr, vt_mask=vt_mask, deterministic=deterministic)
        feat_txt = self.enc_txt(
            txt, mask_txt=mask, attn_mask_type=attn_mask_type,
            deterministic=deterministic)
        return feat_img, mask_img, feat_txt, mask

    def go_cross(self, feat_img: Array, mask_img: Array, feat_txt: Array,
                 mask_txt: Array, attn_mask_type: str = "full",
                 feat_pretxt: Optional[Array] = None,
                 mask_pretxt: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """Fuse [video; (pretext); text] (model.py:223-243)."""
        if feat_pretxt is not None and mask_pretxt is None:
            # pretext features already counted inside feat_txt's mask
            feat = jnp.concatenate([feat_img, feat_pretxt, feat_txt], axis=1)
            mask = build_cross_mask(mask_img, mask_txt, attn_mask_type)
        else:
            feat = jnp.concatenate([feat_img, feat_txt], axis=1)
            mask = build_cross_mask(
                mask_img, mask_txt, attn_mask_type, mask_pretxt=mask_pretxt)
        assert feat.shape[1] == mask.shape[-1], (
            f"feat/mask length mismatch: {feat.shape[1]} vs {mask.shape[-1]}")
        bias = extended_attention_mask(mask, dtype=jnp.float32)
        return self.trsfr(feat, bias, deterministic=deterministic)

    def mlm_head(self, hidden: Array) -> Array:
        return self.fc_mtm(hidden)

    def task_feat(self, task_name: str, batch_size: int) -> Tuple[Array, Array]:
        """Learned task-token feature + its mask (model.py:248-265)."""
        task_id = TASK_TOK2ID[task_name]
        feat = jnp.broadcast_to(
            self.emb_task[task_id][None, None, :].astype(self.dtype),
            (batch_size, 1, self.config.hidden_size))
        mask = jnp.ones((batch_size, 1), dtype=jnp.int32)
        return feat, mask

    def encode_prompt(self, prompt_txt: Array, batch_size: int,
                      deterministic: bool = True) -> Array:
        """Encode a prompt token sequence and broadcast to batch
        (model.py:266-288)."""
        if prompt_txt.ndim == 1:
            prompt_txt = prompt_txt[None]
        feat = self.enc_txt(prompt_txt, deterministic=deterministic)
        if feat.shape[0] == 1 and batch_size > 1:
            feat = jnp.broadcast_to(
                feat, (batch_size,) + feat.shape[1:])
        return feat

    def __call__(self, img: Array, txt: Array, mask: Array,
                 attn_mask_type: str = "full",
                 deterministic: bool = True) -> Array:
        """Default forward: fused MLM logits on the text slice.

        This is the shared shape of the QA-as-MLM forwards
        (e.g. main_qamc_mlm.py:124-140): returns [B, Lt, vocab].
        """
        B, T, H, W, _ = img.shape
        h, w = H // 32, W // 32
        feat_img, mask_img, feat_txt, mask_txt = self.go_feat(
            img, txt, mask, deterministic=deterministic)
        out = self.go_cross(
            feat_img, mask_img, feat_txt, mask_txt,
            attn_mask_type=attn_mask_type, deterministic=deterministic)
        return self.fc_mtm(out[:, (1 + h * w) * T:])
