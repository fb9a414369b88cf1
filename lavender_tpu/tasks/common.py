"""Shared task utilities: losses, pretext (task-token/prompt) handling.

Reference: agent.py:72 (CrossEntropyLoss(ignore_index=-1)),
model.py:245-306 (get_pretxt / prepro_txt_inputs), agent.py:46-65
(NormSoftmaxLoss).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy_ignore(logits: Array, labels: Array,
                         ignore_index: int = -1) -> Array:
    """Mean token CE with ignore_index, computed in f32 (agent.py:72)."""
    logits = logits.astype(jnp.float32)
    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_labels = labels.reshape(-1)
    valid = flat_labels != ignore_index
    safe = jnp.where(valid, flat_labels, 0)
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def norm_softmax_loss(sim: Array, temperature: float = 0.05) -> Array:
    """Bidirectional InfoNCE over a similarity matrix (agent.py:46-65)."""
    sim = sim.astype(jnp.float32) / temperature
    i_logsm = jax.nn.log_softmax(sim, axis=1)
    j_logsm = jax.nn.log_softmax(sim.T, axis=1)
    loss_i = jnp.mean(jnp.diag(i_logsm))
    loss_j = jnp.mean(jnp.diag(j_logsm))
    return -loss_i - loss_j


def label_smoothed_kl_loss(logits: Array, labels: Array,
                           label_smoothing: float = 0.1,
                           drop_worst_ratio: float = 0.0) -> Array:
    """Captioning loss: label-smoothed KL + optional drop-worst
    (model_for_captioning.py:10-37).  labels: [N] int; ignored where < 0."""
    logits = logits.astype(jnp.float32)
    n_class = logits.shape[-1]
    eps = label_smoothing
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    one_hot = jax.nn.one_hot(safe, n_class)
    target = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # KLDivLoss(log_prb, one_hot).sum(1) == sum target*(log target - logp);
    # the (constant) entropy term matters for drop-worst ordering parity, so
    # keep the full form.
    ent = jnp.where(target > 0, target * jnp.log(target), 0.0).sum(-1)
    loss = ent - (target * logp).sum(-1)
    loss = jnp.where(valid, loss, 0.0)
    if drop_worst_ratio > 0:
        keep = int(loss.shape[0] * (1 - drop_worst_ratio))
        loss = -jax.lax.top_k(-loss, keep)[0]
        return loss.mean()
    denom = jnp.maximum(valid.sum(), 1)
    return loss.sum() / denom


def prepend_pretxt(feat_txt: Array, mask_txt: Array,
                   feat_pre: Optional[Array], mask_pre: Optional[Array]
                   ) -> Tuple[Array, Array, int]:
    """Prepend task-token/prompt features to the text stream
    (model.py:292-306).  Returns (feat, mask, pretxt_len)."""
    if feat_pre is None:
        return feat_txt, mask_txt, 0
    feat = jnp.concatenate([feat_pre.astype(feat_txt.dtype), feat_txt], axis=1)
    mask = jnp.concatenate([mask_pre.astype(mask_txt.dtype), mask_txt], axis=1)
    return feat, mask, feat_pre.shape[1]


def pad_labels_for_pretxt(labels: Array, pretxt_len: int) -> Array:
    """Extend label arrays with ignore (-1) over pretext positions."""
    if pretxt_len == 0:
        return labels
    B = labels.shape[0]
    pad = jnp.full((B, pretxt_len), -1, dtype=labels.dtype)
    return jnp.concatenate([pad, labels], axis=1)


def make_pretext_fn(model, mcfg, task_name: Optional[str] = None,
                    prompt: Optional[Tuple] = None):
    """Build the per-step pretext producer, or None when disabled.

    Mirrors LAVENDER_Base.get_pretxt (model.py:248-290): with
    ``enable_task_token`` the learned ``emb_task[task_id]`` row is the single
    pretext feature; with ``enable_prompt`` the dataset's prompt token ids
    (dataset.get_prompt, dataset.py:72-81) are run through the text encoder
    and broadcast over the batch.  Returns
    ``fn(variables, batch_size, deterministic=True, rngs=None) ->
    (feat_pre [B, Lp, H], mask_pre [B, Lp])``.
    """
    from lavender_tpu.models.lavender import LavenderModel
    if mcfg.enable_task_token and task_name is not None:
        def task_fn(variables, batch_size, deterministic=True, rngs=None):
            return model.apply(variables, task_name, batch_size,
                               method=LavenderModel.task_feat)
        return task_fn
    if mcfg.enable_prompt and prompt is not None:
        prompt_ids = jnp.asarray(prompt[0], jnp.int32)
        prompt_mask = jnp.asarray(prompt[1], jnp.int32)

        def prompt_fn(variables, batch_size, deterministic=True, rngs=None):
            feat = model.apply(
                variables, prompt_ids, batch_size,
                deterministic=deterministic,
                method=LavenderModel.encode_prompt, rngs=rngs)
            mask = jnp.broadcast_to(
                prompt_mask[None], (batch_size, prompt_mask.shape[0]))
            return feat, mask
        return prompt_fn
    return None


def apply_pretext(pretext, variables, batch_size: int,
                  deterministic: bool = True, rngs=None):
    """(feat_pre, mask_pre) from a make_pretext_fn result, or (None, None)."""
    if pretext is None:
        return None, None
    return pretext(variables, batch_size, deterministic=deterministic,
                   rngs=rngs)


def fused_mlm_logits(model, variables, img: Array, txt: Array, mask: Array,
                     feat_pre: Optional[Array] = None,
                     mask_pre: Optional[Array] = None,
                     attn_mask_type: str = "full",
                     deterministic: bool = True,
                     rngs=None) -> Tuple[Array, int]:
    """Shared QA/caption forward: go_feat -> (pretext) -> go_cross -> MLM
    logits on the text slice (the pattern of main_qamc_mlm.py:124-140 /
    main_qaoe_mlm_lsmdc_fib.py:80-94).  Returns (logits [B, Lp+Lt, V], Lp).
    """
    from lavender_tpu.models.lavender import LavenderModel
    fi, mi, ft, mt = model.apply(
        variables, img, txt, mask, attn_mask_type=attn_mask_type,
        deterministic=deterministic, method=LavenderModel.go_feat, rngs=rngs)
    Lv = fi.shape[1]
    lp = 0 if feat_pre is None else feat_pre.shape[1]
    if feat_pre is not None:
        # pretext features ride the text stream (prepro_txt_inputs,
        # model.py:292-306) but their mask goes through go_cross's
        # mask_pretxt so seq2seq keeps them in the full-attention prefix
        # (model_for_captioning.py:85-91, get_attn_mask model.py:200-216)
        ft = jnp.concatenate([feat_pre.astype(ft.dtype), ft], axis=1)
        out = model.apply(
            variables, fi, mi, ft, mt, attn_mask_type=attn_mask_type,
            mask_pretxt=mask_pre, deterministic=deterministic,
            method=LavenderModel.go_cross, rngs=rngs)
    else:
        out = model.apply(
            variables, fi, mi, ft, mt, attn_mask_type=attn_mask_type,
            deterministic=deterministic, method=LavenderModel.go_cross,
            rngs=rngs)
    logits = model.apply(variables, out[:, Lv:], method=LavenderModel.mlm_head)
    return logits, lp
