"""Unified pretraining: MLM + VTM-as-MLM.

Reference: main_pretrain_mlm.py (LAVENDER_Pretrain_MLM.forward:55-119,
Agent_Pretrain_MLM.masking:178-200) and main_pretrain_task_specific.py
(Dataset_Pretrain:15-110, shard-partitioned TSV epochs :282-328).

TPU-first rewrites:
* the per-token Python masking loop becomes one vectorized numpy op;
* the per-sample negative-sampling loop becomes a batched random top-k
  (sample O-1 negatives j != i for every i at once, inside jit);
* shard-by-part epochs are a plain iterator over (tsv, lineidx) part files.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lavender_tpu.config import DataConfig
from lavender_tpu.data.dataset import VideoTextDataset
from lavender_tpu.data.tsv import TSVFile
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import common

IMAGE_DATASETS = ("cc3m", "coco", "vg", "cc12m")


class PretrainDataset(VideoTextDataset):
    """One shard (part) of a pretraining corpus.

    The reference hardcodes per-corpus path patterns
    (main_pretrain_task_specific.py:29-71); here a shard is just
    (tsv_path, txt dict video->list[caption]).  Image corpora use 1 frame.
    """

    def __init__(self, cfg: DataConfig, tokzr, split: str, tsv_path: str,
                 txt: Dict[str, List[str]], dataset_name: str = "",
                 mlm: bool = True, meta_cols: int = 2):
        size_frame = 1 if dataset_name in IMAGE_DATASETS else cfg.size_frame
        super().__init__(cfg, tokzr, split, size_frame)
        self.tsv = TSVFile(tsv_path)
        self.txt = txt
        self.mlm = mlm
        self.meta_cols = meta_cols  # frames start at this column

    def __len__(self):
        return len(self.tsv)

    @property
    def vtm_prompt_text(self):
        return "is the video-text paired, true or false?"

    @property
    def cap_prompt_text(self):
        return "write a description about the video."

    def str2txt(self, s):
        txt, mask = super().str2txt(s)
        if self.mlm:
            txt, mask = self.append_mask_tok2txt(txt, mask)
        return txt, mask

    def __getitem__(self, idx):
        row = self.tsv.seek(idx)
        vid, bufs = row[0], row[self.meta_cols:]
        raw_txt = ""
        if vid in self.txt:
            entry = self.txt[vid]
            raw_txt = entry[0] if isinstance(entry, (list, tuple)) else entry
        try:
            img = self.frames_from_b64(bufs)
        except Exception:
            S = self.cfg.size_img
            img = np.zeros((self.size_frame, S, S, 3), np.uint8)
        txt, mask = self.str2txt(raw_txt)
        return {"img": self.pad_frames(img), "txt": txt, "mask": mask}


def mask_tokens(txt: np.ndarray, special_ids: Sequence[int],
                mask_token_id: int, p_mask: float = 0.15,
                rng: Optional[np.random.RandomState] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized 15% token masking (Agent_Pretrain_MLM.masking,
    main_pretrain_mlm.py:178-200, sans the per-token Python loop).

    Returns (masked_txt, ans_mtm) with ans_mtm == -1 on unmasked positions.
    """
    rng = rng or np.random
    special = np.isin(txt, np.asarray(special_ids))
    hit = (rng.rand(*txt.shape) < p_mask) & ~special
    ans_mtm = np.where(hit, txt, -1).astype(np.int32)
    masked = np.where(hit, mask_token_id, txt).astype(np.int32)
    return masked, ans_mtm


def sample_negatives(key, B: int, n_neg: int):
    """For each i, sample n_neg distinct j != i (the reference's
    np.random.permutation loop, main_pretrain_mlm.py:92-94, batched)."""
    noise = jax.random.uniform(key, (B, B))
    noise = noise + jnp.eye(B) * 1e9  # exclude self
    _, idx = jax.lax.top_k(-noise, n_neg)  # smallest noise = random pick
    return idx  # [B, n_neg]


def pretrain_forward(model: LavenderModel, variables, img, txt, mask,
                     neg_idx, vt_mask=None, feat_pre=None, mask_pre=None,
                     deterministic=True, rngs=None):
    """MLM pass + VTM pass (LAVENDER_Pretrain_MLM.forward:55-119).

    neg_idx: [B, O-1] negative text indices per video.  feat_pre/mask_pre
    (batch B) are the VTM task-token/prompt features — the reference applies
    pretext only to the VTM pass (prepro_txt_inputs with task_name="vtm" /
    batch["vtm_prompt"], main_pretrain_mlm.py:78-99), not the MLM pass.
    Returns (out_mtm [B,Lt,V], out_vtm [B*O,Lp+Lt,V]).
    """
    B = img.shape[0]
    fi, mi, ft, mt = model.apply(
        variables, img, txt, mask, vt_mask=vt_mask,
        deterministic=deterministic, method=LavenderModel.go_feat, rngs=rngs)
    Lv = fi.shape[1]

    # pass 1: MLM over the (positive) pairs
    out = model.apply(variables, fi, mi, ft, mt,
                      deterministic=deterministic,
                      method=LavenderModel.go_cross, rngs=rngs)
    out_mtm = model.apply(variables, out[:, Lv:],
                          method=LavenderModel.mlm_head)

    # pass 2: VTM — 1 positive + (O-1) in-batch negatives per video
    vft, vmt, _ = common.prepend_pretxt(ft, mt, feat_pre, mask_pre)
    O = neg_idx.shape[1] + 1
    pair_idx = jnp.concatenate(
        [jnp.arange(B, dtype=neg_idx.dtype)[:, None], neg_idx], axis=1)
    flat = pair_idx.reshape(-1)  # [B*O] text index for each pair
    pfi = jnp.repeat(fi, O, axis=0)
    pmi = jnp.repeat(mi, O, axis=0)
    pft = vft[flat]
    pmt = vmt[flat]
    out = model.apply(variables, pfi, pmi, pft, pmt,
                      deterministic=deterministic,
                      method=LavenderModel.go_cross, rngs=rngs)
    # VTM only ever reads the appended-[MASK] (last) position: apply the
    # head there alone (the slice commutes; XLA does not DCE the rest)
    out_vtm = model.apply(variables, out[:, -1:],
                          method=LavenderModel.mlm_head)
    return out_mtm, out_vtm


def make_loss_fn(model: LavenderModel, true_id: int, false_id: int,
                 vtm_batch: int = 4, pretext=None):
    """Total pretrain loss = ls_mtm + ls_vtm (main_pretrain_mlm.py:158-163)."""

    def loss_fn(params, batch, dropout_rng):
        img, txt, mask = batch["img"], batch["txt"], batch["mask"]
        ans_mtm = batch["ans_mtm"]
        B, Lt = txt.shape
        O = min(B, vtm_batch)
        neg_key, drop_key = jax.random.split(dropout_rng)
        neg_idx = sample_negatives(neg_key, B, O - 1)
        rngs = {"dropout": drop_key}
        fp, mp = common.apply_pretext(pretext, {"params": params}, B,
                                      deterministic=False, rngs=rngs)
        out_mtm, out_vtm = pretrain_forward(
            model, {"params": params}, img, txt, mask, neg_idx,
            vt_mask=batch.get("vt_mask"), feat_pre=fp, mask_pre=mp,
            deterministic=False, rngs=rngs)
        ls_mtm = common.cross_entropy_ignore(out_mtm, ans_mtm)
        # VTM labels: true at the appended [MASK] (last position) of column 0
        labels = jnp.concatenate(
            [jnp.full((B, 1), true_id), jnp.full((B, O - 1), false_id)],
            axis=1).reshape(-1)
        ls_vtm = common.cross_entropy_ignore(out_vtm[:, -1, :], labels)
        return ls_mtm + ls_vtm, {"mtm": ls_mtm, "vtm": ls_vtm}

    return loss_fn


def make_eval_step(model: LavenderModel, true_id: int, false_id: int,
                   vtm_batch: int = 4):
    """Eval: MLM accuracy + in-batch VTM ranking accuracy
    (Agent_Pretrain_MLM.cal_vtm_loss eval branch + step eval branch)."""

    @jax.jit
    def step(variables, img, txt, mask, ans_mtm, neg_key):
        B = img.shape[0]
        O = min(B, vtm_batch)
        neg_idx = sample_negatives(neg_key, B, O - 1)
        out_mtm, out_vtm = pretrain_forward(
            model, variables, img, txt, mask, neg_idx)
        pred = jnp.argmax(out_mtm.astype(jnp.float32), axis=-1)
        valid = ans_mtm != -1
        ac_mtm = jnp.where(
            valid.sum() > 0,
            (jnp.where(valid, pred == ans_mtm, False)).sum()
            / jnp.maximum(valid.sum(), 1), -1.0)
        last = out_vtm[:, -1, :].astype(jnp.float32).reshape(B, O, -1)
        score = last[..., true_id] / (
            last[..., true_id] + last[..., false_id])
        ac_vtm = (jnp.argmax(score, axis=-1) == 0).mean()
        return ac_mtm, ac_vtm

    return step
