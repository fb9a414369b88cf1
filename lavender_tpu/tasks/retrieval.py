"""Text-to-video retrieval as VTM-MLM (and the scalar-head baseline).

Reference: main_retrieval_mlm.py (Dataset_Retrieval_MLM:15,
LAVENDER_Retrieval_MLM:30, Agent_Retrieval_MLM:92) and
main_retrieval_task_specific.py (Dataset_Retrieval_TS:13).

TPU-first: the reference's per-sample Python pair loop
(main_retrieval_mlm.py:62-84) becomes a static broadcast — ``go_feat`` runs
once per batch, then video features are ``repeat``-ed and text features
``tile``-d to form the B x B product before one batched fusion pass.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lavender_tpu.data.dataset import TsvTaskDataset
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import common

Array = jax.Array


class RetrievalDataset(TsvTaskDataset):
    """Retrieval dataset: one (video, caption) per row; train-time random
    multi-caption concat (main_retrieval_task_specific.py:44-49); MLM
    variant appends a [MASK] (main_retrieval_mlm.py:20-23)."""

    def __init__(self, cfg, tokzr, split, img_tsv_path, id2lineidx, txt,
                 mlm: bool = True, **kw):
        super().__init__(cfg, tokzr, split, img_tsv_path, id2lineidx, txt, **kw)
        self.mlm = mlm
        # eval uses one caption per video (main_retrieval_task_specific.py:25-30)
        if split != "train":
            seen, first = set(), []
            for item in self.txt:
                if item["video"] not in seen:
                    seen.add(item["video"])
                    first.append(item)
            if len(first) < len(self.txt):
                self.txt = first
        self.vid2idx = {}
        for item in self.txt:
            self.vid2idx.setdefault(item["video"], len(self.vid2idx))

    @property
    def prompt_text(self):
        return "is the video-text paired, true or false?"

    def str2txt(self, s):
        txt, mask = super().str2txt(s)
        if self.mlm:
            txt, mask = self.append_mask_tok2txt(txt, mask)
        return txt, mask

    def __getitem__(self, idx):
        item = self.txt[idx]
        vid = item["video"]
        img = self.get_video(vid)
        raw = item["caption"]
        if isinstance(raw, list):
            if self.split == "train":
                ids = self.rng.sample(
                    range(len(raw)), self.rng.randint(1, len(raw)))
            else:
                ids = range(len(raw))
            raw = " ".join(raw[i] for i in ids)
        txt, mask = self.str2txt(raw)
        return {"img": self.pad_frames(img), "txt": txt, "mask": mask,
                "vid": np.int32(self.vid2idx[vid])}


def pairwise_mlm_logits(model: LavenderModel, variables, img, txt, mask,
                        feat_pre: Optional[Array] = None,
                        mask_pre: Optional[Array] = None,
                        deterministic: bool = True,
                        rngs: Optional[Dict] = None,
                        group: int = 1,
                        last_only: bool = False) -> Tuple[Array, int]:
    """All b x b (video_i, text_j) pairs within each of ``group`` batch
    groups -> MLM logits on the text slice.

    group=1 (default) is the full B x B product.  Under a data-parallel
    mesh the CLI passes group = dp so each data shard builds its LOCAL
    b x b product — exactly the reference's DDP semantics, where every GPU
    pairs only its own sub-batch (main_retrieval_mlm.py:62-79 runs per
    rank).  The grouped repeat/tile keeps shard boundaries aligned, so
    XLA compiles it with zero cross-device traffic.

    Returns (logits [B*b, Lp+Lt, V], pretxt_len) with b = B // group;
    pair (g, i, j) lives at row (g*b + i)*b + j, matching the reference
    loop order per rank.

    ``last_only``: apply the MLM head to the final (appended-[MASK])
    position only -> logits [B*b, 1, V].  The head commutes with the
    position slice, and XLA does NOT dead-code-eliminate the unused
    positions of a full-sequence vocab projection (measured: the
    [B^2*Lt, V] dot stays in the HLO when only [:, -1] is consumed) —
    on the B x B train product that is ~Lt x wasted head FLOPs and a
    [B^2, Lt, V] intermediate.
    """
    B = img.shape[0]
    assert B % group == 0, (B, group)
    b = B // group
    fi, mi, ft, mt = model.apply(
        variables, img, txt, mask, deterministic=deterministic,
        method=LavenderModel.go_feat, rngs=rngs)
    ft, mt, lp = common.prepend_pretxt(ft, mt, feat_pre, mask_pre)
    Lv = fi.shape[1]

    def grouped_pairs(x, repeat_video: bool):
        g = x.reshape((group, b) + x.shape[1:])
        if repeat_video:
            g = jnp.repeat(g, b, axis=1)
        else:
            reps = (1, b) + (1,) * (x.ndim - 1)
            g = jnp.tile(g, reps)
        return g.reshape((B * b,) + x.shape[1:])

    pfi = grouped_pairs(fi, True)
    pmi = grouped_pairs(mi, True)
    pft = grouped_pairs(ft, False)
    pmt = grouped_pairs(mt, False)
    out = model.apply(
        variables, pfi, pmi, pft, pmt, deterministic=deterministic,
        method=LavenderModel.go_cross, rngs=rngs)
    hidden = out[:, -1:] if last_only else out[:, Lv:]
    logits = model.apply(variables, hidden, method=LavenderModel.mlm_head)
    return logits, lp


def make_eval_step(model: LavenderModel, true_id: int, false_id: int,
                   pretext=None):
    """Jitted in-batch retrieval eval (Agent_Retrieval_MLM.step eval branch,
    main_retrieval_mlm.py:108-118): score every pair at the appended [MASK]
    (last position), rank texts per video."""

    @jax.jit
    def step(variables, img, txt, mask, vid):
        B = img.shape[0]
        fp, mp = common.apply_pretext(pretext, variables, B)
        logits, _ = pairwise_mlm_logits(model, variables, img, txt, mask,
                                        feat_pre=fp, mask_pre=mp,
                                        last_only=True)
        last = logits[:, -1, :].astype(jnp.float32)  # [B*B, V]
        p_true = last[:, true_id]
        p_false = last[:, false_id]
        score = (p_true / (p_true + p_false)).reshape(B, B)
        pred = jnp.argmax(score, axis=-1)
        gt = jnp.argmax(
            (vid[:, None] == vid[None, :]).astype(jnp.int32), axis=-1)
        return score, (pred == gt).astype(jnp.float32)

    return step


def make_loss_fn(model: LavenderModel, true_id: int, false_id: int,
                 pretext=None, group: int = 1):
    """Training loss (Agent_Retrieval_MLM.step train branch): CE at the
    appended [MASK] against true/false.  ``group`` = number of independent
    in-batch negative pools (the CLI passes the mesh's dp extent so each
    data shard pairs locally, = per-GPU DDP negatives)."""

    def loss_fn(params, batch, dropout_rng):
        img, txt, mask, vid = (batch["img"], batch["txt"], batch["mask"],
                               batch["vid"])
        B = img.shape[0]
        b = B // group
        rngs = {"dropout": dropout_rng}
        fp, mp = common.apply_pretext(pretext, {"params": params}, B,
                                      deterministic=False, rngs=rngs)
        logits, _ = pairwise_mlm_logits(
            model, {"params": params}, img, txt, mask, feat_pre=fp,
            mask_pre=mp, deterministic=False, rngs=rngs, group=group,
            last_only=True)
        gv = vid.reshape(group, b)
        same = gv[:, :, None] == gv[:, None, :]  # [G, b, b]
        labels = jnp.where(same, true_id, false_id).reshape(-1)
        last = logits[:, -1, :]
        return common.cross_entropy_ignore(last, labels)

    return loss_fn


def recall_at_k(score: np.ndarray, gt: np.ndarray,
                ks=(1, 5, 10)) -> Dict[str, float]:
    """Full-corpus retrieval metrics (eval_retrieval_mlm.py:220-241).

    score: [n_txt, n_vid] similarity; gt: [n_txt] index of the true video.
    """
    order = np.argsort(-score, axis=1)
    rank = np.empty(len(gt), dtype=np.int64)
    for i in range(len(gt)):
        rank[i] = int(np.where(order[i] == gt[i])[0][0])
    out = {f"R@{k}": float(np.mean(rank < k) * 100) for k in ks}
    out["MedR"] = float(np.median(rank + 1))
    return out
