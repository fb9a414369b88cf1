"""Two-phase full-corpus retrieval evaluation.

Reference: eval_retrieval_mlm.py (feat phase :152-183, Dataset_Product
:76-113, cross phase :195-218, metrics :220-241) and
eval_retrieval_task_specific.py (multi-clip sampling :24-58).

Phase 'feat' encodes every clip (multi-clip mean-pool) and every text once;
phase 'cross' scores all (text, video) pairs through the fusion encoder at
the appended [MASK].  Both phases are single jitted functions; the pair
product is batched host-side.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from lavender_tpu.data import transforms as TF
from lavender_tpu.data.dataset import TsvTaskDataset
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks.retrieval import recall_at_k

Array = jax.Array


class RetrievalEvalDataset(TsvTaskDataset):
    """Eval dataset: all (text, video) with multi-clip frame sampling.

    Reference: Dataset_RetrievalMlmEval (eval_retrieval_mlm.py:50-73) +
    get_clips_with_temporal_sampling (eval_retrieval_task_specific.py:24-58).
    """

    def __init__(self, cfg, tokzr, split, img_tsv_path, id2lineidx, txt,
                 multi_clip: bool = False, max_clips: int = 4, **kw):
        super().__init__(cfg, tokzr, split, img_tsv_path, id2lineidx, txt, **kw)
        self.multi_clip = multi_clip
        self.max_clips = max_clips
        self.gt_txt2vid = {i: item["video"] for i, item in enumerate(self.txt)}

    def str2txt(self, s):
        txt, mask = super().str2txt(s)
        return self.append_mask_tok2txt(txt, mask)

    @property
    def prompt_text(self):
        return "is the video-text paired, true or false?"

    def get_clips(self, video_id) -> np.ndarray:
        """uint8 [Clips, T, S, S, 3]."""
        row = self._tsv.seek_offset(self.id2lineidx[video_id])
        bufs = row[2:]
        if self.multi_clip:
            idx_sets = TF.multi_clip_indices(
                len(bufs), self.size_frame, self.max_clips)
        else:
            idx_sets = [TF.temporal_sample_indices(
                len(bufs), self.size_frame, False)]
        clips = []
        decoded = {}
        for idxs in idx_sets:
            frames = []
            for i in idxs:
                if i not in decoded:
                    decoded[i] = TF.str2img(bufs[i])
                frames.append(decoded[i])
            clip = TF.transform_clip(
                frames, self.cfg.size_img, self._eval_transform(), False)
            clips.append(self.pad_frames(clip))
        # pad clip count so batch shapes stay static
        while self.multi_clip and len(clips) < self.max_clips:
            clips.append(clips[-1])
        return np.stack(clips, axis=0)

    def __getitem__(self, idx):
        item = self.txt[idx]
        raw = item["caption"]
        if isinstance(raw, list):
            raw = " ".join(raw)
        txt, mask = self.str2txt(raw)
        return {"img": self.get_clips(item["video"]), "txt": txt,
                "mask": mask, "tid": idx, "vid": item["video"]}


def make_feat_fn(model: LavenderModel, pretext=None):
    """Phase 'feat': encode clips (mean-pooled) + text
    (LAVENDER_RetrievalMlmEval.forward typ='feat',
    eval_retrieval_mlm.py:21-37).

    ``pretext`` (a ``tasks.common.make_pretext_fn`` result) injects the
    prompt/task-token features into the cached text features, mirroring the
    reference's feat-phase ``prepro_txt_inputs`` call
    (eval_retrieval_mlm.py:33-35, model.py:292-306) — without it a
    task-token-finetuned checkpoint evaluates wrong.  The appended [MASK]
    stays the LAST text position, so the cross-phase score read is
    unchanged."""

    @jax.jit
    def feat_fn(variables, img, txt, mask):
        B, C, T, S, _, _ = img.shape
        fi, mi, ft, mt = model.apply(
            variables, img.reshape(B * C, T, S, S, 3), txt, mask,
            method=LavenderModel.go_feat)
        H = fi.shape[-1]
        fi = fi.reshape(B, C, -1, H).mean(axis=1)
        mi = mi.reshape(B, C, -1)[:, 0]
        if pretext is not None:
            from lavender_tpu.tasks import common
            feat_pre, mask_pre = common.apply_pretext(pretext, variables, B)
            ft, mt, _ = common.prepend_pretxt(ft, mt, feat_pre, mask_pre)
        return fi, mi, ft, mt

    return feat_fn


def _pair_score(model, variables, feat_img, mask_img, feat_txt, mask_txt,
                true_id: int, false_id: int, head: str):
    """Fuse one pair batch -> score: MLM p_true/(p_true+p_false) at the
    appended [MASK] (eval_retrieval_mlm.py:39-47) or the scalar match head
    (eval_retrieval_task_specific.py:39-47)."""
    Lv = feat_img.shape[1]
    out = model.apply(variables, feat_img, mask_img, feat_txt, mask_txt,
                      method=LavenderModel.go_cross)
    if head == "ts":
        score = model.apply(variables, out[:, Lv], True,
                            method=lambda m, x, d: m.fc(x, deterministic=d))
        return score.astype(jnp.float32)[:, 0]
    # head on the final ([MASK]) position only: the position slice
    # commutes with the head, and XLA does not DCE the unused positions
    # of a full-sequence vocab projection (see pairwise_mlm_logits)
    logits = model.apply(variables, out[:, -1:],
                         method=LavenderModel.mlm_head)
    last = logits[:, -1, :].astype(jnp.float32)
    p_true, p_false = last[:, true_id], last[:, false_id]
    return p_true / (p_true + p_false)


def make_cross_fn(model: LavenderModel, true_id: int, false_id: int,
                  mask_pos: int = -1, head: str = "mlm"):
    """Phase 'cross', one pair batch per device call (kept for tests /
    small corpora)."""

    @jax.jit
    def cross_fn(variables, feat_img, mask_img, feat_txt, mask_txt):
        return _pair_score(model, variables, feat_img, mask_img, feat_txt,
                           mask_txt, true_id, false_id, head)

    return cross_fn


def make_cross_scan_fn(model: LavenderModel, true_id: int, false_id: int,
                       head: str = "mlm"):
    """Phase 'cross' as ONE device call: ``lax.scan`` over pair chunks.

    The relay adds ~150 ms per device call; a 1k x 1k corpus at 64
    pairs/call is ~40 min of pure round-trips (round-1 weak #5).  Here the
    whole pair list rides one jit: cached features live on device and each
    scan step gathers its chunk.  Returns
    ``scan_fn(variables, FV, MV, FT, MT, t_idx [n,c], v_idx [n,c]) ->
    scores [n, c]``.
    """

    @jax.jit
    def scan_fn(variables, FV, MV, FT, MT, t_idx, v_idx):
        def body(_, tv):
            ti, vi = tv
            s = _pair_score(model, variables, FV[vi], MV[vi], FT[ti], MT[ti],
                            true_id, false_id, head)
            return None, s

        _, scores = jax.lax.scan(body, None, (t_idx, v_idx))
        return scores

    return scan_fn


def _shard_pair_chunks(t_idx, v_idx):
    """Under a global mesh, shard each scan chunk's PAIR axis over the
    data axis: every scan step then scores its chunk data-parallel across
    devices (the feature banks replicate; XLA partitions the gathered
    batch + fusion forward).  The reference parallelizes its full-corpus
    eval the same way, via single-node DataParallel
    (eval_retrieval_mlm.py:133).  No-op without a mesh or when the chunk
    width does not divide."""
    from lavender_tpu.parallel import mesh as pmesh
    mesh = pmesh.global_mesh()
    if mesh is None or mesh.devices.size == 1:
        return t_idx, v_idx
    from jax.sharding import NamedSharding, PartitionSpec as P
    dp = mesh.shape[pmesh.DATA_AXIS]
    if t_idx.shape[1] % dp != 0:
        return t_idx, v_idx
    sh = NamedSharding(mesh, P(None, pmesh.DATA_AXIS))
    return jax.device_put(t_idx, sh), jax.device_put(v_idx, sh)


def dual_encoder_scores(featv: Dict, featt: Dict, vids, tids) -> np.ndarray:
    """Cheap two-tower prefilter: cosine similarity between mean-pooled
    video tokens and mean-pooled text tokens.  Not in the reference — used
    to shortlist candidates before the expensive fusion pass."""

    def pool(feat, mask):
        m = mask.astype(np.float32)[..., None]
        return (feat * m).sum(0) / np.maximum(m.sum(0), 1.0)

    v = np.stack([pool(featv[x]["feat_img"], featv[x]["mask_img"])
                  for x in vids])
    t = np.stack([pool(featt[x]["feat_txt"], featt[x]["mask_txt"])
                  for x in tids])
    v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
    t = t / np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-6)
    return t @ v.T  # [n_t, n_v]


def full_retrieval_eval(model: LavenderModel, variables,
                        dataset: RetrievalEvalDataset,
                        batch_size: int = 16,
                        pair_batch: int = 64,
                        loader=None,
                        rerank_top_k: int = 0,
                        head: str = "mlm",
                        pretext=None) -> Dict[str, float]:
    """Run both phases and compute R@1/5/10 + MedR
    (eval_retrieval_mlm.py:138-241; head="ts" gives the scalar-head variant,
    eval_retrieval_task_specific.py:133-244).

    rerank_top_k > 0 enables the two-tower prefilter: only each text's top-k
    videos by pooled cosine go through the fusion scorer (the rest keep the
    prefilter score, offset below the fusion range).  Cuts the O(T*V) fusion
    cost to O(T*k); an explicit opt-in — the default (0) is the reference's
    full T x V product (eval_retrieval_mlm.py:184-218), because the
    two-tower and fusion rankings CAN disagree and the error is unbounded
    when the fusion scorer's true top-k falls outside the prefilter's
    shortlist (round-2 weak #3).

    The cross phase runs as ONE jitted ``lax.scan`` over pair chunks (one
    device call per corpus), not one call per chunk.
    """
    from lavender_tpu.data.loader import DataLoader
    feat_fn = make_feat_fn(model, pretext=pretext)
    dl = loader or DataLoader(dataset, batch_size, shuffle=False,
                              num_workers=4)

    # The feat phase runs the full Swin backbone once per clip: build the
    # serving rel-pos bias cache ONCE up front so every apply skips the
    # per-apply bias gather (round-4 profiled 2.2 ms/iter in-scan; the
    # cache removes even the pre-scan vmapped take).  Pure function of
    # params + fingerprint-guarded; harmless no-op off the wm path.
    try:
        from lavender_tpu.models import swin3d as _s3d
        mcfg = getattr(model, "cfg", None)
        if (mcfg is not None and _s3d._BIASHOIST and "cache" not in variables
                and _s3d.resolve_attn_impl(mcfg.swin.attn_impl) == "wm"):
            T, S = dataset.cfg.size_frame, dataset.cfg.size_img
            img0 = jnp.zeros((1, T, S, S, 3), jnp.dtype(mcfg.dtype))
            txt0 = jnp.zeros((1, 2), jnp.int32)
            msk0 = jnp.ones((1, 2), jnp.int32)
            variables = _s3d.build_serving_bias_cache(
                model, variables, img0, txt0, msk0,
                method=LavenderModel.go_feat)
            _s3d.check_serving_cache(variables)
    except Exception:
        pass

    def _shard_feat(*arrs):
        """Shard a feat-phase batch's leading axis over the mesh data axis
        (no-op without a mesh / non-dividing batch) — the Swin encode is
        the eval's FLOPs bulk for large corpora."""
        from lavender_tpu.parallel import mesh as pmesh
        mesh = pmesh.global_mesh()
        if mesh is None or mesh.devices.size == 1:
            return arrs
        dp = mesh.shape[pmesh.DATA_AXIS]
        if arrs[0].shape[0] % dp != 0:
            return arrs
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = lambda a: jax.device_put(a, NamedSharding(
            mesh, P(pmesh.DATA_AXIS, *([None] * (a.ndim - 1)))))
        return tuple(sh(a) for a in arrs)

    featv: Dict[str, Dict] = {}
    featt: Dict[int, Dict] = {}
    for batch in dl:
        img = TF.device_normalize(jnp.asarray(batch["img"]))
        img, txt_b, mask_b = _shard_feat(
            img, jnp.asarray(batch["txt"]), jnp.asarray(batch["mask"]))
        fi, mi, ft, mt = feat_fn(variables, img, txt_b, mask_b)
        fi, mi = np.asarray(fi), np.asarray(mi)
        ft, mt = np.asarray(ft), np.asarray(mt)
        for i, (tid, vid) in enumerate(zip(batch["tid"], batch["vid"])):
            if vid not in featv:
                featv[vid] = {"feat_img": fi[i], "mask_img": mi[i]}
            featt[int(tid)] = {"feat_txt": ft[i], "mask_txt": mt[i]}

    vids = list(featv.keys())
    vid2idx = {v: i for i, v in enumerate(vids)}
    tids = sorted(featt.keys())
    n_t, n_v = len(tids), len(vids)

    if rerank_top_k and rerank_top_k < n_v:
        pre = dual_encoder_scores(featv, featt, vids, tids)
        # prefilter scores land strictly below the fusion range [0, 1]
        score = (pre.astype(np.float32) - pre.max() - 1.0) * 1e-3
        top = np.argsort(-pre, axis=1)[:, :rerank_top_k]
        t_rows = np.repeat(np.arange(n_t), rerank_top_k)
        v_cols = top.reshape(-1)
    else:
        score = np.zeros((n_t, n_v), np.float32)
        t_rows = np.repeat(np.arange(n_t), n_v)
        v_cols = np.tile(np.arange(n_v), n_t)

    # device-resident feature banks + one scan over all pair chunks
    FV = jnp.asarray(np.stack([featv[v]["feat_img"] for v in vids]))
    MV = jnp.asarray(np.stack([featv[v]["mask_img"] for v in vids]))
    FT = jnp.asarray(np.stack([featt[t]["feat_txt"] for t in tids]))
    MT = jnp.asarray(np.stack([featt[t]["mask_txt"] for t in tids]))
    n_pairs = len(t_rows)
    n_chunks = (n_pairs + pair_batch - 1) // pair_batch
    pad = n_chunks * pair_batch - n_pairs
    t_idx = np.concatenate([t_rows, np.zeros(pad, np.int64)]).reshape(
        n_chunks, pair_batch)
    v_idx = np.concatenate([v_cols, np.zeros(pad, np.int64)]).reshape(
        n_chunks, pair_batch)
    scan_fn = make_cross_scan_fn(
        model, dataset.true_token_id, dataset.false_token_id, head=head)
    ti, vi = _shard_pair_chunks(jnp.asarray(t_idx), jnp.asarray(v_idx))
    s = np.asarray(scan_fn(variables, FV, MV, FT, MT, ti, vi))
    score[t_rows, v_cols] = s.reshape(-1)[:n_pairs]

    gt = np.asarray([vid2idx[dataset.gt_txt2vid[t]] for t in tids])
    return recall_at_k(score, gt)
