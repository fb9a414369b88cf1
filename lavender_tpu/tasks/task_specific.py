"""Task-specific-head baselines (the reference's *_task_specific family).

Reference: main_retrieval_task_specific.py (LAVENDER_Retrieval_TS:67-107 +
NormSoftmaxLoss agent), main_qamc_task_specific.py (LAVENDER_QAMC_TS:67-95),
main_qaoe_task_specific.py, main_retmc_task_specific.py
(LAVENDER_RetMC_TS:40-66), main_pretrain_task_specific.py
(LAVENDER_Pretrain:124-180).

Each variant adds a 2-layer MLP head ``fc`` over the fused text-CLS position
``out[:, Lv]`` instead of the unified MLM head.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lavender_tpu.models.heads import MLPHead
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import common

Array = jax.Array


class LavenderTS(LavenderModel):
    """LavenderModel + task-specific MLP head ``fc``.

    head_out: 1 for retrieval/retmc/pretrain-VTM, size_option for QAMC,
    size_vocab for QAOE.
    """

    head_out: int = 1

    def setup(self):
        super().setup()
        self.fc = MLPHead(self.config.hidden_size, self.head_out,
                          dtype=self.dtype, name="fc")

    def init_forward(self, img: Array, txt: Array, mask: Array) -> Array:
        """Init-time forward touching BOTH heads (flax creates params
        lazily, so ``model.init(..., method=LavenderTS.init_forward)``)."""
        logits = LavenderModel.__call__(self, img, txt, mask)
        _ = self.fc(jnp.zeros((1, self.config.hidden_size), self.dtype))
        return logits

    def cls_head(self, img: Array, txt: Array, mask: Array,
                 deterministic: bool = True) -> Array:
        """Fused forward -> head on the first text position (text CLS)."""
        B, T, H, W, _ = img.shape
        h, w = H // 32, W // 32
        fi, mi, ft, mt = self.go_feat(
            img, txt, mask, deterministic=deterministic)
        out = self.go_cross(fi, mi, ft, mt, deterministic=deterministic)
        return self.fc(out[:, (1 + h * w) * T],
                       deterministic=deterministic)


class LavenderMultiHead(LavenderTS):
    """Multi-task baseline with per-task heads ``fc_<task>`` plus the
    shared scalar retrieval/VTM head ``fc`` inherited from LavenderTS.

    Reference: main_multi_task_multi_head.py:80-105 — a scalar ``fc`` (:81)
    and one 2-layer MLP per dataset/task combo (``fc_<key>``, :87-105).
    heads: tuple of (name, out_dim); '-' in names becomes '_' like the
    reference's key_attr (:88).
    """

    heads: Tuple[Tuple[str, int], ...] = ()

    def setup(self):
        super().setup()
        self.fcs = {
            name: MLPHead(self.config.hidden_size, out,
                          dtype=self.dtype,
                          name=f"fc_{name.replace('-', '_')}")
            for name, out in self.heads}

    def init_forward(self, img: Array, txt: Array, mask: Array) -> Array:
        logits = LavenderTS.init_forward(self, img, txt, mask)
        z = jnp.zeros((1, self.config.hidden_size), self.dtype)
        for name, _ in self.heads:
            _ = self.fcs[name](z)
        return logits

    def head_forward(self, head: str, img: Array, txt: Array, mask: Array,
                     deterministic: bool = True) -> Array:
        B, T, H, W, _ = img.shape
        h, w = H // 32, W // 32
        fi, mi, ft, mt = self.go_feat(
            img, txt, mask, deterministic=deterministic)
        out = self.go_cross(fi, mi, ft, mt, deterministic=deterministic)
        return self.fcs[head](out[:, (1 + h * w) * T],
                              deterministic=deterministic)


def reinit_head(params: dict, hidden_size: int, head_out: int,
                seed: int = 0, name: str = "fc") -> dict:
    """Re-randomize a task head after a checkpoint load — the reference's
    ``model.reinit_head()`` (main_qaoe_task_specific.py:84-90,
    main_qamc_task_specific.py:92, main_retmc_task_specific.py:68; engaged
    by ``args.reinit_head``).  Only the *_task_specific classes define it
    in the reference (the MLM mains' call sites would crash — one of the
    documented breakages, SURVEY §1); here it applies to any MLPHead
    subtree by name."""
    fresh = MLPHead(hidden_size, head_out).init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, hidden_size), jnp.float32))["params"]
    out = dict(params)
    assert name in out, f"no head {name!r} in params"
    out[name] = fresh
    return out


def retrieval_ts_scores(model: LavenderTS, variables, img, txt, mask,
                        temp: float = 1.0, deterministic=True, rngs=None,
                        group: int = 1):
    """b x b scalar match matrix per batch group
    (LAVENDER_Retrieval_TS.forward:77-104).  group > 1 pairs within each
    of ``group`` sub-batches (per-data-shard DDP negatives, see
    tasks/retrieval.pairwise_mlm_logits); returns [group, b, b] then, or
    [B, B] for group=1."""
    B = img.shape[0]
    assert B % group == 0, (B, group)
    b = B // group
    fi, mi, ft, mt = model.apply(
        variables, img, txt, mask, deterministic=deterministic,
        method=LavenderModel.go_feat, rngs=rngs)
    Lv = fi.shape[1]

    def grouped_pairs(x, repeat_video: bool):
        g = x.reshape((group, b) + x.shape[1:])
        if repeat_video:
            g = jnp.repeat(g, b, axis=1)
        else:
            g = jnp.tile(g, (1, b) + (1,) * (x.ndim - 1))
        return g.reshape((B * b,) + x.shape[1:])

    pfi = grouped_pairs(fi, True)
    pmi = grouped_pairs(mi, True)
    pft = grouped_pairs(ft, False)
    pmt = grouped_pairs(mt, False)
    out = model.apply(
        variables, pfi, pmi, pft, pmt, deterministic=deterministic,
        method=LavenderModel.go_cross, rngs=rngs)
    score = model.apply(
        variables, out[:, Lv], deterministic,
        method=lambda m, x, d: m.fc(x, deterministic=d), rngs=rngs)
    if group == 1:
        return score.reshape(B, B) / temp
    return score.reshape(group, b, b) / temp


def make_retrieval_ts_loss(model: LavenderTS, temp: float, group: int = 1):
    """NormSoftmax InfoNCE over the (per-group) b x b matrix
    (agent.py:46-65)."""

    def loss_fn(params, batch, dropout_rng):
        score = retrieval_ts_scores(
            model, {"params": params}, batch["img"], batch["txt"],
            batch["mask"], deterministic=False,
            rngs={"dropout": dropout_rng}, group=group)
        if group == 1:
            return common.norm_softmax_loss(score, temp)
        losses = [common.norm_softmax_loss(score[g], temp)
                  for g in range(group)]
        return jnp.mean(jnp.stack(losses))

    return loss_fn


def make_retrieval_ts_eval(model: LavenderTS):
    @jax.jit
    def step(variables, img, txt, mask, vid):
        score = retrieval_ts_scores(model, variables, img, txt, mask)
        pred = jnp.argmax(score, axis=-1)
        gt = jnp.argmax((vid[:, None] == vid[None, :]).astype(jnp.int32),
                        axis=-1)
        return score, (pred == gt).astype(jnp.float32)

    return step


def make_cls_eval(model: LavenderTS):
    """QAMC/QAOE-style classification eval (argmax over head logits)."""

    @jax.jit
    def step(variables, img, txt, mask, ans):
        logits = model.apply(variables, img, txt, mask,
                             method=LavenderTS.cls_head)
        pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
        return logits, (pred == ans).astype(jnp.float32)

    return step


def make_cls_loss(model: LavenderTS):
    def loss_fn(params, batch, dropout_rng):
        logits = model.apply(
            {"params": params}, batch["img"], batch["txt"], batch["mask"],
            deterministic=False, rngs={"dropout": dropout_rng},
            method=LavenderTS.cls_head)
        return common.cross_entropy_ignore(logits, batch["ans"])

    return loss_fn


def retmc_ts_scores(model: LavenderTS, variables, img, txt, mask,
                    deterministic=True, rngs=None):
    """Per-option scalar scores (LAVENDER_RetMC_TS.forward:49-66)."""
    B, O, L = txt.shape
    fi, mi, ft, mt = model.apply(
        variables, img, txt.reshape(B * O, L), mask.reshape(B * O, L),
        deterministic=deterministic, method=LavenderModel.go_feat, rngs=rngs)
    Lv = fi.shape[1]
    fi = jnp.repeat(fi, O, axis=0)
    mi = jnp.repeat(mi, O, axis=0)
    out = model.apply(
        variables, fi, mi, ft, mt, deterministic=deterministic,
        method=LavenderModel.go_cross, rngs=rngs)
    score = model.apply(
        variables, out[:, Lv], deterministic,
        method=lambda m, x, d: m.fc(x, deterministic=d), rngs=rngs)
    return score.reshape(B, O)


def make_retmc_ts_eval(model: LavenderTS):
    @jax.jit
    def step(variables, img, txt, mask, ans):
        score = retmc_ts_scores(model, variables, img, txt, mask)
        pred = jnp.argmax(score, axis=-1)
        return score, (pred == ans).astype(jnp.float32)

    return step


def make_retmc_ts_loss(model: LavenderTS):
    def loss_fn(params, batch, dropout_rng):
        score = retmc_ts_scores(
            model, {"params": params}, batch["img"], batch["txt"],
            batch["mask"], deterministic=False,
            rngs={"dropout": dropout_rng})
        return common.cross_entropy_ignore(score, batch["ans"])

    return loss_fn


def make_multi_head_losses(model: LavenderMultiHead, temp: float,
                           kinds: dict, label_smoothing: float = 0.1,
                           group: int = 1):
    """Per-entry loss table for the multi-head baseline
    (main_multi_task_multi_head.py:110-242): retrieval entries use the
    shared scalar ``fc`` + NormSoftmax (:239-240); qamc/qaoe entries use
    their own ``fc_<name>`` head + CE (:241-242); captioning uses the MLM
    head + caption loss.

    kinds: entry name -> kind ("retrieval"|"qamc"|"qaoe"|"captioning").
    """
    from lavender_tpu.models.captioning import make_caption_loss_fn

    def make_head_cls_loss(name):
        def loss_fn(params, batch, dropout_rng):
            logits = model.apply(
                {"params": params}, name, batch["img"], batch["txt"],
                batch["mask"], deterministic=False,
                rngs={"dropout": dropout_rng},
                method=LavenderMultiHead.head_forward)
            return common.cross_entropy_ignore(logits, batch["ans"])
        return loss_fn

    losses = {}
    for name, kind in kinds.items():
        if kind == "retrieval":
            losses[name] = make_retrieval_ts_loss(model, temp,
                                                  group=group)
        elif kind == "captioning":
            losses[name] = make_caption_loss_fn(model, label_smoothing)
        else:  # qamc / qaoe classifier heads
            losses[name] = make_head_cls_loss(name)
    return losses


def make_head_cls_eval(model: LavenderMultiHead, name: str):
    """Eval for a per-dataset classifier head (argmax accuracy)."""

    @jax.jit
    def step(variables, img, txt, mask, ans):
        logits = model.apply(variables, name, img, txt, mask,
                             method=LavenderMultiHead.head_forward)
        pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
        valid = ans != -1
        return logits, jnp.where(valid, pred == ans, False).astype(
            jnp.float32)

    return step


def make_pretrain_ts_loss(model: LavenderTS, temp: float = 1.0,
                          vtm_batch: int = 4):
    """MLM (unified head) + scalar-VTM over 1 pos + O-1 negs
    (LAVENDER_Pretrain.forward, main_pretrain_task_specific.py:138-180)."""
    from lavender_tpu.tasks.pretrain import sample_negatives

    def loss_fn(params, batch, dropout_rng):
        variables = {"params": params}
        img, txt, mask = batch["img"], batch["txt"], batch["mask"]
        ans_mtm = batch["ans_mtm"]
        B = img.shape[0]
        O = min(B, vtm_batch)
        neg_key, drop_key = jax.random.split(dropout_rng)
        rngs = {"dropout": drop_key}
        fi, mi, ft, mt = model.apply(
            variables, img, txt, mask, deterministic=False,
            method=LavenderModel.go_feat, rngs=rngs)
        Lv = fi.shape[1]
        out = model.apply(variables, fi, mi, ft, mt, deterministic=False,
                          method=LavenderModel.go_cross, rngs=rngs)
        out_mtm = model.apply(variables, out[:, Lv:],
                              method=LavenderModel.mlm_head)
        ls_mtm = common.cross_entropy_ignore(out_mtm, ans_mtm)

        neg_idx = sample_negatives(neg_key, B, O - 1)
        pair_idx = jnp.concatenate(
            [jnp.arange(B, dtype=neg_idx.dtype)[:, None], neg_idx], axis=1)
        flat = pair_idx.reshape(-1)
        out = model.apply(
            variables, jnp.repeat(fi, O, axis=0), jnp.repeat(mi, O, axis=0),
            ft[flat], mt[flat], deterministic=False,
            method=LavenderModel.go_cross, rngs=rngs)
        score = model.apply(
            variables, out[:, Lv], False,
            method=lambda m, x, d: m.fc(x, deterministic=d), rngs=rngs)
        score = score.reshape(B, O) / temp
        ans_vtm = jnp.zeros((B,), jnp.int32)  # positive is column 0
        ls_vtm = common.cross_entropy_ignore(score, ans_vtm)
        return ls_mtm + ls_vtm, {"mtm": ls_mtm, "vtm": ls_vtm}

    return loss_fn
