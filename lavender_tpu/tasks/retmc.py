"""Retrieval-style multiple choice (LSMDC-MC): each option scored
true/false at its own appended [MASK].

Reference: main_retmc_mlm.py (Dataset_RetMC_MLM:11, LAVENDER_RetMC_MLM:71,
Agent_RetMC_MLM:115).  The B x O option texts are flattened, video features
are broadcast per option, and each (video, option) pair gets a VTM
true/false prediction; eval picks the option with the highest p(true).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lavender_tpu.data.dataset import TsvTaskDataset
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import common


class RetMCDataset(TsvTaskDataset):
    mlm = True  # class default (subclasses/tests may bypass __init__)
    def __init__(self, cfg, tokzr, split, img_tsv_path, id2lineidx, txt,
                 mlm: bool = True, **kw):
        super().__init__(cfg, tokzr, split, img_tsv_path, id2lineidx, txt, **kw)
        # mlm=False: scalar-head baseline — no appended [MASK]
        # (Dataset_RetMC_TS, main_retmc_task_specific.py:12-39)
        self.mlm = mlm

    @property
    def prompt_text(self):
        return "is the video-text matched, true or false?"

    def str2txt(self, s):
        txt, mask = super().str2txt(s)
        if not self.mlm:
            return txt, mask
        return self.append_mask_tok2txt(txt, mask)

    def __getitem__(self, idx):
        item = self.txt[idx]
        img = self.get_video(item["video"])
        ans_idx = int(item["answer"])
        q = item.get("question", "")
        txts, masks, mask_ans = [], [], []
        for i in range(self.cfg.size_option):
            option = (q + " " + item[f"option_{i}"]) if q else item[f"option_{i}"]
            t, m = self.str2txt(option)
            ma = np.full(t.shape, -1, np.int32)
            ma[t == self.mask_token_id] = (
                self.true_token_id if i == ans_idx else self.false_token_id)
            txts.append(t), masks.append(m), mask_ans.append(ma)
        out = {"img": self.pad_frames(img),
               "txt": np.stack(txts), "mask": np.stack(masks),
               "mask_ans": np.stack(mask_ans), "ans_idx": np.int32(ans_idx)}
        if not self.mlm:
            out.pop("mask_ans")
            out["ans"] = out.pop("ans_idx")
        return out


class QAMCHeadDataset(RetMCDataset):
    """MC-QA scored per-option as VTM true/false: one (video, question +
    option) pair per option (Dataset_QAMC_MLM_Head,
    main_qamc_mlm_head.py:12-96; the README-recommended TGIF flow T10
    generates the digit instead — that is tasks/qamc.py).

    Reuses the RetMC machinery: QAMC items carry question + option_i, and
    the option text becomes "question option_i" with an appended [MASK].
    """

    def __getitem__(self, idx):
        item = dict(self.txt[idx])
        item.setdefault("question", item.get("question", ""))
        return super().__getitem__(idx)


def option_logits(model: LavenderModel, variables, img, txt, mask,
                  feat_pre=None, mask_pre=None,
                  deterministic=True, rngs=None, last_only=False):
    """img [B,T,S,S,3], txt/mask [B,O,L] -> logits [B*O, Lp+L, V].

    Mirrors LAVENDER_RetMC_MLM.forward (main_retmc_mlm.py:90-112): encode the
    video once, broadcast per option.  feat_pre/mask_pre (batch B*O) are
    prepended per flattened pair (prepro_txt_inputs, model.py:292-306).
    """
    B, O, L = txt.shape
    fi, mi, ft, mt = model.apply(
        variables, img, txt.reshape(B * O, L), mask.reshape(B * O, L),
        deterministic=deterministic, method=LavenderModel.go_feat, rngs=rngs)
    ft, mt, _ = common.prepend_pretxt(ft, mt, feat_pre, mask_pre)
    # go_feat encodes img at batch B; tile visual features per option
    Lv = fi.shape[1]
    fi = jnp.repeat(fi, O, axis=0)
    mi = jnp.repeat(mi, O, axis=0)
    out = model.apply(
        variables, fi, mi, ft, mt, deterministic=deterministic,
        method=LavenderModel.go_cross, rngs=rngs)
    hidden = out[:, -1:] if last_only else out[:, Lv:]
    return model.apply(variables, hidden, method=LavenderModel.mlm_head)


def make_eval_step(model: LavenderModel, true_id: int, false_id: int,
                   pretext=None):
    @jax.jit
    def step(variables, img, txt, mask, mask_ans, ans_idx):
        B, O, L = txt.shape
        fp, mp = common.apply_pretext(pretext, variables, B * O)
        logits = option_logits(model, variables, img, txt, mask,
                               feat_pre=fp, mask_pre=mp, last_only=True)
        last = logits[:, -1, :].astype(jnp.float32).reshape(B, O, -1)
        p_true = last[..., true_id]
        p_false = last[..., false_id]
        score = p_true / (p_true + p_false)
        pred = jnp.argmax(score, axis=-1)
        return score, (pred == ans_idx).astype(jnp.float32)

    return step


def make_loss_fn(model: LavenderModel, pretext=None):
    def loss_fn(params, batch, dropout_rng):
        txt = batch["txt"]
        B, O, L = txt.shape
        rngs = {"dropout": dropout_rng}
        fp, mp = common.apply_pretext(pretext, {"params": params}, B * O,
                                      deterministic=False, rngs=rngs)
        logits = option_logits(
            model, {"params": params}, batch["img"], txt, batch["mask"],
            feat_pre=fp, mask_pre=mp, deterministic=False, rngs=rngs)
        labels = batch["mask_ans"].reshape(B * O, L)
        lp = 0 if fp is None else fp.shape[1]
        labels = common.pad_labels_for_pretxt(labels, lp)
        return common.cross_entropy_ignore(logits, labels)

    return loss_fn
