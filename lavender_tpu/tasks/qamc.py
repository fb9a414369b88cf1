"""Multiple-choice video QA as MLM.

Reference: main_qamc_mlm.py (Dataset_QAMC_MLM:12, LAVENDER_QAMC_MLM:109,
Agent_QAMC_MLM:143).  The question and all options are concatenated with a
[MASK] whose position is configurable (append/prepend/insert/replace,
utils/args.py:175-178); the answer is the digit token "0".."size_option-1";
eval normalizes probabilities over the option-digit tokens.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from lavender_tpu.data.dataset import TsvTaskDataset
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import common


class QAMCDataset(TsvTaskDataset):
    mlm = True  # class default (subclasses/tests may bypass __init__)
    def __init__(self, cfg, tokzr, split, img_tsv_path, id2lineidx, txt,
                 mlm: bool = True, **kw):
        super().__init__(cfg, tokzr, split, img_tsv_path, id2lineidx, txt, **kw)
        # mlm=False: the task-specific classifier baseline — plain
        # tokenization, no inserted [MASK] (Dataset_QAMC_TS,
        # main_qamc_task_specific.py:12-65)
        self.mlm = mlm
        self.ans_tok_ids = tokzr.convert_tokens_to_ids(
            [f"{i}" for i in range(cfg.size_option)])

    @property
    def prompt_text(self):
        return ("which answer is correct, from "
                f"{list(range(self.cfg.size_option))}?")

    def str2txt(self, s):
        """Tokenize with the [MASK] placed per mask_pos
        (main_qamc_mlm.py:19-66)."""
        if not self.mlm:
            return TsvTaskDataset.str2txt(self, s)
        toks = self.tokzr.tokenize(s)[: self.cfg.size_txt - 1]
        padding = [self.tokzr.pad_token] * (self.cfg.size_txt - len(toks))
        tz = self.tokzr
        pos = self.cfg.mask_pos
        if pos == "append":
            toks = ([tz.cls_token] + toks + [tz.mask_token, tz.sep_token]
                    + padding)
        elif pos == "prepend":
            toks = ([tz.mask_token, tz.cls_token] + toks + [tz.sep_token]
                    + padding)
        elif pos == "replace":
            toks = [tz.mask_token] + toks + [tz.sep_token] + padding
        elif pos == "insert":
            base = [tz.cls_token] + toks + [tz.sep_token] + padding
            if len(base) < 10:
                toks = base + [tz.mask_token]
            else:
                toks = base[:10] + [tz.mask_token] + base[10:]
        else:
            raise ValueError(pos)
        ids = np.asarray(self.tokzr.convert_tokens_to_ids(toks), np.int32)
        mask = (ids != self.pad_token_id).astype(np.int32)
        return ids, mask

    def __getitem__(self, idx):
        item = self.txt[idx]
        img = self.get_video(item["video"])
        ans_idx = int(item["answer"])
        ans_tok = self.tokzr.convert_tokens_to_ids([f"{ans_idx}"])[0]
        q = item["question"]
        for i in range(self.cfg.size_option):
            q = self.concat_txt(q, f"option {i}: " + item[f"option_{i}"])
        txt, mask = self.str2txt(q)
        if not self.mlm:
            return {"img": self.pad_frames(img), "txt": txt, "mask": mask,
                    "ans": np.int32(ans_idx)}
        mask_ans = np.full(txt.shape, -1, np.int32)
        mask_ans[txt == self.mask_token_id] = ans_tok
        return {"img": self.pad_frames(img), "txt": txt, "mask": mask,
                "mask_ans": mask_ans, "ans_idx": np.int32(ans_idx)}


def make_eval_step(model: LavenderModel, ans_tok_ids: List[int],
                   pretext=None):
    """Eval: normalized probability over option digits at the [MASK]
    (main_qamc_mlm.py:159-170)."""
    ans_ids = jnp.asarray(ans_tok_ids)

    @jax.jit
    def step(variables, img, txt, mask, mask_ans, ans_idx):
        fp, mp = common.apply_pretext(pretext, variables, img.shape[0])
        logits, lp = common.fused_mlm_logits(model, variables, img, txt, mask,
                                             feat_pre=fp, mask_pre=mp)
        mask_ans = common.pad_labels_for_pretxt(mask_ans, lp)
        opt = logits[..., ans_ids].astype(jnp.float32)  # [B, Lp+Lt, n_opt]
        at_mask = (mask_ans != -1)[..., None]
        scores = jnp.sum(jnp.where(at_mask, opt, 0.0), axis=1)  # [B, n_opt]
        pred = jnp.argmax(scores, axis=-1)
        return scores, (pred == ans_idx).astype(jnp.float32)

    return step


def make_loss_fn(model: LavenderModel, pretext=None):
    def loss_fn(params, batch, dropout_rng):
        rngs = {"dropout": dropout_rng}
        fp, mp = common.apply_pretext(
            pretext, {"params": params}, batch["img"].shape[0],
            deterministic=False, rngs=rngs)
        logits, lp = common.fused_mlm_logits(
            model, {"params": params}, batch["img"], batch["txt"],
            batch["mask"], feat_pre=fp, mask_pre=mp, deterministic=False,
            rngs=rngs)
        labels = common.pad_labels_for_pretxt(batch["mask_ans"], lp)
        return common.cross_entropy_ignore(logits, labels)

    return loss_fn
