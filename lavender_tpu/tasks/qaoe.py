"""Open-ended video QA as MLM (+ LSMDC fill-in-blank variant).

Reference: main_qaoe_mlm.py (Dataset_QAOE_MLM:13), main_qaoe_mlm_lsmdc_fib.py
(LAVENDER_QAOE_MLM:64, Agent_QAOE_MLM_LSMDC:96 with get_top_k_acc:115), and
main_qaoe_task_specific.py (vocab-classifier baseline).

Text = question + "answer: [MASK]"; the answer token is drawn from the full
vocab (size_vocab == -1) or a dataset vocab remapped to tokens (LSMDC-FiB).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lavender_tpu.data.dataset import TsvTaskDataset
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import common


class QAOEDataset(TsvTaskDataset):
    """Dataset for open-ended QA-as-MLM (main_qaoe_mlm.py:13-88)."""
    mlm = True  # class default (subclasses/tests may bypass __init__)

    def __init__(self, cfg, tokzr, split, img_tsv_path, id2lineidx, txt,
                 label2ans: Optional[Dict] = None, mlm: bool = True, **kw):
        super().__init__(cfg, tokzr, split, img_tsv_path, id2lineidx, txt, **kw)
        # LSMDC-FiB: dataset 'answer' indexes a vocab remapped to tokens
        # (main_qaoe_mlm_lsmdc_fib.py:39-47)
        self.label2ans = label2ans
        # mlm=False: the size_vocab classifier baseline — plain question
        # tokenization, 'answer' as class index (Dataset_QAOE_TS,
        # main_qaoe_task_specific.py:12-62)
        self.mlm = mlm

    @property
    def prompt_text(self):
        return "answer the question about the video."

    def str2txt(self, s):
        """question + 'answer: [MASK]' + [SEP] (main_qaoe_mlm.py:22-39)."""
        toks = self.tokzr.tokenize(s)[: self.cfg.size_txt - 1]
        padding = [self.tokzr.pad_token] * (self.cfg.size_txt - len(toks))
        tz = self.tokzr
        toks = ([tz.cls_token] + toks
                + tz.tokenize("answer:") + [tz.mask_token]
                + [tz.sep_token] + padding)
        ids = np.asarray(tz.convert_tokens_to_ids(toks), np.int32)
        mask = (ids != self.pad_token_id).astype(np.int32)
        return ids, mask

    def answer_token_id(self, item) -> int:
        if self.cfg.size_vocab > 0:
            return int(item["answer"])
        if self.label2ans is not None:
            ans = self.label2ans[item["answer"]]
        else:
            ans = item["answer_text"]
        tid = self.tokzr.convert_tokens_to_ids([ans])[0]
        return -1 if tid == self.unk_token_id else tid

    def __getitem__(self, idx):
        item = self.txt[idx]
        vid = item["video"]
        img = self.get_video(vid)
        if not self.mlm:
            txt, mask = TsvTaskDataset.str2txt(self, item["question"])
            ans = int(item["answer"]) if self.has_video(vid) else -1
            return {"img": self.pad_frames(img), "txt": txt, "mask": mask,
                    "ans": np.int32(ans)}
        if "question" in item:
            txt, mask = self.str2txt(item["question"])
        else:  # LSMDC FiB: the [MASK] is already in the sentence
            txt, mask = TsvTaskDataset.str2txt(self, item["sentence"])
        ans_id = self.answer_token_id(item)
        if not self.has_video(vid):
            ans_id = -1  # missing video: don't count (main_qaoe_mlm.py:70-72)
        mask_ans = np.full(txt.shape, -1, np.int32)
        mask_ans[txt == self.mask_token_id] = ans_id
        return {"img": self.pad_frames(img), "txt": txt, "mask": mask,
                "mask_ans": mask_ans}


class QAOEFibDataset(QAOEDataset):
    """LSMDC fill-in-blank: the [MASK] is embedded in 'question' text
    (main_qaoe_mlm_lsmdc_fib.py:21-48)."""

    @property
    def prompt_text(self):
        return "fill in the mask to complete the sentence."

    def str2txt(self, s):
        # plain padded tokenization; the mask token comes with the sentence
        s = s.replace("[MASK]", self.tokzr.mask_token)
        return TsvTaskDataset.str2txt(self, s)


def make_eval_step(model: LavenderModel, topk: int = 5, pretext=None):
    """Top-1/top-5 accuracy at the masked position
    (main_qaoe_mlm_lsmdc_fib.py:115-126)."""

    @jax.jit
    def step(variables, img, txt, mask, mask_ans):
        fp, mp = common.apply_pretext(pretext, variables, img.shape[0])
        logits, lp = common.fused_mlm_logits(model, variables, img, txt, mask,
                                             feat_pre=fp, mask_pre=mp)
        logits = logits.astype(jnp.float32)
        mask_ans = common.pad_labels_for_pretxt(mask_ans, lp)
        at = mask_ans != -1  # [B, Lp+Lt]
        # single masked position per row: gather its logits
        pos = jnp.argmax(at.astype(jnp.int32), axis=1)  # [B]
        row_logits = jnp.take_along_axis(
            logits, pos[:, None, None], axis=1)[:, 0]  # [B, V]
        ans = jnp.take_along_axis(mask_ans, pos[:, None], axis=1)[:, 0]
        _, top_i = jax.lax.top_k(row_logits, topk)
        hit = top_i == ans[:, None]
        valid = ans != -1
        ac1 = jnp.where(valid, hit[:, :1].any(axis=1), False)
        ack = jnp.where(valid, hit.any(axis=1), False)
        return ac1.astype(jnp.float32), ack.astype(jnp.float32), valid

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
