"""End-to-end retrieval-MLM inference on the bundled 10-video MSRVTT TSV.

Exercises every layer once (SURVEY.md §7 step 5): TSV seek -> b64 JPEG decode
-> temporal sampling -> spatial transforms -> tokenization -> go_feat -> B x B
pair scoring -> in-batch accuracy + R@k.
"""
import os.path as op

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavender_tpu.config import BertConfig, DataConfig, ModelConfig, SwinConfig
from lavender_tpu.data.dataset import TsvTaskDataset
from lavender_tpu.data.loader import DataLoader
from lavender_tpu.data.tokenizer import BertTokenizer, build_test_vocab
from lavender_tpu.data.tsv import TSVFile
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.tasks import retrieval

MSRVTT_TSV = "/root/reference/_tools/msrvtt.tsv"

pytestmark = pytest.mark.skipif(
    not op.isfile(MSRVTT_TSV), reason="bundled sample TSV not present")


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer(build_test_vocab())


@pytest.fixture(scope="module")
def sample_data(tok):
    tsv = TSVFile(MSRVTT_TSV, generate_lineidx=False)
    with open(op.splitext(MSRVTT_TSV)[0] + ".lineidx") as f:
        offsets = [int(l) for l in f if l.strip()]
    keys = [tsv.seek(i)[0] for i in range(len(offsets))]
    id2lineidx = dict(zip(keys, offsets))
    captions = [
        "a man is talking about a video",
        "a woman is playing on the cat",
        "a dog is playing in the video",
        "a person is talking to a man",
        "the cat is playing on a dog",
        "a man is playing the dog video",
        "the woman is talking about text",
        "a person is playing a video",
        "the dog is talking to the cat",
        "a woman is talking about a dog",
    ]
    txt = [{"video": k, "caption": c} for k, c in zip(keys, captions)]
    return id2lineidx, txt, keys


@pytest.fixture(scope="module")
def model_and_params(tok):
    cfg = ModelConfig(
        swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 4, 8), window_size=(8, 7, 7),
                        drop_path_rate=0.0),
        bert=BertConfig(vocab_size=len(tok), hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=64, max_position_embeddings=64,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0))
    model = LavenderModel(cfg)
    img = jnp.zeros((1, 3, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((1, 11), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt,
                           jnp.ones((1, 11), jnp.int32))
    return model, variables


def test_dataset_decodes_frames(tok, sample_data):
    id2lineidx, txt, keys = sample_data
    cfg = DataConfig(size_img=64, size_frame=3, size_txt=10)
    ds = retrieval.RetrievalDataset(
        cfg, tok, "val", MSRVTT_TSV, id2lineidx, txt)
    item = ds[0]
    assert item["img"].shape == (3, 64, 64, 3)
    assert item["img"].dtype == np.uint8
    assert item["img"].max() > 0  # real JPEG content decoded
    assert item["txt"].shape == (11,)  # size_txt + appended [MASK]
    assert item["txt"][-1] == tok.mask_token_id


def test_e2e_inbatch_retrieval(tok, sample_data, model_and_params):
    from lavender_tpu.data.transforms import device_normalize
    id2lineidx, txt, keys = sample_data
    cfg = DataConfig(size_img=64, size_frame=3, size_txt=10)
    ds = retrieval.RetrievalDataset(
        cfg, tok, "val", MSRVTT_TSV, id2lineidx, txt)
    dl = DataLoader(ds, batch_size=5, shuffle=False, num_workers=2)
    model, variables = model_and_params
    step = retrieval.make_eval_step(
        model, ds.true_token_id, ds.false_token_id)

    accs, scores = [], []
    for batch in dl:
        img = device_normalize(jnp.asarray(batch["img"]))
        score, ac = step(variables, img, jnp.asarray(batch["txt"]),
                         jnp.asarray(batch["mask"]), jnp.asarray(batch["vid"]))
        assert score.shape == (5, 5)
        accs.extend(np.asarray(ac).tolist())
        scores.append(np.asarray(score))
    assert len(accs) == 10
    assert all(0.0 <= a <= 1.0 for a in accs)
    # determinism: same batch -> same scores
    for batch in dl:
        img = device_normalize(jnp.asarray(batch["img"]))
        score2, _ = step(variables, img, jnp.asarray(batch["txt"]),
                         jnp.asarray(batch["mask"]), jnp.asarray(batch["vid"]))
        np.testing.assert_allclose(np.asarray(score2), scores[0], rtol=1e-6)
        break


def test_recall_at_k():
    score = np.array([[0.9, 0.1], [0.2, 0.8]])
    m = retrieval.recall_at_k(score, np.array([0, 1]), ks=(1,))
    assert m["R@1"] == 100.0
    m2 = retrieval.recall_at_k(score, np.array([1, 0]), ks=(1,))
    assert m2["R@1"] == 0.0 and m2["MedR"] == 2.0
