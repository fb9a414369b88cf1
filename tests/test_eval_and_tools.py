"""Tests: two-phase full-corpus retrieval eval, composite caption dataset,
preprocessing tools, new samplers."""
import base64
import io
import json
import os.path as op
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavender_tpu.config import BertConfig, DataConfig, ModelConfig, SwinConfig
from lavender_tpu.data.loader import (
    DataLoader, IterationBasedBatchIter, LimitedSampler, NodeSplitSampler)
from lavender_tpu.data.tokenizer import BertTokenizer, build_test_vocab
from lavender_tpu.data.tsv import tsv_writer


def _jpeg_b64(rs, h=50, w=60):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray((rs.rand(h, w, 3) * 255).astype(np.uint8)).save(
        buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer(build_test_vocab())


@pytest.fixture(scope="module")
def tiny(tok):
    cfg = ModelConfig(
        swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                        num_heads=(2, 2, 2, 2), drop_path_rate=0.0),
        bert=BertConfig(vocab_size=len(tok), hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=64, max_position_embeddings=64))
    from lavender_tpu.models.lavender import LavenderModel
    model = LavenderModel(cfg)
    img = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((1, 9), jnp.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img, txt, jnp.ones((1, 9), jnp.int32))
    return model, variables


@pytest.fixture(scope="module")
def img_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("fc")
    rs = np.random.RandomState(0)
    rows = [[f"v{i}", "{}"] + [_jpeg_b64(rs) for _ in range(5)]
            for i in range(4)]
    tsv_writer(rows, str(d / "img_fc.tsv"))
    offsets = [int(l) for l in open(d / "img_fc.lineidx")]
    id2lineidx = {f"v{i}": offsets[i] for i in range(4)}
    return d, id2lineidx


def test_full_retrieval_eval(tok, tiny, img_data):
    from lavender_tpu.tasks import eval_retrieval as er
    d, id2lineidx = img_data
    model, variables = tiny
    cfg = DataConfig(size_img=64, size_frame=2, size_txt=8)
    txt = [{"video": f"v{i}", "caption": f"a dog is playing {i}"}
           for i in range(4)]
    ds = er.RetrievalEvalDataset(cfg, tok, "test", str(d / "img_fc.tsv"),
                                 id2lineidx, txt, multi_clip=True,
                                 max_clips=2)
    item = ds[0]
    assert item["img"].shape == (2, 2, 64, 64, 3)  # [clips, T, S, S, 3]
    res = er.full_retrieval_eval(model, variables, ds, batch_size=2,
                                 pair_batch=8)
    assert set(res) == {"R@1", "R@5", "R@10", "MedR"}
    assert 0.0 <= res["R@1"] <= 100.0
    assert res["R@5"] >= res["R@1"]


def test_composite_caption_dataset(tok, img_data, tmp_path):
    from lavender_tpu.data.composite import CompositeCaptionDataset
    d, _ = img_data
    cap_rows = [[f"v{i}", json.dumps([{"caption": f"a dog plays {i}"},
                                      {"caption": f"a cat sits {i}"}])]
                for i in range(4)]
    tsv_writer(cap_rows, str(tmp_path / "cap.tsv"))
    linelist = [[i, j] for i in range(4) for j in range(2)]
    with open(tmp_path / "cap.linelist.tsv", "w") as f:
        for r in linelist:
            f.write(f"{r[0]}\t{r[1]}\n")
    yml = {"img": str(d / "img_fc.tsv"), "caption": str(tmp_path / "cap.tsv"),
           "caption_linelist": str(tmp_path / "cap.linelist.tsv")}
    import yaml
    with open(tmp_path / "ds.yaml", "w") as f:
        yaml.safe_dump(yml, f)
    cfg = DataConfig(size_img=64, size_frame=2, size_txt=8)
    ds = CompositeCaptionDataset(cfg, tok, str(tmp_path / "ds.yaml"), "train")
    assert len(ds) == 8
    item = ds[3]
    assert item["img"].shape == (2, 64, 64, 3)
    assert item["vid"] == "v1"
    caps = ds.get_captions_by_key("v2")
    assert caps == ["a dog plays 2", "a cat sits 2"]


def test_tools_id2lineidx_and_visualize(img_data, tmp_path, capsys):
    from lavender_tpu.cli import tools
    d, id2lineidx = img_data
    out = str(tmp_path / "map.pkl")
    tools.main(["id2lineidx", "--tsv", str(d / "img_fc.tsv"),
                "--output", out])
    with open(out, "rb") as f:
        m = pickle.load(f)
    assert m == id2lineidx
    tools.main(["visualize", "--tsv", str(d / "img_fc.tsv"), "--row", "1",
                "--max-frames", "2",
                "--output-prefix", str(tmp_path / "f_")])
    assert op.exists(str(tmp_path / "f_v1_000.png"))


def test_tools_filter_videos(tmp_path):
    from lavender_tpu.cli import tools
    with open(tmp_path / "txt_a.json", "w") as f:
        json.dump({"train": [{"video": "x"}, {"video": "y"}],
                   "test": []}, f)
    with open(tmp_path / "txt_b.json", "w") as f:
        json.dump({"test": [{"video": "y"}]}, f)
    tools.main(["filter-videos", "--txt", str(tmp_path / "txt_a.json"),
                "--test-jsons", str(tmp_path / "txt_b.json"),
                "--output", str(tmp_path / "out.json")])
    with open(tmp_path / "out.json") as f:
        data = json.load(f)
    assert data["train"] == [{"video": "x"}]


def test_limited_and_nodesplit_samplers():
    s = LimitedSampler(100, shuffle=False, limited=10)
    assert len(s.indices()) == 10
    src = [0] * 5 + [1] * 5 + [2] * 5 + [3] * 5
    parts = []
    for rank in range(2):
        ns = NodeSplitSampler(src, shuffle=False, rank=rank, world=2)
        idx = ns.indices()
        # each host gets whole sources
        srcs = {src[i] for i in idx}
        parts.append(srcs)
        assert all(len([i for i in idx if src[i] == s_]) in (0, 5)
                   for s_ in range(4))
    assert parts[0] | parts[1] == {0, 1, 2, 3}
    assert not parts[0] & parts[1]


def test_iteration_based_iter():
    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

    dl = DataLoader(DS(), batch_size=2, shuffle=False, num_workers=1)
    it = IterationBasedBatchIter(dl, num_iters=7)
    batches = list(it)
    assert len(batches) == 7  # cycles past one epoch (3 batches/epoch)


def test_full_retrieval_eval_rerank(tok, tiny, img_data):
    """Two-tower prefilter + fusion rerank: full pipeline runs; with
    top-k == corpus size it matches the exhaustive scores."""
    from lavender_tpu.tasks import eval_retrieval as er
    d, id2lineidx = img_data
    model, variables = tiny
    cfg = DataConfig(size_img=64, size_frame=2, size_txt=8)
    txt = [{"video": f"v{i}", "caption": f"a dog is playing {i}"}
           for i in range(4)]
    ds = er.RetrievalEvalDataset(cfg, tok, "test", str(d / "img_fc.tsv"),
                                 id2lineidx, txt)
    full = er.full_retrieval_eval(model, variables, ds, batch_size=2,
                                  pair_batch=8)
    rr = er.full_retrieval_eval(model, variables, ds, batch_size=2,
                                pair_batch=8, rerank_top_k=2)
    assert set(rr) == set(full)
    # with k == n_v the rerank path reduces to exhaustive
    rr_full = er.full_retrieval_eval(model, variables, ds, batch_size=2,
                                     pair_batch=8, rerank_top_k=4)
    assert rr_full == full


def test_full_retrieval_eval_pretext(tok, tiny, img_data):
    """Feat-phase pretext injection (eval_retrieval_mlm.py:33-35): the
    two-phase eval with a task token must score pairs identically to the
    in-batch eval path given the same pretext — and differently from the
    no-pretext path."""
    import dataclasses
    from lavender_tpu.tasks import common, eval_retrieval as er, retrieval
    d, id2lineidx = img_data
    model, variables = tiny
    mcfg = dataclasses.replace(model.config, enable_task_token=True)
    cfg = DataConfig(size_img=64, size_frame=2, size_txt=8)
    txt = [{"video": f"v{i}", "caption": f"a dog is playing {i}"}
           for i in range(4)]
    ds = er.RetrievalEvalDataset(cfg, tok, "test", str(d / "img_fc.tsv"),
                                 id2lineidx, txt)
    pre = common.make_pretext_fn(model, mcfg, task_name="vtm")
    assert pre is not None

    def pair_scores(pretext):
        feat_fn = er.make_feat_fn(model, pretext=pretext)
        items = [ds[i] for i in range(4)]
        img = jnp.asarray(np.stack([it["img"] for it in items]))
        t = jnp.asarray(np.stack([it["txt"] for it in items]))
        m = jnp.asarray(np.stack([it["mask"] for it in items]))
        fi, mi, ft, mt = feat_fn(variables, img, t, m)
        scan_fn = er.make_cross_scan_fn(
            model, ds.true_token_id, ds.false_token_id)
        n = 4
        t_idx = np.repeat(np.arange(n), n).reshape(n, n)
        v_idx = np.tile(np.arange(n), n).reshape(n, n)
        return np.asarray(scan_fn(variables, fi, mi, ft, mt,
                                  jnp.asarray(t_idx),
                                  jnp.asarray(v_idx))).reshape(n, n)

    two_phase = pair_scores(pre)  # [text, video]
    base = pair_scores(None)
    assert not np.allclose(two_phase, base), \
        "task token had no effect on eval scores"

    # in-batch path with the same pretext (tasks/retrieval.make_eval_step)
    items = [ds[i] for i in range(4)]
    step = retrieval.make_eval_step(model, ds.true_token_id,
                                    ds.false_token_id, pretext=pre)
    score, _ = step(variables,
                    jnp.asarray(np.stack([it["img"][0] for it in items])),
                    jnp.asarray(np.stack([it["txt"] for it in items])),
                    jnp.asarray(np.stack([it["mask"] for it in items])),
                    jnp.arange(4))
    # step's score is [video, text]; the two-phase matrix is [text, video]
    np.testing.assert_allclose(two_phase, np.asarray(score).T,
                               rtol=2e-3, atol=2e-3)


def test_full_retrieval_eval_sharded_matches_unsharded(tok, tiny, img_data):
    """With a global (data, model) mesh installed, the cross phase shards
    each pair chunk over the data axis — metrics must equal the
    single-device run exactly (same pairs, same math, partitioned)."""
    from lavender_tpu.parallel import mesh as pmesh
    from lavender_tpu.tasks import eval_retrieval as er
    d, id2lineidx = img_data
    model, variables = tiny
    cfg = DataConfig(size_img=64, size_frame=2, size_txt=8)
    txt = [{"video": f"v{i}", "caption": f"a dog is playing {i}"}
           for i in range(4)]
    ds = er.RetrievalEvalDataset(cfg, tok, "test", str(d / "img_fc.tsv"),
                                 id2lineidx, txt)
    want = er.full_retrieval_eval(model, variables, ds, batch_size=2,
                                  pair_batch=8)
    mesh = pmesh.make_mesh()  # all 8 virtual CPU devices on the data axis
    pmesh.set_global_mesh(mesh)
    try:
        got = er.full_retrieval_eval(model, variables, ds, batch_size=2,
                                     pair_batch=8)
    finally:
        pmesh.set_global_mesh(None)
    assert got == want, (got, want)
