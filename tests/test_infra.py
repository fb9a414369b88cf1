"""Infrastructure tests: checkpointing, metrics, TSV round-trips, tokenizer,
loader, task-specific heads, converter head rules.
"""
import os.path as op

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavender_tpu.config import BertConfig, ModelConfig, SwinConfig, TrainConfig
from lavender_tpu.data.loader import DataLoader, MetaLoader, ShardedSampler
from lavender_tpu.data.tokenizer import BertTokenizer, build_test_vocab
from lavender_tpu.data.tsv import TSVFile, create_lineidx, tsv_writer, tsv_reader
from lavender_tpu.utils import metrics


def test_tsv_roundtrip(tmp_path):
    rows = [["key%d" % i, "meta", "payload-%d" % i] for i in range(7)]
    path = str(tmp_path / "x.tsv")
    tsv_writer(rows, path)
    tsv = TSVFile(path)
    assert tsv.num_rows() == 7
    assert tsv[3] == rows[3]
    assert tsv.get_key(6) == "key6"
    # .lineidx.8b sidecar: little-endian uint64 offsets matching .lineidx
    # (utils/tsv_file_ops.py:36-69)
    import numpy as np
    with open(str(tmp_path / "x.lineidx")) as f:
        offs = [int(l) for l in f if l.strip()]
    raw = np.fromfile(str(tmp_path / "x.lineidx.8b"), dtype="<u8")
    assert raw.tolist() == offs
    # lineidx regeneration
    import os
    os.remove(str(tmp_path / "x.lineidx"))
    tsv2 = TSVFile(path)
    assert tsv2[5] == rows[5]


def test_tokenizer_wordpiece():
    tok = BertTokenizer(build_test_vocab(["play", "##ground"]))
    assert tok.tokenize("playground") == ["play", "##ground"]
    assert tok.tokenize("Playing") == ["playing"]  # whole word in vocab wins
    assert tok.tokenize("dogs") == ["dog", "##s"]
    ids = tok.encode("a dog playing", padding="max_length", max_length=10,
                     truncation=True)
    assert len(ids) == 10
    assert ids[0] == tok.cls_token_id
    assert tok.sep_token_id in ids
    # truncation keeps [SEP]
    ids2 = tok.encode("a dog " * 50, padding="max_length", max_length=8,
                      truncation=True)
    assert len(ids2) == 8 and ids2[-1] == tok.sep_token_id
    assert tok.decode(ids).startswith("a dog play")


def test_sharded_sampler_covers_all():
    all_idx = []
    for rank in range(4):
        s = ShardedSampler(10, shuffle=True, seed=1, rank=rank, world=4)
        all_idx.extend(s.indices())
    assert set(all_idx) == set(range(10))
    assert len(all_idx) == 12  # padded to equal shards


def test_metaloader_deterministic_across_hosts():
    class FakeDL:
        def __init__(self, n):
            self.n = n

        def __iter__(self):
            return iter({"x": np.zeros(1)} for _ in range(self.n))

    seqs = []
    for host in range(2):
        ml = MetaLoader({"a": FakeDL(3), "b": FakeDL(2)},
                        ratios={"a": 2, "b": 1}, seed=7)
        it = iter(ml)
        seqs.append([next(it)[0] for _ in range(20)])
    assert seqs[0] == seqs[1]
    assert set(seqs[0]) == {"a", "b"}


def test_orbax_roundtrip(tmp_path):
    from lavender_tpu.train import checkpoint as ckpt
    params = {"a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
              "b": np.ones((4,), np.float32)}
    path = str(tmp_path / "ck1")
    ckpt.save_params(params, path)
    restored = ckpt.load_params(path, like=params)
    np.testing.assert_array_equal(restored["a"]["w"], params["a"]["w"])


def test_train_state_resume(tmp_path):
    import optax
    from lavender_tpu.train import checkpoint as ckpt
    from lavender_tpu.train.trainer import TrainState, create_train_state
    params = {"w": jnp.ones((3,))}
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, seed=0)
    state = state.replace(step=jnp.asarray(5, jnp.int32))
    path = str(tmp_path / "ck2")
    ckpt.save_train_state(state, path)
    restored = ckpt.restore_train_state(path, create_train_state(params, tx))
    assert int(restored.step) == 5


def test_trainer_import_no_global_prng_side_effect():
    """Round-5 advisor fix: importing the train package must NOT flip the
    process-global default PRNG impl (the round-4 LVT_RBG flag did, via
    jax.config.update at import).  The rbg impl is now scoped to the train
    dropout stream through typed keys."""
    import lavender_tpu.train.trainer  # noqa: F401 — the import IS the test
    assert jax.config.jax_default_prng_impl == "threefry2x32"
    # raw PRNGKey semantics untouched: threefry key data is (2,) uint32
    assert jax.random.PRNGKey(0).shape == (2,)


def test_train_step_rng_impl_scoped():
    """The train step wraps TrainState.rng with the train impl and stores
    raw key data back — the stream advances and keeps its shape."""
    import optax
    from lavender_tpu.train import trainer
    params = {"w": jnp.ones((4,))}
    tx = optax.sgd(1e-2)
    state = trainer.create_train_state(params, tx, seed=3)
    expected = jax.random.key_data(
        jax.random.key(0, impl=trainer.TRAIN_PRNG_IMPL)).shape
    assert state.rng.shape == expected

    def loss_fn(p, batch, rng):
        # consume the typed key the way the tasks do (split + bernoulli)
        k1, _ = jax.random.split(rng)
        mask = jax.random.bernoulli(k1, 0.5, (4,))
        return jnp.sum(p["w"] * batch["x"] * mask)

    step = trainer.make_train_step(loss_fn, tx, mesh=None, donate=False)
    new_state, loss = step(state, {"x": jnp.ones((4,))})
    assert new_state.rng.shape == expected
    assert not np.array_equal(np.asarray(new_state.rng),
                              np.asarray(state.rng))
    assert np.isfinite(float(loss))


def test_train_state_resume_cross_impl(tmp_path):
    """A checkpoint whose rng was saved under a different PRNG impl (e.g.
    LVT_RBG flipped between save and resume) restores instead of erroring:
    everything but the rng round-trips, the rng is re-seeded for the new
    impl (advisor round-4 medium)."""
    import optax
    from lavender_tpu.train import checkpoint as ckpt
    from lavender_tpu.train import trainer
    params = {"w": jnp.full((3,), 2.0)}
    tx = optax.adam(1e-3)
    state = trainer.create_train_state(params, tx, seed=0)
    like = trainer.create_train_state(params, tx, seed=1)
    # simulate the OTHER impl's key data shape ((2,) vs rbg's (4,))
    other = (2,) if state.rng.shape == (4,) else (4,)
    state = state.replace(step=jnp.asarray(7, jnp.int32),
                          rng=jnp.arange(other[0], dtype=jnp.uint32))
    path = str(tmp_path / "ck_ximpl")
    ckpt.save_train_state(state, path)
    restored = ckpt.restore_train_state(path, like)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    assert restored.rng.shape == like.rng.shape


def test_caption_metrics_perfect_match():
    # two disjoint-vocab items so idf is non-degenerate (CIDEr is 0 by
    # construction on a 1-image corpus)
    cands = {"a": "man plays shiny guitar", "b": "dog runs across park"}
    refs = {"a": ["man plays shiny guitar"], "b": ["dog runs across park"]}
    m = metrics.coco_caption_metrics(cands, refs)
    assert m["Bleu_4"] == pytest.approx(1.0)
    assert m["ROUGE_L"] == pytest.approx(1.0)
    assert m["CIDEr"] == pytest.approx(10.0, abs=1e-6)


def test_caption_metrics_orderings():
    refs = {"a": ["a man is playing a guitar on stage"],
            "b": ["a dog runs fast in the park"]}
    good = {"a": "a man is playing a guitar", "b": "a dog runs in the park"}
    bad = {"a": "cat cat cat", "b": "tree tree tree"}
    mg = metrics.coco_caption_metrics(good, refs)
    mb = metrics.coco_caption_metrics(bad, refs)
    for k in ("Bleu_4", "CIDEr", "ROUGE_L"):
        assert mg[k] > mb[k]


def test_converter_sequential_head_rule():
    torch = pytest.importorskip("torch")
    from lavender_tpu.convert import convert_state_dict
    seq = torch.nn.Sequential(
        torch.nn.Dropout(0.1), torch.nn.Linear(4, 8),
        torch.nn.ReLU(), torch.nn.Linear(8, 2))
    sd = {f"fc.{k}": v for k, v in seq.state_dict().items()}
    tree = convert_state_dict(sd)
    assert tree["fc"]["fc1"]["kernel"].shape == (4, 8)
    assert tree["fc"]["fc2"]["kernel"].shape == (8, 2)


def test_task_specific_heads():
    from lavender_tpu.tasks import task_specific as ts
    cfg = ModelConfig(
        swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                        num_heads=(2, 2, 2, 2), drop_path_rate=0.0),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64))
    model = ts.LavenderTS(cfg, head_out=5)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 2, 64, 64, 3), jnp.float32)
    txt = jnp.asarray(rs.randint(5, 60, (2, 7)), jnp.int32)
    mask = jnp.ones((2, 7), jnp.int32)
    variables = jax.jit(lambda r, i, t, m: model.init(
        r, i, t, m, method=ts.LavenderTS.init_forward))(
        jax.random.PRNGKey(0), img, txt, mask)
    assert "fc" in variables["params"]
    step = ts.make_cls_eval(model)
    logits, ac = step(variables, img, txt, mask, jnp.asarray([1, 2]))
    assert logits.shape == (2, 5)
    loss = ts.make_cls_loss(model)(
        variables["params"],
        {"img": img, "txt": txt, "mask": mask, "ans": jnp.asarray([1, 2])},
        jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # retrieval-TS InfoNCE
    model1 = ts.LavenderTS(cfg, head_out=1)
    v1 = jax.jit(lambda r, i, t, m: model1.init(
        r, i, t, m, method=ts.LavenderTS.init_forward))(
        jax.random.PRNGKey(0), img, txt, mask)
    score = ts.retrieval_ts_scores(model1, v1, img, txt, mask)
    assert score.shape == (2, 2)
    l = ts.make_retrieval_ts_loss(model1, temp=0.05)(
        v1["params"], {"img": img, "txt": txt, "mask": mask},
        jax.random.PRNGKey(2))
    assert np.isfinite(float(l))

    # pretrain-TS combined loss
    ans_mtm = np.full((2, 7), -1, np.int32)
    ans_mtm[:, 2] = 9
    lp = ts.make_pretrain_ts_loss(model1, temp=1.0, vtm_batch=2)(
        v1["params"],
        {"img": img, "txt": txt, "mask": mask, "ans_mtm": jnp.asarray(ans_mtm)},
        jax.random.PRNGKey(3))
    loss, aux = lp
    assert np.isfinite(float(loss))


def test_tsv_thread_safety(tmp_path):
    """Concurrent seeks from many threads must read the right rows (the
    loader's thread pool shares one dataset; regression for a seek race)."""
    from concurrent.futures import ThreadPoolExecutor
    rows = [[f"k{i}", "m", "x" * (i % 50 + 1)] for i in range(200)]
    path = str(tmp_path / "race.tsv")
    tsv_writer(rows, path)
    tsv = TSVFile(path)

    def read_many(seed):
        import random as rnd
        r = rnd.Random(seed)
        for _ in range(300):
            i = r.randrange(200)
            row = tsv.seek(i)
            assert row[0] == f"k{i}", (i, row[0])
        return True

    with ThreadPoolExecutor(8) as pool:
        assert all(pool.map(read_many, range(8)))


def test_swinbert_key_remap():
    from lavender_tpu.convert import remap_swinbert_keys
    sd = {
        "swin.backbone.patch_embed.proj.weight": 1,
        "trans_encoder.bert.encoder.layer.0.attention.self.query.weight": 2,
        "trans_encoder.bert.embeddings.word_embeddings.weight": 3,
        "trans_encoder.bert.img_embedding.weight": 4,
        "trans_encoder.cls.predictions.bias": 5,
        "fc.weight": 6,
        "unrelated.thing": 7,
    }
    out = remap_swinbert_keys(sd)
    assert out["enc_img.swin.patch_embed.proj.weight"] == 1
    assert out["trsfr.layer.0.attention.self.query.weight"] == 2
    assert out["enc_txt.emb_txt.word_embeddings.weight"] == 3
    assert out["enc_img.img_embedding.weight"] == 4
    assert out["fc_mtm.predictions.bias"] == 5
    assert out["fc_mtm.predictions.decoder.bias"] == 5  # faked tied bias
    assert out["enc_img.fc.weight"] == 6
    assert "unrelated.thing" not in out


def test_match_scan_layout_pt_import():
    """A per-block converted .pt tree loads correctly into a scan-layout
    (default) model: match_scan_layout restacks, merge_params overlays, and
    the scan model reproduces the per-block model's forward."""
    import dataclasses
    from lavender_tpu.convert import match_scan_layout, merge_params
    from lavender_tpu.models.swin3d import VideoSwin3D
    cfg = SwinConfig(embed_dim=8, depths=(2, 2), num_heads=(2, 2),
                     window_size=(8, 7, 7), drop_path_rate=0.0,
                     scan_blocks=False)
    x = jnp.asarray(np.random.RandomState(0).randn(
        1, 2, 14, 14, 3).astype(np.float32))
    m_pb = VideoSwin3D(cfg)
    v_pb = m_pb.init(jax.random.PRNGKey(1), x)
    m_scan = VideoSwin3D(dataclasses.replace(cfg, scan_blocks=True))
    v_scan = m_scan.init(jax.random.PRNGKey(2), x)
    # wrap both as full LAVENDER trees (match_scan_layout keys on enc_img)
    init = {"enc_img": {"swin": v_scan["params"]}}
    loaded = {"enc_img": {"swin": v_pb["params"]}}
    merged = merge_params(init, match_scan_layout(loaded, init))
    y_pb = m_pb.apply(v_pb, x)
    y_scan = m_scan.apply({"params": merged["enc_img"]["swin"]}, x)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_pb),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(not op.isdir("/root/reference/_args"),
                    reason="reference configs not mounted")
def test_reference_arg_configs_parse():
    """All 19 reference _args/*.json recipes load through load_run_config."""
    import glob
    from lavender_tpu.config import load_run_config
    paths = sorted(glob.glob("/root/reference/_args/*.json"))
    assert len(paths) >= 19
    for p in paths:
        cfg = load_run_config(p)
        assert cfg.data.size_img in (224, 384)
        assert cfg.train.size_batch > 0
    cfg = load_run_config("/root/reference/_args/args_msrvtt-retrieval.json")
    assert cfg.task_type == "retrieval"
    assert cfg.data.dataset == "msrvtt"
    assert cfg.data.size_frame == 5
    assert cfg.train.lr == 2e-5
    assert cfg.vis_backbone_size == "base"
    assert cfg.model.swin.embed_dim == 128  # base preset


def test_enc_txt_full_encoder():
    """txt_backbone_embed_only=False path: full BERT over text with
    full/seq2seq masks (model.py:104-142)."""
    import dataclasses
    import jax
    from lavender_tpu.config import BertConfig, ModelConfig, SwinConfig
    from lavender_tpu.models.lavender import EncTxt
    cfg = ModelConfig(
        swin=SwinConfig(embed_dim=8, depths=(1,), num_heads=(2,)),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0),
        txt_backbone_embed_only=False)
    m = EncTxt(cfg)
    txt = jnp.asarray(np.random.RandomState(0).randint(3, 60, (2, 7)),
                      jnp.int32)
    mask = jnp.ones((2, 7), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), txt, mask)
    assert "txt_trsfr" in v["params"]
    out_full = m.apply(v, txt, mask)
    out_s2s = m.apply(v, txt, mask, attn_mask_type="seq2seq")
    assert out_full.shape == (2, 7, 32)
    # causal masking changes non-final positions
    assert not np.allclose(np.asarray(out_full[:, 0]),
                           np.asarray(out_s2s[:, 0]), atol=1e-5)


def test_agent_full_resume(tmp_path):
    """Agent.save_state/maybe_resume round-trips optimizer state + step."""
    import jax as _jax
    from lavender_tpu.config import RunConfig
    from lavender_tpu.models.lavender import LavenderModel
    from lavender_tpu.tasks import retrieval as ret
    cfg = ModelConfig(
        swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                        num_heads=(2, 2, 2, 2), drop_path_rate=0.0),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64))
    model = LavenderModel(cfg)
    img = jnp.zeros((2, 2, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((2, 7), jnp.int32)
    mask = jnp.ones((2, 7), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, txt, mask)
    run_cfg = RunConfig()
    run_cfg.train.max_iter = 10
    from lavender_tpu.train.agent import Agent
    agent = Agent(run_cfg, model, variables,
                  loss_fn=ret.make_loss_fn(model, 5, 6))
    batch = {"img": img, "txt": txt, "mask": mask,
             "vid": jnp.arange(2, dtype=jnp.int32)}
    agent.state, _ = agent.train_step(agent.state, batch)
    agent.state, _ = agent.train_step(agent.state, batch)
    path = str(tmp_path / "resume_ck")
    agent.save_state(path)

    # re-init: agent1's donated train steps consumed the original buffers
    variables2 = jax.jit(model.init)(jax.random.PRNGKey(1), img, txt, mask)
    agent2 = Agent(run_cfg, model, variables2,
                   loss_fn=ret.make_loss_fn(model, 5, 6))
    assert agent2.maybe_resume(path)
    assert int(agent2.state.step) == 2
    w1 = jax.tree_util.tree_leaves(agent.state.params)[0]
    w2 = jax.tree_util.tree_leaves(agent2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert not agent2.maybe_resume(str(tmp_path / "nope"))


def test_device_prefetch():
    from lavender_tpu.data.loader import device_prefetch
    calls = []

    def to_dev(x):
        calls.append(x)
        return x * 10

    out = list(device_prefetch(iter([1, 2, 3, 4]), to_dev, depth=2))
    assert out == [10, 20, 30, 40]
    assert calls == [1, 2, 3, 4]
    assert list(device_prefetch(iter([]), to_dev, depth=2)) == []
    assert list(device_prefetch(iter([7]), to_dev, depth=3)) == [70]


def test_merge_params_truncate_pad():
    """Tolerant checkpoint merge (model.py:370-429): prefix-slice copy for
    emb truncate/pad, keep-init on incompatible shapes."""
    from lavender_tpu.convert import merge_params
    init = {"a": np.zeros((4, 6), np.float32),
            "b": {"c": np.zeros((3,), np.float32)},
            "d": np.zeros((2, 2), np.float32)}
    loaded = {"a": np.ones((2, 6), np.float32),          # prefix slice
              "b": {"c": np.ones((3,), np.float32)},     # exact
              "d": np.ones((5, 5), np.float32)}          # incompatible
    out = merge_params(init, loaded)
    assert out["a"][:2].sum() == 12 and out["a"][2:].sum() == 0
    assert out["b"]["c"].sum() == 3
    assert out["d"].sum() == 0  # kept init


def test_ckpt_args_inheritance(tmp_path):
    """Finetune/eval recipes inherit architecture keys from the checkpoint's
    training args.json (utils/args.py:245-293)."""
    import json
    from lavender_tpu.config import load_run_config
    ckpt_dir = tmp_path / "run"
    ckpt_dir.mkdir()
    with open(ckpt_dir / "args.json", "w") as f:
        json.dump({"vis_backbone_size": "tiny", "swinbert": True,
                   "size_img": 192, "size_txt": 30,
                   "swin": {"embed_dim": 96, "depths": [2, 2, 6, 2],
                            "num_heads": [3, 6, 12, 24]}}, f)
    ckpt = ckpt_dir / "ckpt_model_1.pt"
    ckpt.write_bytes(b"")

    # training run (size_epoch > 0): inherits architecture, keeps own shapes
    cfg = load_run_config({"path_ckpt": str(ckpt), "size_img": 224,
                           "size_epoch": 5})
    assert cfg.vis_backbone_size == "tiny"
    assert cfg.model.swinbert is True
    assert cfg.model.swin.embed_dim == 96
    assert cfg.data.size_img == 224  # own shapes win while training

    # eval-only run (size_epoch == 0): also inherits the input shapes
    cfg = load_run_config({"path_ckpt": str(ckpt), "size_img": 224,
                           "size_epoch": 0})
    assert cfg.data.size_img == 192
    assert cfg.data.size_txt == 30

    # no args.json next to the ckpt -> untouched
    cfg = load_run_config({"path_ckpt": str(tmp_path / "none.pt"),
                           "size_img": 224})
    assert cfg.data.size_img == 224


def test_tensorboard_logger_wire_format(tmp_path):
    """The dependency-free event writer produces valid TFRecord framing
    (masked crc32c on header and payload) and scalar Event protos a
    minimal parser can read back (reference analog: utils/logger.py:119)."""
    import struct
    from lavender_tpu.utils.tb import (TensorboardLogger, _masked_crc,
                                       _varint)
    tb = TensorboardLogger(str(tmp_path))
    tb.add_scalar("loss", 0.5, step=3)
    tb.set_step(7)
    tb.add_scalars({"acc": 0.25, "skipme": "not-a-number"}, prefix="vl")
    tb.close()

    raw = open(tb.path, "rb").read()
    records = []
    off = 0
    while off < len(raw):
        (ln,) = struct.unpack_from("<Q", raw, off)
        (hcrc,) = struct.unpack_from("<I", raw, off + 8)
        assert hcrc == _masked_crc(raw[off:off + 8])
        data = raw[off + 12:off + 12 + ln]
        (dcrc,) = struct.unpack_from("<I", raw, off + 12 + ln)
        assert dcrc == _masked_crc(data)
        records.append(data)
        off += 12 + ln + 4

    assert len(records) == 3  # file_version + 2 scalar events

    def read_varint(b, i):
        v, sh = 0, 0
        while True:
            v |= (b[i] & 0x7F) << sh
            i += 1
            if not b[i - 1] & 0x80:
                return v, i
            sh += 7

    def parse_event(b):
        i, out = 0, {}
        while i < len(b):
            key, i = read_varint(b, i)
            field, wire = key >> 3, key & 7
            if wire == 0:
                v, i = read_varint(b, i)
                out[field] = v
            elif wire == 1:
                out[field] = struct.unpack_from("<d", b, i)[0]
                i += 8
            elif wire == 5:
                out[field] = struct.unpack_from("<f", b, i)[0]
                i += 4
            elif wire == 2:
                ln, i = read_varint(b, i)
                out.setdefault(field, []).append(b[i:i + ln])
                i += ln
        return out

    ev0 = parse_event(records[0])
    assert ev0[3] == [b"brain.Event:2"]
    ev1 = parse_event(records[1])
    assert ev1[2] == 3  # step
    val1 = parse_event(parse_event(ev1[5][0])[1][0])
    assert val1[1] == [b"loss"] and abs(val1[2] - 0.5) < 1e-7
    ev2 = parse_event(records[2])
    assert ev2[2] == 7  # global step via set_step
    val2 = parse_event(parse_event(ev2[5][0])[1][0])
    assert val2[1] == [b"vl_acc"] and abs(val2[2] - 0.25) < 1e-7
