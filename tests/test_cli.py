"""CLI end-to-end: build a synthetic dataset dir in the reference file
layout (img_{ds}.tsv + id2lineidx.pkl + txt_{task}.json + vocab.txt), then
run one finetune epoch per task through the unified entry point.
"""
import base64
import io
import json
import pickle

import numpy as np
import pytest

from lavender_tpu.data.tokenizer import build_test_vocab
from lavender_tpu.data.tsv import tsv_writer


def _jpeg_b64(rs, size=48):
    from PIL import Image
    arr = (rs.rand(size, size, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return build_demo_data_dir(tmp_path_factory.mktemp("dataset"))


def build_demo_data_dir(d):
    """Synthetic dataset dir in the reference file layout — plain function
    so non-fixture callers (test_multihost's 2-process CLI smoke) can
    build one too."""
    rs = np.random.RandomState(0)
    n_vid, n_frames = 6, 4
    rows = []
    for i in range(n_vid):
        frames = [_jpeg_b64(rs) for _ in range(n_frames)]
        rows.append([f"vid{i}", "{}"] + frames)
    tsv_writer(rows, str(d / "img_toy.tsv"))
    with open(d / "img_toy.lineidx") as f:
        offsets = [int(l) for l in f]
    id2lineidx = {f"vid{i}": offsets[i] for i in range(n_vid)}
    with open(d / "img_toy.id2lineidx.pkl", "wb") as f:
        pickle.dump(id2lineidx, f)

    # train split holds 24 entries (4 per video) so the per-DEVICE batch
    # semantics (size_batch=3 x dp=8 virtual devices = 24-row loader
    # batches) yield a full sharded train step; val/test stay at 6
    captions = ["a man is talking", "a dog is playing", "a woman is playing",
                "the cat is talking", "a person is playing", "a dog runs"]
    verbs = ["talks", "plays", "runs", "sits"]

    def entries(split, make):
        n = 24 if split == "train" else n_vid
        return [make(i) for i in range(n)]

    ret = {s: entries(s, lambda i: {
        "video": f"vid{i % n_vid}",
        "caption": captions[i % n_vid] if i < n_vid
        else f"a person {verbs[i % 4]} {i}"})
        for s in ["train", "val", "test"]}
    with open(d / "txt_toyret.json", "w") as f:
        json.dump(ret, f)

    qamc = {s: entries(s, lambda i: {
        "video": f"vid{i % n_vid}", "question": f"what is it {i}",
        "option_0": "a dog", "option_1": "a cat",
        "option_2": "a man", "answer": i % 3})
        for s in ["train", "val", "test"]}
    with open(d / "txt_toymc.json", "w") as f:
        json.dump(qamc, f)

    qaoe = {s: entries(s, lambda i: {
        "video": f"vid{i % n_vid}", "question": f"what is playing {i}",
        "answer_text": ["dog", "cat", "man"][i % 3]})
        for s in ["train", "val", "test"]}
    with open(d / "txt_toyoe.json", "w") as f:
        json.dump(qaoe, f)

    vocab = build_test_vocab()
    with open(d / "vocab.txt", "w") as f:
        for tok_ in sorted(vocab, key=vocab.get):
            f.write(tok_ + "\n")
    return d


def _config(data_dir, task, ds="toy", **extra):
    cfg = {
        "type": "retrieval", "task": task, "dataset": ds,
        "data_dir": str(data_dir), "size_img": 64, "size_frame": 2,
        "size_txt": 8, "size_batch": 3, "size_epoch": 1, "lr": 1e-4,
        "size_option": 3,
        "vocab_path": str(data_dir / "vocab.txt"),
        "swin": {"embed_dim": 8, "depths": [1, 1, 1, 1],
                 "num_heads": [2, 2, 2, 2], "drop_path_rate": 0.0},
        "bert": {"vocab_size": 128, "hidden_size": 32,
                 "num_hidden_layers": 2, "num_attention_heads": 4,
                 "intermediate_size": 64, "max_position_embeddings": 64},
    }
    cfg.update(extra)
    path = data_dir / f"args_{task}.json"
    with open(path, "w") as f:
        json.dump(cfg, f)
    return str(path)


def test_cli_retrieval(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    log = main(["--task", "retrieval_mlm",
                "--config", _config(data_dir, "toyret"),
                "--path_output", str(tmp_path)])
    assert len(log["ls_tr"]) == 1
    assert np.isfinite(log["ls_tr"][0])
    assert 0.0 <= log["ac_vl"][0] <= 1.0


def test_cli_qamc(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    log = main(["--task", "qamc_mlm",
                "--config", _config(data_dir, "toymc"),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])


def test_cli_qaoe(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    log = main(["--task", "qaoe_mlm",
                "--config", _config(data_dir, "toyoe"),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])


def test_cli_caption(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    log = main(["--task", "caption",
                "--config", _config(data_dir, "toyret"),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])
    assert "CIDEr" in log["metrics_vl"][0]
    # the reference evaluates the TEST split each epoch too
    # (main_caption.py:182-217) — both splits' metrics must exist
    assert "CIDEr" in log["metrics_ts"][0]


def test_cli_multi_task(data_dir, tmp_path):
    import json as jsonmod
    from lavender_tpu.cli.main import main
    cfg_path = _config(data_dir, "toyret",
                       multi_task_datasets=[
                           {"type": "retrieval", "task": "toyret",
                            "dataset": "toy", "ratio": 2},
                           {"type": "qamc", "task": "toymc",
                            "dataset": "toy", "ratio": 1}],
                       max_steps=4)
    log = main(["--task", "multi_task_mlm", "--config", cfg_path,
                "--path_output", str(tmp_path)])
    assert log["steps"] == 4


def test_cli_eval_retrieval(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    res = main(["--task", "eval_retrieval",
                "--config", _config(data_dir, "toyret"),
                "--path_output", str(tmp_path)])
    for split in ("val", "test"):
        assert "R@1" in res[split]
        assert 0.0 <= res[split]["R@1"] <= 100.0


def _pretrain_shard(data_dir, name):
    """24-row shard (img_toy.tsv x4) so the dp=8-scaled loader batch fills
    (len(PretrainDataset) == len(tsv))."""
    from lavender_tpu.data.tsv import TSVFile
    src = TSVFile(str(data_dir / "img_toy.tsv"))
    rows = [src.seek(i) for i in range(len(src))] * 4
    tsv_writer(rows, str(data_dir / f"{name}_train_0.tsv"))


def test_cli_pretrain(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    # shard layout: {dataset}_train_{part}.tsv + txt_{dataset}.json (vid->caps)
    _pretrain_shard(data_dir, "toypre")
    caps = {f"vid{i}": [f"a dog is playing {i} take {j}" for j in range(4)]
            for i in range(6)}
    with open(data_dir / "txt_toypre.json", "w") as f:
        json.dump({"train": caps}, f)
    log = main(["--task", "pretrain_mlm",
                "--config", _config(data_dir, "toypre", ds="toypre"),
                "--path_output", str(tmp_path)])
    assert any(np.isfinite(v[0]) for k, v in log.items() if v)


def test_cli_retrieval_ts(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    log = main(["--task", "retrieval_ts",
                "--config", _config(data_dir, "toyret"),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])
    assert 0.0 <= log["ac_vl"][0] <= 1.0


def test_cli_qamc_ts(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    log = main(["--task", "qamc_ts",
                "--config", _config(data_dir, "toymc"),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])


def test_cli_qaoe_ts(data_dir, tmp_path):
    import json as jsonmod
    from lavender_tpu.cli.main import main
    # qaoe_ts classifies over a fixed answer vocab: remap answers to ints
    with open(data_dir / "txt_toyoe.json") as f:
        oe = jsonmod.load(f)
    vocab = {"dog": 0, "cat": 1, "man": 2}
    oe2 = {s: [dict(it, answer=vocab[it["answer_text"]]) for it in items]
           for s, items in oe.items()}
    with open(data_dir / "txt_toyoets.json", "w") as f:
        jsonmod.dump(oe2, f)
    log = main(["--task", "qaoe_ts",
                "--config", _config(data_dir, "toyoets", size_vocab=3),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])


def test_cli_retmc_ts(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    log = main(["--task", "retmc_ts",
                "--config", _config(data_dir, "toymc"),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])


def test_cli_pretrain_ts(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    _pretrain_shard(data_dir, "toypre2")
    caps = {f"vid{i}": [f"a dog is playing {i} take {j}" for j in range(4)]
            for i in range(6)}
    with open(data_dir / "txt_toypre2.json", "w") as f:
        json.dump({"train": caps}, f)
    log = main(["--task", "pretrain_ts",
                "--config", _config(data_dir, "toypre2", ds="toypre2"),
                "--path_output", str(tmp_path)])
    assert any(np.isfinite(v[0]) for k, v in log.items() if v)


def test_cli_multi_task_evals(data_dir, tmp_path):
    """multi_task_mlm: per-task eval every iter_per_ep + best tracking
    (Agent_Multi_Task.run, main_multi_task_mlm.py:404-486)."""
    from lavender_tpu.cli.main import main
    cfg_path = _config(data_dir, "toyret",
                       multi_task_datasets=[
                           {"type": "retrieval", "task": "toyret",
                            "dataset": "toy", "ratio": 1},
                           {"type": "qamc", "task": "toymc",
                            "dataset": "toy", "ratio": 1}],
                       max_steps=4, iter_per_ep=2)
    log = main(["--task", "multi_task_mlm", "--config", cfg_path,
                "--path_output", str(tmp_path)])
    assert log["retrieval-toy_vl_ac"], log.keys()
    assert log["qamc-toy_vl_ac"], log.keys()
    assert "retrieval-toy" in log["best"]


def test_cli_multi_task_multi_head(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    cfg_path = _config(data_dir, "toyret",
                       multi_task_datasets=[
                           {"type": "retrieval", "task": "toyret",
                            "dataset": "toy", "ratio": 1},
                           {"type": "qamc", "task": "toymc",
                            "dataset": "toy", "ratio": 1,
                            "size_option": 3}],
                       max_steps=4, iter_per_ep=2)
    log = main(["--task", "multi_task_multi_head", "--config", cfg_path,
                "--path_output", str(tmp_path)])
    assert log["retrieval-toy_vl_ac"]
    assert log["qamc-toy_vl_ac"]


def test_cli_eval_retrieval_ts(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    res = main(["--task", "eval_retrieval_ts",
                "--config", _config(data_dir, "toyret"),
                "--path_output", str(tmp_path)])
    for split in ("val", "test"):
        assert "R@1" in res[split]


def test_cli_prompt_and_task_token(data_dir, tmp_path):
    """Pretext-enabled runs train + eval end-to-end (round-1 missing #4)."""
    from lavender_tpu.cli.main import main
    for flag in ("enable_prompt", "enable_task_token"):
        log = main(["--task", "retrieval_mlm",
                    "--config", _config(data_dir, "toyret", **{flag: True}),
                    "--path_output", str(tmp_path / flag)])
        assert np.isfinite(log["ls_tr"][0]), flag


def test_cli_qamc_mlm_head(data_dir, tmp_path):
    from lavender_tpu.cli.main import main
    log = main(["--task", "qamc_mlm_head",
                "--config", _config(data_dir, "toymc"),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])


def test_cli_qaoe_mlm_fib(data_dir, tmp_path):
    import json as jsonmod
    from lavender_tpu.cli.main import main
    ans_vocab = ["dog", "cat", "man"]
    fib = {s: [{"video": f"vid{i % 6}", "sentence": "the [MASK] is playing",
                "answer": i % 3}
               for i in range(24 if s == "train" else 6)]
           for s in ["train", "val", "test"]}
    with open(data_dir / "txt_toyfib.json", "w") as f:
        jsonmod.dump(fib, f)
    with open(data_dir / "txt_toyfib_label2ans.json", "w") as f:
        jsonmod.dump(ans_vocab, f)
    log = main(["--task", "qaoe_mlm_fib",
                "--config", _config(data_dir, "toyfib"),
                "--path_output", str(tmp_path)])
    assert np.isfinite(log["ls_tr"][0])
