"""Golden-parity tests: JAX BERT components vs HuggingFace (random-init).

Validates models/bert.py AND the state-dict converter for the fusion-encoder
paths (reference model.py:151-165 uses HF bert.embeddings/encoder/cls).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lavender_tpu.config import BertConfig
from lavender_tpu.convert import convert_state_dict
from lavender_tpu.models import bert as jbert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_cfg():
    return BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=3,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)


def _hf_model(cfg: BertConfig, seed=0):
    torch.manual_seed(seed)
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    m = transformers.BertForMaskedLM(hf_cfg)
    m.eval()
    return m


def test_embeddings_golden():
    cfg = _tiny_cfg()
    hf = _hf_model(cfg)
    params = convert_state_dict(hf.bert.embeddings.state_dict())
    ids = np.array([[1, 5, 9, 2, 0, 0], [3, 4, 4, 4, 2, 0]], dtype=np.int32)
    with torch.no_grad():
        ref = hf.bert.embeddings(torch.from_numpy(ids).long()).numpy()
    ours = np.asarray(jbert.BertEmbeddings(cfg).apply(
        {"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_encoder_golden_2d_mask():
    cfg = _tiny_cfg()
    hf = _hf_model(cfg)
    params = convert_state_dict(hf.bert.encoder.state_dict())
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, cfg.hidden_size).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1]],
                    dtype=np.int64)
    with torch.no_grad():
        ext = hf.get_extended_attention_mask(
            torch.from_numpy(mask), mask.shape)
        ref = hf.bert.encoder(torch.from_numpy(x), ext).last_hidden_state.numpy()
    bias = jbert.extended_attention_mask(jnp.asarray(mask))
    ours = np.asarray(jbert.BertEncoder(cfg).apply(
        {"params": params}, jnp.asarray(x), bias))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_encoder_golden_3d_seq2seq_mask():
    cfg = _tiny_cfg()
    hf = _hf_model(cfg)
    params = convert_state_dict(hf.bert.encoder.state_dict())
    rng = np.random.RandomState(1)
    B, L = 2, 6
    x = rng.randn(B, L, cfg.hidden_size).astype(np.float32)
    mask3 = np.tril(np.ones((L, L), dtype=np.int64))[None].repeat(B, axis=0)
    with torch.no_grad():
        ext = hf.get_extended_attention_mask(
            torch.from_numpy(mask3), mask3.shape)
        ref = hf.bert.encoder(torch.from_numpy(x), ext).last_hidden_state.numpy()
    bias = jbert.extended_attention_mask(jnp.asarray(mask3))
    ours = np.asarray(jbert.BertEncoder(cfg).apply(
        {"params": params}, jnp.asarray(x), bias))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_mlm_head_golden():
    cfg = _tiny_cfg()
    hf = _hf_model(cfg)
    params = convert_state_dict(hf.cls.state_dict())
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, cfg.hidden_size).astype(np.float32)
    with torch.no_grad():
        ref = hf.cls(torch.from_numpy(x)).numpy()
    ours = np.asarray(jbert.BertMLMHead(cfg).apply(
        {"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
