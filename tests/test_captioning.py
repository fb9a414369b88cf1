"""Captioning tests: KV-cache decode must exactly match full re-encode,
plus loss / masking / filtering semantics vs the reference formulas.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavender_tpu.config import BertConfig, ModelConfig, SwinConfig
from lavender_tpu.models import captioning as cap
from lavender_tpu.models.lavender import LavenderModel


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                        num_heads=(2, 2, 2, 2), window_size=(8, 7, 7),
                        drop_path_rate=0.0),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0))
    model = LavenderModel(cfg)
    img = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    txt = jnp.zeros((1, 6), jnp.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img, txt, jnp.ones((1, 6), jnp.int32))
    return model, variables


CLS, SEP, PAD, MASK = 2, 3, 0, 4


def test_kv_cache_greedy_matches_reencode(tiny):
    """The cached incremental decode must produce exactly the same greedy
    tokens as the reference's full-re-encode semantics."""
    model, variables = tiny
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 2, 64, 64, 3), jnp.float32)
    gen = cap.make_generate_fn(
        model, CLS, SEP, PAD, MASK,
        cap.GenerateConfig(max_gen_length=8))
    ids, logp = gen(variables, img, jax.random.PRNGKey(0))
    ref_ids = cap.rencode_generate_reference(
        model, variables, img, CLS, SEP, PAD, MASK, max_gen_length=8)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    assert np.all(np.isfinite(np.asarray(logp)))


def test_generate_stops_at_sep(tiny):
    model, variables = tiny
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(1, 2, 64, 64, 3), jnp.float32)
    gen = cap.make_generate_fn(
        model, CLS, SEP, PAD, MASK, cap.GenerateConfig(max_gen_length=12))
    ids = np.asarray(gen(variables, img, jax.random.PRNGKey(0))[0])[0]
    # after the first SEP (if any) everything is PAD, except a possible
    # forced final SEP
    if SEP in ids.tolist():
        pos = ids.tolist().index(SEP)
        tail = ids[pos + 1:]
        assert np.all((tail == PAD) | (np.arange(len(tail)) == len(tail)))


def test_caption_masking():
    rs = np.random.RandomState(0)
    txt = rs.randint(5, 60, (4, 10)).astype(np.int32)
    txt[:, -2:] = PAD
    masked, ans = cap.caption_masking(txt, PAD, MASK, p_mask=0.5, rng=rs)
    hit = ans != -1
    assert hit.any()
    assert np.all(masked[hit] == MASK)
    assert not hit[:, -2:].any()  # pads never masked


def test_caption_loss(tiny):
    model, variables = tiny
    rs = np.random.RandomState(2)
    B, T, S, L = 2, 2, 64, 6
    txt = rs.randint(5, 60, (B, L)).astype(np.int32)
    masked, ans = cap.caption_masking(txt, PAD, MASK, p_mask=0.5, rng=rs)
    loss_fn = cap.make_caption_loss_fn(model, label_smoothing=0.1)
    loss = loss_fn(variables["params"],
                   {"img": jnp.asarray(rs.rand(B, T, S, S, 3), jnp.float32),
                    "txt": jnp.asarray(masked),
                    "mask": jnp.ones((B, L), jnp.int32),
                    "ans_mtm": jnp.asarray(ans)},
                   jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_label_smoothed_kl_matches_torch_formula():
    torch = pytest.importorskip("torch")
    from lavender_tpu.tasks.common import label_smoothed_kl_loss
    rs = np.random.RandomState(3)
    logits = rs.randn(6, 11).astype(np.float32)
    target = rs.randint(0, 11, (6,))
    eps, V = 0.1, 11
    tl = torch.from_numpy(logits)
    tt = torch.from_numpy(target)
    one_hot = torch.zeros_like(tl).scatter(1, tt.view(-1, 1), 1)
    one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / (V - 1)
    log_prb = torch.nn.functional.log_softmax(tl, dim=1)
    ref = torch.nn.KLDivLoss(reduction="none")(log_prb, one_hot).sum(1).mean()
    ours = label_smoothed_kl_loss(jnp.asarray(logits), jnp.asarray(target),
                                  label_smoothing=eps)
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


def test_top_k_top_p_filter_matches_torch():
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    from tests.reference_oracle import install_shims
    install_shims()
    import model_for_captioning as ref_cap
    rs = np.random.RandomState(4)
    logits = rs.randn(3, 20).astype(np.float32)
    for tk, tp in [(5, 1.0), (0, 0.7), (4, 0.8)]:
        ref = ref_cap.top_k_top_p_filtering(
            torch.from_numpy(logits.copy()), top_k=tk, top_p=tp).numpy()
        ours = np.asarray(cap.top_k_top_p_filter(
            jnp.asarray(logits), top_k=tk, top_p=tp))
        finite = np.isfinite(ref)
        assert np.array_equal(np.isfinite(ours), finite), (tk, tp)
        np.testing.assert_allclose(ours[finite], ref[finite], rtol=1e-6)


def test_generate_sampling_runs(tiny):
    """do_sample with temperature + top-k/top-p produces valid tokens and
    respects the finished mask (model_for_captioning.py:436-447)."""
    model, variables = tiny
    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.rand(2, 2, 64, 64, 3), jnp.float32)
    gen = cap.make_generate_fn(
        model, CLS, SEP, PAD, MASK,
        cap.GenerateConfig(max_gen_length=8, do_sample=True,
                           temperature=0.8, top_k=10, top_p=0.9))
    ids, logp = gen(variables, img, jax.random.PRNGKey(3))
    ids = np.asarray(ids)
    assert ids.shape == (2, 8)
    assert (ids[:, 0] == CLS).all()
    assert np.all(np.isfinite(np.asarray(logp)))
    # different rng -> (very likely) different sample
    ids2 = np.asarray(gen(variables, img, jax.random.PRNGKey(4))[0])
    assert ids.shape == ids2.shape


def test_generate_repetition_penalty(tiny):
    model, variables = tiny
    rs = np.random.RandomState(6)
    img = jnp.asarray(rs.rand(1, 2, 64, 64, 3), jnp.float32)
    gen = cap.make_generate_fn(
        model, CLS, SEP, PAD, MASK,
        cap.GenerateConfig(max_gen_length=8, repetition_penalty=1.5))
    ids, _ = gen(variables, img, jax.random.PRNGKey(0))
    assert np.asarray(ids).shape == (1, 8)
