"""Golden-parity: full LavenderModel vs the reference LAVENDER_Base.

Builds the reference model (tiny 4-stage swin + tiny local HF BERT) on CPU,
converts its state_dict, and compares go_feat / go_cross / MLM logits.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lavender_tpu.config import BertConfig, ModelConfig, SwinConfig
from lavender_tpu.convert import convert_state_dict, merge_params
from lavender_tpu.models.lavender import LavenderModel

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.reference_oracle import (  # noqa: E402
    install_shims, import_reference_video_swin)


BERT = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=4, intermediate_size=64,
                  max_position_embeddings=64, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0)
SWIN = SwinConfig(embed_dim=8, depths=(1, 2, 1, 1), num_heads=(1, 2, 4, 8),
                  window_size=(8, 7, 7), drop_path_rate=0.0,
                  scan_blocks=False)


class _Args(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


@pytest.fixture(scope="module")
def ref_model(tmp_path_factory):
    install_shims()
    # torch is CPU-only here; the reference hardcodes .cuda() in EncVideo
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    tmp = tmp_path_factory.mktemp("hf_tiny")
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=BERT.vocab_size, hidden_size=BERT.hidden_size,
        num_hidden_layers=BERT.num_hidden_layers,
        num_attention_heads=BERT.num_attention_heads,
        intermediate_size=BERT.intermediate_size,
        max_position_embeddings=BERT.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    mlm = transformers.BertForMaskedLM(hf_cfg)
    mlm.save_pretrained(str(tmp))

    import model as ref_mod  # reference model.py (via shims)
    video_swin = import_reference_video_swin()

    def fake_get_vidswin(args):
        torch.manual_seed(1)
        return video_swin.SwinTransformer3D(
            pretrained=None, pretrained2d=False,
            patch_size=list(SWIN.patch_size), embed_dim=SWIN.embed_dim,
            depths=list(SWIN.depths), num_heads=list(SWIN.num_heads),
            window_size=SWIN.window_size, drop_path_rate=0.0)

    ref_mod.get_vidswin_model = fake_get_vidswin

    args = _Args(
        txt_backbone=str(tmp), txt_backbone_embed_only=True,
        fusion_encoder=str(tmp), fusion_encoder_rand_init=False,
        use_checkpoint=False, max_size_frame=6, max_size_patch=14,
        enable_task_token=False, enable_prompt=False)
    torch.manual_seed(2)
    m = ref_mod.LAVENDER_Base(args)
    m.fc_mtm = mlm.cls
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_model(ref_model):
    cfg = ModelConfig(swin=SWIN, bert=BERT)
    model = LavenderModel(cfg)
    B, T, H, W = 2, 2, 64, 64
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, T, H, W, 3).astype(np.float32))
    txt = jnp.asarray(rng.randint(0, BERT.vocab_size, (B, 8)).astype(np.int32))
    mask = jnp.ones((B, 8), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), img, txt, mask)
    loaded = convert_state_dict(ref_model.state_dict())
    params = merge_params(init["params"], loaded)
    return model, {"params": params}


def _inputs(seed=3, B=2, T=2, H=64, W=64, L=8):
    rng = np.random.RandomState(seed)
    img = rng.randn(B, T, H, W, 3).astype(np.float32)
    txt = rng.randint(3, BERT.vocab_size, (B, L)).astype(np.int64)
    mask = np.ones((B, L), dtype=np.int64)
    mask[0, -2:] = 0
    return img, txt, mask


def test_go_feat_golden(ref_model, jax_model):
    model, variables = jax_model
    img, txt, mask = _inputs()
    with torch.no_grad():
        fi, mi, ft, mt = ref_model.go_feat(
            torch.from_numpy(img.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(txt), torch.from_numpy(mask))
    jfi, jmi, jft, jmt = model.apply(
        variables, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(mask),
        method=LavenderModel.go_feat)
    np.testing.assert_allclose(np.asarray(jfi), fi.numpy(), atol=3e-5)
    np.testing.assert_array_equal(np.asarray(jmi), mi.numpy())
    np.testing.assert_allclose(np.asarray(jft), ft.numpy(), atol=3e-5)


def test_full_forward_golden(ref_model, jax_model):
    model, variables = jax_model
    img, txt, mask = _inputs(seed=4)
    T_, H = 2, 64
    h = w = H // 32
    with torch.no_grad():
        fi, mi, ft, mt = ref_model.go_feat(
            torch.from_numpy(img.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(txt), torch.from_numpy(mask))
        out, _ = ref_model.go_cross(fi, mi, ft, mt)
        ref_logits = ref_model.fc_mtm(out[:, (1 + h * w) * T_:]).numpy()
    ours = np.asarray(model.apply(
        variables, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref_logits, atol=1e-4)


def test_seq2seq_mask_forward_golden(ref_model, jax_model):
    model, variables = jax_model
    img, txt, mask = _inputs(seed=5)
    T_, H = 2, 64
    h = w = H // 32
    with torch.no_grad():
        fi, mi, ft, mt = ref_model.go_feat(
            torch.from_numpy(img.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(txt), torch.from_numpy(mask),
            attn_mask_type="seq2seq")
        out, _ = ref_model.go_cross(fi, mi, ft, mt, attn_mask_type="seq2seq")
        ref_logits = ref_model.fc_mtm(out[:, (1 + h * w) * T_:]).numpy()
    ours = np.asarray(model.apply(
        variables, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(mask),
        attn_mask_type="seq2seq"))
    np.testing.assert_allclose(ours, ref_logits, atol=1e-4)


def test_odr_frame_order_golden(ref_model, jax_model):
    """Frame-order embedding path (model.py:72-81)."""
    model, variables = jax_model
    img, txt, mask = _inputs(seed=7)
    B, T_ = img.shape[:2]
    odr = np.array([[1, 0], [0, 1]], dtype=np.int64)  # one shuffled, one not
    with torch.no_grad():
        fi, _, _, _ = ref_model.go_feat(
            torch.from_numpy(img.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(txt), torch.from_numpy(mask),
            odr=torch.from_numpy(odr))
    jfi, _, _, _ = model.apply(
        variables, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(mask),
        jnp.asarray(odr), method=LavenderModel.go_feat)
    np.testing.assert_allclose(np.asarray(jfi), fi.numpy(), atol=3e-5)


def test_task_token_pretext_golden(ref_model, jax_model):
    """Task-token prepend path (model.py:248-306): reference prepends
    emb_task[task_id] to the text features; ours must match through the
    fusion encoder."""
    model, variables = jax_model
    img, txt, mask = _inputs(seed=8)
    B, T_, H = img.shape[0], img.shape[1], 64
    h = w = H // 32
    # give the reference the task table ours was initialized with
    emb_task = np.asarray(variables["params"]["emb_task"])
    ref_model.emb_task = torch.nn.Parameter(torch.from_numpy(emb_task))
    ref_model.task_tok2id = {"vtm": 0, "mc": 1, "oe": 2, "cap": 3}
    ref_model.args["enable_task_token"] = True
    with torch.no_grad():
        fi, mi, ft, mt = ref_model.go_feat(
            torch.from_numpy(img.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(txt), torch.from_numpy(mask))
        t2, mt2, ft2 = ref_model.prepro_txt_inputs(
            torch.from_numpy(txt), mt, ft, task_name="oe")
        out, _ = ref_model.go_cross(fi, mi, ft2, mt2)
        ref_logits = ref_model.fc_mtm(out[:, (1 + h * w) * T_:]).numpy()
    ref_model.args["enable_task_token"] = False

    from lavender_tpu.tasks.common import fused_mlm_logits
    fp, mp = model.apply(variables, "oe", B, method=LavenderModel.task_feat)
    ours, lp = fused_mlm_logits(
        model, variables, jnp.asarray(img), jnp.asarray(txt),
        jnp.asarray(mask), feat_pre=fp, mask_pre=mp)
    assert lp == 1
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-4)


def test_prompt_pretext_golden(ref_model, jax_model):
    """Prompt prepend path (model.py:266-288)."""
    model, variables = jax_model
    img, txt, mask = _inputs(seed=9)
    B, T_, H = img.shape[0], img.shape[1], 64
    h = w = H // 32
    prompt_txt = np.array([2, 17, 18, 3], dtype=np.int64)
    prompt_mask = np.ones((4,), dtype=np.int64)
    ref_model.args["enable_prompt"] = True
    with torch.no_grad():
        fi, mi, ft, mt = ref_model.go_feat(
            torch.from_numpy(img.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(txt), torch.from_numpy(mask))
        t2, mt2, ft2 = ref_model.prepro_txt_inputs(
            torch.from_numpy(txt), mt, ft,
            prompt=(torch.from_numpy(prompt_txt),
                    torch.from_numpy(prompt_mask)))
        out, _ = ref_model.go_cross(fi, mi, ft2, mt2)
        ref_logits = ref_model.fc_mtm(out[:, (1 + h * w) * T_:]).numpy()
    ref_model.args["enable_prompt"] = False

    from lavender_tpu.tasks.common import fused_mlm_logits
    fp = model.apply(variables, jnp.asarray(prompt_txt), B,
                     method=LavenderModel.encode_prompt)
    mp = jnp.broadcast_to(jnp.asarray(prompt_mask, jnp.int32)[None], (B, 4))
    ours, lp = fused_mlm_logits(
        model, variables, jnp.asarray(img), jnp.asarray(txt),
        jnp.asarray(mask), feat_pre=fp, mask_pre=mp)
    assert lp == 4
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=1e-4)


def test_vt_mask_golden(ref_model, jax_model):
    model, variables = jax_model
    img, txt, mask = _inputs(seed=6)
    B, T_ = img.shape[:2]
    vt = np.ones((B, T_, 1), dtype=np.int64)
    vt[:, 1] = 0
    with torch.no_grad():
        fi, mi, ft, mt = ref_model.go_feat(
            torch.from_numpy(img.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(txt), torch.from_numpy(mask),
            vt_mask=torch.from_numpy(vt))
    jfi, jmi, jft, jmt = model.apply(
        variables, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(mask),
        None, jnp.asarray(vt), method=LavenderModel.go_feat)
    np.testing.assert_array_equal(np.asarray(jmi), mi.numpy())
