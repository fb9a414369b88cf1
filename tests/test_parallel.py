"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY §2.5 rebuild:
DP+ZeRO-1 == pjit batch sharding; optional TP over fusion encoder)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lavender_tpu.config import BertConfig, ModelConfig, SwinConfig, TrainConfig
from lavender_tpu.models.lavender import LavenderModel
from lavender_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                        num_heads=(2, 2, 2, 2), drop_path_rate=0.0),
        bert=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64))
    model = LavenderModel(cfg)
    img = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
    txt = jnp.zeros((1, 7), jnp.int32)
    variables = jax.jit(
        lambda r: model.init(r, img, txt, jnp.ones((1, 7), jnp.int32)))(
        jax.random.PRNGKey(0))
    return model, variables


def test_mesh_shapes():
    mesh = pmesh.make_mesh(8, tp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    mesh1 = pmesh.make_mesh(8, tp=1)
    assert mesh1.devices.shape == (8, 1)


def test_param_rules(tiny):
    model, variables = tiny
    specs = pmesh.param_pspecs(variables["params"])
    flat = {
        "/".join(p.key for p in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]}
    assert flat["trsfr/layer_0/attention/self/query/kernel"] == \
        P(None, "model")
    assert flat["trsfr/layer_0/attention/output/dense/kernel"] == \
        P("model", None)
    assert flat["trsfr/layer_0/intermediate_dense/kernel"] == P(None, "model")
    assert flat["trsfr/layer_0/output_dense/kernel"] == P("model", None)
    assert flat["enc_img/swin/layers_0/blocks_0/attn/qkv/kernel"] == \
        P(None, "model")
    assert flat["enc_img/swin/layers_0/blocks_0/mlp/fc1/kernel"] == \
        P(None, "model")
    assert flat["enc_txt/emb_txt/word_embeddings/embedding"] == \
        P("model", None)
    # replicated leaves
    assert flat["enc_img/emb_cls"] == P()
    assert flat["trsfr/layer_0/attention/output/LayerNorm/scale"] == P()


def test_sharded_forward_matches_single(tiny):
    model, variables = tiny
    mesh = pmesh.make_mesh(8, tp=2)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(8, 2, 32, 32, 3), jnp.float32)
    txt = jnp.asarray(rs.randint(3, 60, (8, 7)), jnp.int32)
    mask = jnp.ones((8, 7), jnp.int32)

    def fwd(variables, img, txt, mask):
        fi, mi, ft, mt = model.apply(variables, img, txt, mask,
                                     method=LavenderModel.go_feat)
        return fi

    ref = np.asarray(jax.jit(fwd)(variables, img, txt, mask))

    sharded_params = pmesh.shard_params(variables["params"], mesh)
    batch = pmesh.shard_batch({"img": img, "txt": txt, "mask": mask}, mesh)
    with mesh:
        out = jax.jit(fwd)({"params": sharded_params}, batch["img"],
                           batch["txt"], batch["mask"])
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_tp_train_step_matches_unsharded(tiny):
    """A FULL train step (loss + grads + AdamW update) on a dp=4 x tp=2 mesh
    must match the single-device step — the exact contract dryrun_multichip
    exercises (round-1 weak #2: this was tested nowhere in the suite)."""
    from lavender_tpu.config import TrainConfig
    from lavender_tpu.tasks import retrieval
    from lavender_tpu.train import optimizer as opt_lib
    from lavender_tpu.train import trainer

    model, variables = tiny
    tcfg = TrainConfig(max_iter=10, max_grad_norm=1.0, lr=1e-3)
    loss_fn = retrieval.make_loss_fn(model, true_id=5, false_id=6)
    rs = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rs.rand(8, 2, 32, 32, 3), jnp.float32),
        "txt": jnp.asarray(rs.randint(3, 60, (8, 8)), jnp.int32),
        "mask": jnp.ones((8, 8), jnp.int32),
        "vid": jnp.arange(8, dtype=jnp.int32),
    }

    # single-device reference
    tx = opt_lib.build_optimizer(variables["params"], tcfg)
    state = trainer.create_train_state(variables["params"], tx, seed=0)
    step = trainer.make_train_step(loss_fn, tx, donate=False)
    ref_state, ref_loss = step(state, batch)

    # dp=4 x tp=2 sharded
    mesh = pmesh.make_mesh(8, tp=2)
    params = pmesh.shard_params(variables["params"], mesh)
    tx2 = opt_lib.build_optimizer(params, tcfg)
    state2 = trainer.create_train_state(params, tx2, seed=0)
    step2 = trainer.make_train_step(loss_fn, tx2, mesh=mesh, donate=False)
    sbatch = pmesh.shard_batch(batch, mesh)
    with mesh:
        new_state2, loss2 = step2(state2, sbatch)

    np.testing.assert_allclose(float(loss2), float(ref_loss), atol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_state.params)
    flat_shd = jax.tree_util.tree_leaves(new_state2.params)
    for a, b in zip(flat_ref, flat_shd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)
