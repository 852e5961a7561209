"""Mesh/data-parallel correctness on the virtual 8-device CPU mesh:
a dp train step must produce the same params as single-device (XLA inserts
the gradient all-reduce from the shardings alone)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peekvit_tpu.models.registry import build_model
from peekvit_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_spec,
    shard_batch,
    shard_params,
)
from peekvit_tpu.training.optim import Adam
from peekvit_tpu.training.trainer import Trainer


def _data(batch=16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)
    return x, y


def _model(seed=7):
    return build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10),
        seed=seed,
    )


def test_dp_step_matches_single_device():
    x, y = _data()

    t_single = Trainer(model=_model(), optimizer=Adam(lr=1e-2), fused=False)
    m_single = t_single.train_step(x, y, step_idx=0)

    mesh = make_mesh(n_data=8, n_model=1)
    t_dp = Trainer(model=_model(), optimizer=Adam(lr=1e-2), mesh=mesh,
                   fused=False)
    xd, yd = shard_batch(x, mesh), shard_batch(y, mesh)
    m_dp = t_dp.train_step(xd, yd, step_idx=0)

    np.testing.assert_allclose(
        float(m_dp["total_loss"]), float(m_single["total_loss"]), rtol=1e-5
    )
    flat_s = jax.tree.leaves(t_single.model.params)
    flat_d = jax.tree.leaves(t_dp.model.params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_tp_sharded_forward_matches_replicated():
    """Tensor-parallel param placement changes layout, not results."""
    x, _ = _data(4)
    model = _model()
    want, _ = model(x)

    mesh = make_mesh(n_data=4, n_model=2)
    model.params = shard_params(model.params, mesh, tensor_parallel=True)
    model._jitted = None
    got, _ = model(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # and the placement really is sharded over the model axis
    k = model.params["encoder"]["layers_0"]["self_attention"]["in_proj_kernel"]
    assert len(k.sharding.device_set) > 1


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert param_spec("encoder/layers_0/self_attention/in_proj_kernel", 2,
                      True) == P(None, MODEL_AXIS)
    assert param_spec("encoder/layers_0/self_attention/out_proj_kernel", 2,
                      True) == P(MODEL_AXIS, None)
    assert param_spec("encoder/layers_0/mlp/fc1_kernel", 2, True) == \
        P(None, MODEL_AXIS)
    assert param_spec("encoder/layers_0/mlp/fc2_kernel", 2, True) == \
        P(MODEL_AXIS, None)
    assert param_spec("encoder/layers_0/mlp/fc1_bias", 1, True) == \
        P(MODEL_AXIS)
    assert param_spec("head/kernel", 2, True) == P()
    assert param_spec("encoder/pos_embedding", 3, False) == P()


def test_batch_sharding_spreads_over_devices():
    mesh = make_mesh(n_data=8)
    x = jnp.zeros((16, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


def test_ep_sharded_moe_forward_matches_replicated():
    """Expert-parallel placement of MoE experts preserves results."""
    x, _ = _data(4)
    moe = build_model(
        "moevit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10, mlp_moes=[2, 2]),
        seed=3,
    )
    want, _ = moe(x)
    mesh = make_mesh(n_data=4, n_model=2)
    moe.params = shard_params(moe.params, mesh, tensor_parallel=True)
    moe._jitted = None
    got, _ = moe(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    k = moe.params["encoder"]["layers_0"]["mlp"]["experts"]["fc1_kernel"]
    assert len(k.sharding.device_set) > 1


def test_ep_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert param_spec("encoder/layers_0/mlp/experts/fc1_kernel", 3, True) == \
        P(MODEL_AXIS, None, None)
    assert param_spec("encoder/layers_0/mlp/experts/fc2_bias", 2, True) == \
        P(MODEL_AXIS, None)


def test_dp_sharded_inference_engine_matches_single_device():
    """InferenceEngine(mesh=...) serves data-parallel over the mesh's data
    axis (shard_map around the Pallas kernels): logits match the
    single-device engine for ViT, ResidualViT (whole-batch budget-token
    mean spans the mesh via pmean) and the padded RankViT mode."""
    from peekvit_tpu.inference import InferenceEngine

    mesh = make_mesh(n_data=8, n_model=1)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(16, 32, 32, 3)),
                    jnp.float32)

    vit = build_model(
        "vit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=7),
        seed=71,
    )
    vit.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(72), vit.params["head"]["kernel"].shape)
    single = InferenceEngine(vit, compute_dtype=jnp.float32, interpret=True)
    dp = InferenceEngine(vit, compute_dtype=jnp.float32, interpret=True,
                         mesh=mesh)
    np.testing.assert_allclose(np.asarray(dp(x)), np.asarray(single(x)),
                               rtol=1e-5, atol=1e-5)

    res = build_model(
        "residualvit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=7,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token=0.5),  # constant fill -> exercises pmean
        seed=73,
    )
    res.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(74), res.params["head"]["kernel"].shape)
    res.params["encoder"]["layers_0"]["residual_gate"]["projection"][
        "kernel"] = jax.random.normal(jax.random.key(75), (64, 1)) * 0.5
    rs = InferenceEngine(res, compute_dtype=jnp.float32, interpret=True)
    rd = InferenceEngine(res, compute_dtype=jnp.float32, interpret=True,
                         mesh=mesh)
    for budget in (0.4, 0.9):
        np.testing.assert_allclose(
            np.asarray(rd(x, budget=budget)),
            np.asarray(rs(x, budget=budget)), rtol=1e-5, atol=1e-5)

    rank = build_model(
        "rankvit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5, rankvit_layers=[1]),
        seed=76,
    )
    rank.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(77), rank.params["head"]["kernel"].shape)
    ks = InferenceEngine(rank, compute_dtype=jnp.float32, interpret=True,
                         max_budget=0.5)
    kd = InferenceEngine(rank, compute_dtype=jnp.float32, interpret=True,
                         max_budget=0.5, mesh=mesh)
    for budget in (0.25, 0.5):
        np.testing.assert_allclose(
            np.asarray(kd(x, budget=budget)),
            np.asarray(ks(x, budget=budget)), rtol=1e-5, atol=1e-5)


def test_pipeline_forward_matches_sequential():
    """GPipe pipeline over a 4-stage mesh == running the blocks in order
    (activations hop stages via ppermute; static lax.scan schedule)."""
    import numpy as np
    from jax.sharding import Mesh

    from peekvit_tpu.models.vit import ViTBlock
    from peekvit_tpu.parallel import pipeline_forward, stack_stage_params

    d, h, m, L = 32, 4, 64, 4
    block = ViTBlock(num_heads=h, hidden_dim=d, mlp_dim=m)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(8, 9, d)), jnp.float32)

    per_stage = []
    for i in range(L):
        per_stage.append(
            block.init(jax.random.key(100 + i), x[:1])["params"])
    stacked = stack_stage_params(per_stage)

    # sequential reference
    want = x
    for p in per_stage:
        want = block.apply({"params": p}, want)

    mesh = Mesh(np.asarray(jax.devices()[:L]), ("stage",))

    def stage_fn(params, act):
        return block.apply({"params": params}, act)

    got = pipeline_forward(stage_fn, stacked, x, mesh=mesh,
                           num_microbatches=4, axis="stage")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sequence_parallel_block_matches_unsharded():
    """Token axis sharded over the model axis (Megatron-SP layout): LN /
    projections / MLP on local token shards, attention all-gathers K/V.
    Output == the plain ViTBlock forward."""
    from peekvit_tpu.models.vit import ViTBlock
    from peekvit_tpu.parallel import sequence_parallel_vit_block

    d, h, m = 32, 4, 64
    block = ViTBlock(num_heads=h, hidden_dim=d, mlp_dim=m)
    x = jnp.asarray(np.random.default_rng(41).normal(size=(2, 16, d)),
                    jnp.float32)
    variables = block.init(jax.random.key(200), x)
    want = block.apply(variables, x)

    mesh = make_mesh(n_data=1, n_model=8)
    got = sequence_parallel_vit_block(variables["params"], x, h, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
