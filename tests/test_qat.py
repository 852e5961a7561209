"""Quantization-aware training (ops/fake_quant.py + Trainer(qat=True)):
the fake-quant grid must be EXACTLY the int8 engine's grid, gradients
must be straight-through, and QAT fine-tuning must beat plain
fine-tuning when both are served through the real int8 engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peekvit_tpu.models.registry import build_model
from peekvit_tpu.ops.fake_quant import fake_quant, fq_act, fq_weight
from peekvit_tpu.training.optim import Adam
from peekvit_tpu.training.trainer import Trainer


def test_fake_quant_matches_engine_grid():
    """fq_weight/fq_act forward values == dequantized quantize_linear /
    _quant_rows — the serving engine's exact rounding."""
    from peekvit_tpu.ops.pallas.quant_blocks import (
        _quant_rows,
        quantize_linear,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(16, 24)) * 3.0, jnp.float32)
    wq, sw = quantize_linear(w)
    np.testing.assert_array_equal(
        np.asarray(fq_weight(w)),
        np.asarray(wq.astype(jnp.float32) * sw))

    x = jnp.asarray(rng.normal(size=(5, 16)) * 7.0, jnp.float32)
    xq, sx = _quant_rows(x)
    np.testing.assert_array_equal(
        np.asarray(fq_act(x)),
        np.asarray(xq.astype(jnp.float32) * sx))

    # fq(x) @ fq(w) == the engine's dequantized int8 matmul
    from peekvit_tpu.ops.pallas.quant_blocks import _quant_linear_xla

    got = fq_act(x) @ fq_weight(w)
    want = _quant_linear_xla(x, wq, sw, jnp.zeros((24,), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fake_quant_gradients_are_straight_through():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    gw = jax.grad(lambda t: jnp.sum(fq_weight(t) * 2.0))(w)
    np.testing.assert_array_equal(np.asarray(gw), np.full((8, 8), 2.0))
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    gx = jax.grad(lambda t: jnp.sum(fq_act(t)))(x)
    np.testing.assert_array_equal(np.asarray(gx), np.ones((4, 8)))


def test_fake_quant_context_is_traced_into_forward():
    """The same apply under fake_quant(True) differs from the fp forward
    and matches a manual weight+act fake-quant bound (sanity that the
    hooks actually fire inside the model)."""
    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=3,
    )
    # the reference zero-inits the head (vit.py) — randomize it so logits
    # actually carry the encoder's rounding
    model.params["head"]["kernel"] = 0.1 * jax.random.normal(
        jax.random.key(30), model.params["head"]["kernel"].shape)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    apply_fn = model.apply_fn()
    fp, _ = apply_fn(model.params, x, None, None, {}, train=False)
    with fake_quant(True):
        q, _ = apply_fn(model.params, x, None, None, {}, train=False)
    assert float(jnp.max(jnp.abs(fp - q))) > 0.0  # rounding visible
    # and it is a ROUNDING, not a rewrite: outputs stay close
    np.testing.assert_allclose(np.asarray(q), np.asarray(fp),
                               rtol=0.3, atol=0.3)


def test_qat_trainer_runs_linen_and_loss_decreases():
    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=5,
    )
    t = Trainer(model=model, optimizer=Adam(lr=3e-3), qat=True)
    assert t.fused is False  # fake-quant is not in the Pallas kernels
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(16, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 16), jnp.int32)
    first = None
    for i in range(25):
        m = t.train_step(x, y, step_idx=i)
        if first is None:
            first = float(m["total_loss"])
    assert float(m["total_loss"]) < first - 0.1

    with pytest.raises(NotImplementedError, match="fake-quant"):
        Trainer(model=model, optimizer=Adam(lr=1e-3), qat=True,
                pipeline_stages=2)


def test_qat_composes_with_gated_residualvit():
    """QAT rides the shared ops (SelfAttention/MLP), so the flagship
    ResidualViT fine-tune flow — gates + regularizers — trains under
    fake-quant unchanged."""
    from peekvit_tpu.utils.losses import LossCompose

    model = build_model(
        "residualvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token="learnable"),
        seed=11,
    )
    t = Trainer(
        model=model, optimizer=Adam(lr=3e-3), qat=True,
        loss_compose=LossCompose(
            {"sparsity": {"_target_":
                          "peekvit_tpu.utils.losses.SparsityLoss",
                          "weight": 0.2, "sparsity_type": "l1"}}),
    )
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 8), jnp.int32)
    first = None
    for i in range(15):
        m = t.train_step(x, y, budget=0.6, step_idx=i)
        if first is None:
            first = float(m["total_loss"])
    assert "sparsity" in m or any("sparsity" in k for k in m)
    assert float(m["total_loss"]) < first


def test_qat_beats_plain_finetune_through_the_int8_engine():
    """The textbook QAT claim, end to end on the REAL engine path: train
    the same init twice (identical data/steps/lr; one plain, one qat),
    then serve BOTH through the int8 engine — the QAT weights must score
    a lower engine-path loss (they were optimized through the engine's
    exact rounding). Deterministic: fixed seeds throughout."""
    from peekvit_tpu.inference import InferenceEngine

    args = dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
                hidden_dim=32, mlp_dim=64, num_classes=5)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(32, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 32), jnp.int32)

    losses = {}
    for mode in ("plain", "qat"):
        model = build_model("vit", args, seed=8)
        t = Trainer(model=model, optimizer=Adam(lr=3e-3), fused=False,
                    qat=(mode == "qat"))
        for i in range(40):
            t.train_step(x, y, step_idx=i)
        eng = InferenceEngine(model, compute_dtype=jnp.float32,
                              interpret=True, quantized=True)
        logits = eng(x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        losses[mode] = float(-jnp.mean(logp[jnp.arange(32), y]))
    assert losses["qat"] < losses["plain"], losses
