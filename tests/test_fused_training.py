"""Fused training path: loss/grad parity with the linen train step, and
training actually converges on the synthetic set."""

import numpy as np
import optax
import jax
import jax.numpy as jnp

from peekvit_tpu.models.registry import build_model
from peekvit_tpu.training.fused import make_fused_train_step, vit_forward_trainable


def _model():
    m = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=2,
    )
    k = jax.random.key(3)
    m.params["head"]["kernel"] = 0.05 * jax.random.normal(
        k, m.params["head"]["kernel"].shape
    )
    return m


def test_fused_forward_and_grads_match_linen():
    model = _model()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 16, 3)),
                    jnp.float32)
    y = jnp.asarray([0, 1, 2, 3])

    fn = model.apply_fn()

    def linen_loss(p):
        logits, _ = fn(p, x, None, None, {}, train=False)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    def fused_loss(p):
        logits = vit_forward_trainable(
            p, x, patch_size=8, num_heads=2, compute_dtype=jnp.float32,
            interpret=True,
        )
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    l_ref, g_ref = jax.value_and_grad(linen_loss)(model.params)
    l_fused, g_fused = jax.value_and_grad(fused_loss)(model.params)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = dict(
        ("/".join(str(getattr(kk, "key", kk)) for kk in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_fused)
    )
    for path, ref_leaf in flat_ref:
        name = "/".join(str(getattr(kk, "key", kk)) for kk in path)
        # fp32 parity: LN-backward association order differs between the
        # kernel and XLA; errors stay <0.2% of the grad scale
        scale = max(float(np.abs(np.asarray(ref_leaf)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(flat_fused[name]) / scale, np.asarray(ref_leaf) / scale,
            rtol=2e-3, atol=2e-3, err_msg=f"grad mismatch at {name}",
        )


def test_fused_train_step_converges():
    model = _model()
    tx = optax.adam(5e-3)
    step = make_fused_train_step(model, tx, compute_dtype=jnp.float32,
                                 interpret=True)
    rng = np.random.default_rng(1)
    base = rng.normal(size=(5, 16, 16, 3)).astype(np.float32)
    y = jnp.arange(20) % 5
    x = jnp.asarray(base[np.asarray(y)] + 0.1 * rng.normal(size=(20, 16, 16, 3)),
                    jnp.float32)
    params, opt_state = model.params, tx.init(model.params)
    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::5]


def test_trainer_fused_path_cpu():
    """Trainer with fused=True (forced, interpret on CPU): same metric keys,
    loss decreases, lr schedule applies."""
    import optax  # noqa: F401

    from peekvit_tpu.training.optim import Adam
    from peekvit_tpu.training.trainer import Trainer

    model = _model()
    trainer = Trainer(model=model, optimizer=Adam(lr=5e-3),
                      clip_grad_norm=1.0, fused=True)
    assert trainer._fused_eligible()
    rng = np.random.default_rng(4)
    base = rng.normal(size=(5, 16, 16, 3)).astype(np.float32)
    y = jnp.arange(20) % 5
    x = jnp.asarray(base[np.asarray(y)] + 0.1 * rng.normal(size=(20, 16, 16, 3)),
                    jnp.float32)
    losses = []
    for i in range(12):
        metrics = trainer.train_step(x, y, step_idx=i)
        losses.append(float(metrics["total_loss"]))
        assert set(metrics) == {"classification_loss", "total_loss"}
    assert losses[-1] < losses[0]


def test_trainer_fused_not_eligible_with_regularizers():
    from peekvit_tpu.training.optim import Adam
    from peekvit_tpu.training.trainer import Trainer
    from peekvit_tpu.utils.losses import LossCompose

    model = _model()
    trainer = Trainer(
        model=model, optimizer=Adam(lr=1e-3), fused=True,
        loss_compose=LossCompose(
            {"zero": {"_target_": "peekvit.utils.losses.AlwaysZeroLoss"}}
        ),
    )
    assert not trainer._fused_eligible()


def test_trainer_fused_rankvit_training():
    """RankViT trains through the fused path (ranking is eval-only)."""
    from peekvit_tpu.training.optim import Adam
    from peekvit_tpu.training.trainer import Trainer

    model = build_model(
        "rankvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5, rankvit_layers=[1]),
        seed=6,
    )
    trainer = Trainer(model=model, optimizer=Adam(lr=5e-3), fused=True)
    assert trainer._fused_eligible()
    rng = np.random.default_rng(8)
    base = rng.normal(size=(5, 16, 16, 3)).astype(np.float32)
    y = jnp.arange(10) % 5
    x = jnp.asarray(base[np.asarray(y)] + 0.1 * rng.normal(size=(10, 16, 16, 3)),
                    jnp.float32)
    losses = [float(trainer.train_step(x, y, step_idx=i)["total_loss"])
              for i in range(10)]
    assert losses[-1] < losses[0]
    # eval path still ranks with budget after fused training
    model.set_budget(0.5)
    _, aux = model(x)
    assert "layer_1" in aux["masks"]
    # a train-time budget must not be silently dropped by the fused path
    # (it treats RankViT as a plain ViT, ADVICE r3): explicit rejection
    import pytest

    with pytest.raises(NotImplementedError, match="fused"):
        trainer.train_step(x, y, budget=0.5, step_idx=11)


def test_remat_grads_match_no_remat():
    """jax.checkpoint over fused blocks changes memory, not gradients."""
    model = _model()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 16, 16, 3)),
                    jnp.float32)
    y = jnp.asarray([0, 1, 2])

    def loss(p, remat):
        logits = vit_forward_trainable(
            p, x, patch_size=8, num_heads=2, compute_dtype=jnp.float32,
            remat=remat, interpret=True,
        )
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    g0 = jax.grad(lambda p: loss(p, False))(model.params)
    g1 = jax.grad(lambda p: loss(p, True))(model.params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _residual_model(budget_token="learnable"):
    m = build_model(
        "residualvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token=budget_token),
        seed=9,
    )
    k = jax.random.key(31)
    m.params["head"]["kernel"] = 0.05 * jax.random.normal(
        k, m.params["head"]["kernel"].shape)
    m.params["encoder"]["layers_0"]["residual_gate"]["projection"][
        "kernel"] = jax.random.normal(k, (32, 1)) * 0.5
    return m


def test_residual_fused_forward_and_grads_match_linen():
    from peekvit_tpu.training.fused import residualvit_forward_trainable
    from peekvit_tpu.utils.losses import LossCompose

    model = _residual_model()
    x = jnp.asarray(np.random.default_rng(5).normal(size=(3, 16, 16, 3)),
                    jnp.float32)
    y = jnp.asarray([0, 1, 2])
    budget = 0.6
    bvec = jnp.full((3,), budget, jnp.float32)
    compose = LossCompose({"mse": {"_target_": "peekvit.utils.losses.MSELoss",
                                   "budget": None, "strict": False}})
    fn = model.apply_fn()

    def linen_loss(p):
        logits, aux = fn(p, x, jnp.float32(budget), None,
                         {"noise": jax.random.key(0)}, train=False)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return ce + compose.compute(aux, budget=budget, return_dict=False)

    def fused_loss(p):
        logits, aux = residualvit_forward_trainable(
            p, x, bvec, patch_size=8, num_heads=2,
            gate_temp=model.module.gate_temp,
            gate_bias=model.module.gate_bias,
            budget_token=model.module.add_budget_token,
            compute_dtype=jnp.float32, interpret=True)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return ce + compose.compute(aux, budget=budget, return_dict=False)

    l_ref, g_ref = jax.value_and_grad(linen_loss)(model.params)
    l_fused, g_fused = jax.value_and_grad(fused_loss)(model.params)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-4)
    flat_fused = dict(
        ("/".join(str(getattr(kk, "key", kk)) for kk in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_fused)
    )
    for path, ref_leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        name = "/".join(str(getattr(kk, "key", kk)) for kk in path)
        scale = max(float(np.abs(np.asarray(ref_leaf)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(flat_fused[name]) / scale,
            np.asarray(ref_leaf) / scale,
            rtol=2e-3, atol=2e-3, err_msg=f"residual grad mismatch at {name}",
        )


def test_trainer_fused_residualvit_with_regularizers():
    """ResidualViT fused train path: budget sampling, gate masks in aux,
    MSE regularizer applied, loss decreases."""
    from peekvit_tpu.training.optim import Adam
    from peekvit_tpu.training.trainer import Trainer
    from peekvit_tpu.utils.losses import LossCompose

    model = _residual_model()
    trainer = Trainer(
        model=model, optimizer=Adam(lr=5e-3), fused=True, clip_grad_norm=1.0,
        loss_compose=LossCompose(
            {"mse": {"_target_": "peekvit.utils.losses.MSELoss",
                     "budget": None, "strict": False, "weight": 0.01}}),
    )
    assert trainer._fused_kind() == "residual"
    rng = np.random.default_rng(12)
    base = rng.normal(size=(5, 16, 16, 3)).astype(np.float32)
    y = jnp.arange(10) % 5
    x = jnp.asarray(base[np.asarray(y)] + 0.1 * rng.normal(size=(10, 16, 16, 3)),
                    jnp.float32)
    losses = []
    for i in range(12):
        metrics = trainer.train_step(x, y, step_idx=i)
        losses.append(float(metrics["total_loss"]))
        assert "mse" in metrics
    assert losses[-1] < losses[0]
    # eval still works through the model at a budget
    model.set_budget(0.5)
    logits, aux = model(x)
    assert logits.shape == (10, 5) and aux["masks"]


def test_trainer_remat_knob():
    """Trainer(remat=True): per-block jax.checkpoint on the fused path —
    same math (params match the non-remat step), and a clear guard on
    paths without a remat shape."""
    import pytest

    from peekvit_tpu.training.optim import SGD
    from peekvit_tpu.training.trainer import Trainer

    x = jnp.asarray(np.random.default_rng(9).normal(size=(8, 16, 16, 3)),
                    jnp.float32)
    y = jnp.asarray(np.arange(8) % 5, jnp.int32)
    t_r = Trainer(model=_model(), optimizer=SGD(lr=0.05), fused=True,
                  remat=True)
    t_n = Trainer(model=_model(), optimizer=SGD(lr=0.05), fused=True)
    for i in range(2):
        m_r = t_r.train_step(x, y, step_idx=i)
        m_n = t_n.train_step(x, y, step_idx=i)
    np.testing.assert_allclose(float(m_r["total_loss"]),
                               float(m_n["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t_n.model.params),
                    jax.tree.leaves(t_r.model.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)

    res = build_model(
        "residualvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token="learnable"),
        seed=4,
    )
    t_bad = Trainer(model=res, optimizer=SGD(lr=0.05), fused=True,
                    remat=True)
    with pytest.raises(NotImplementedError, match="remat"):
        t_bad.train_step(x, y, budget=0.5, step_idx=0)
