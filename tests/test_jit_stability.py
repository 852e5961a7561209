"""jit-stability tests (SURVEY.md §4 item 3, BASELINE north star): budget
and noise are traced operands — sweeping them must reuse ONE compilation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peekvit_tpu.models.registry import build_model


def _cache_size(jitted) -> int:
    return jitted._cache_size()


@pytest.mark.parametrize("model_name,args", [
    ("rankvit", dict(rankvit_layers=[1])),
    ("residualvit", dict(residual_layers=["attention+mlp"] * 2,
                         gate_type="sigmoid", add_budget_token=0.5)),
])
def test_budget_sweep_single_compile(model_name, args):
    model = build_model(
        model_name,
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10, **args),
    )
    fn = model.apply_fn()
    jitted = jax.jit(
        lambda p, x, b: fn(p, x, b, None, {"noise": jax.random.key(0)})
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    outs = [jitted(model.params, x, jnp.float32(b))
            for b in (0.25, 0.5, 0.75, 1.0)]
    assert _cache_size(jitted) == 1, "budget sweep recompiled"
    # and the budget actually changes the computation (gate masks differ;
    # logits are all-zero at init because the head is zero-init, vit.py:247)
    m0 = jax.tree.leaves(outs[0][1]["masks"])
    m1 = jax.tree.leaves(outs[-1][1]["masks"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(m0, m1)
    )


def test_noise_sweep_single_compile():
    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10),
        noise_args={"layer": 1, "noise_type": "gaussian"},
    )
    fn = model.apply_fn()
    jitted = jax.jit(
        lambda p, x, nv: fn(p, x, None, nv, {"noise": jax.random.key(1)})
    )
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    outs = [jitted(model.params, x, jnp.float32(v)) for v in (0.0, 5.0, 20.0)]
    assert _cache_size(jitted) == 1, "noise sweep recompiled"


def test_model_call_sweep_reuses_compilation():
    """Model.set_budget + __call__ (the OO eval surface) keeps one entry in
    its internal jit cache across budgets."""
    model = build_model(
        "rankvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10, rankvit_layers=[1]),
    )
    x = jnp.zeros((1, 16, 16, 3))
    for b in (0.3, 0.6, 1.0):
        model.set_budget(b)
        model(x)
    assert model._jitted is not None
    jitted_fns = list(model._jitted.values())
    assert len(jitted_fns) == 1
    assert _cache_size(jitted_fns[0]) == 1


def test_trainer_lr_schedule_no_recompile():
    """Per-epoch lr writes into opt-state don't retrace the train step."""
    from peekvit_tpu.training.optim import Adam, CosineAnnealingLR
    from peekvit_tpu.training.trainer import Trainer

    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=1, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10),
    )
    trainer = Trainer(model=model, optimizer=Adam(lr=0.01),
                      scheduler=CosineAnnealingLR(T_max=10))
    x = jnp.zeros((4, 16, 16, 3))
    y = jnp.zeros((4,), jnp.int32)
    from peekvit_tpu.training.optim import set_learning_rate

    trainer.train_step(x, y, step_idx=0)
    for epoch in range(3):
        trainer.opt_state = set_learning_rate(
            trainer.opt_state, trainer.scheduler.lr_at(epoch, 0.01)
        )
        trainer.train_step(x, y, step_idx=epoch + 1)
    assert _cache_size(trainer._train_step) == 1


def test_rankvit_padded_physical_drop_single_compile():
    """The max_budget InferenceEngine mode: physical token drop with ONE
    compilation across every budget <= max_budget (SURVEY §8 north star;
    VERDICT r1 item 5)."""
    from peekvit_tpu.inference import InferenceEngine

    model = build_model(
        "rankvit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5, rankvit_layers=[1]),
    )
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(3), model.params["head"]["kernel"].shape)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    engine = InferenceEngine(model, compute_dtype=jnp.float32,
                             interpret=True, max_budget=0.5)
    outs = [np.asarray(engine(x, budget=b)) for b in (0.1, 0.25, 0.4, 0.5)]
    assert _cache_size(engine._fn) == 1, "padded drop engine recompiled"
    assert not np.allclose(outs[0], outs[-1])  # budget actually matters
    # static shapes shrink: the padded buffer is ceil(16 * 0.5) + cls = 9
    import math
    assert math.ceil(16 * 0.5) == 8
