"""Tests for the native config system (peekvit_tpu.utils.config) against the
shipped configs/ tree — the hydra contract the reference entry points rely on
(reference configs/train_config.yaml:27-36, README.md:53-70 overrides)."""

import os

import numpy as np
import pytest

from peekvit_tpu.utils.config import (
    instantiate,
    load_config,
    resolve_target,
    save_config,
    to_plain,
)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_composition():
    cfg = load_config(CONFIG_DIR, "train_config")
    assert cfg.model["_target_"].endswith("VisionTransformer")
    assert cfg.dataset.num_classes == 10
    assert cfg.scheduler is None          # '- scheduler: null' default
    assert cfg.noise is None              # no_noise.yaml is literal null
    assert cfg.training.train_batch_size == 128


def test_cross_group_interpolation():
    cfg = load_config(CONFIG_DIR, "train_config")
    # ${dataset.num_classes} / ${dataset.image_size} resolve with types
    assert cfg.model.num_classes == 10 and isinstance(cfg.model.num_classes, int)
    assert cfg.model.image_size == 160
    # chained refs: experiments_dir -> workspace
    assert cfg.experiments_dir == "./workspace/runs"


def test_group_override_and_value_override():
    cfg = load_config(
        CONFIG_DIR,
        "train_config",
        overrides=[
            "model=rankvit",
            "dataset=synthetic",
            "model.patch_size=16",
            "training.num_epochs=3",
            "+extra.flag=true",
            "~load_from",
        ],
    )
    assert cfg.model["_target_"].endswith("RankVisionTransformer")
    assert cfg.model.patch_size == 16
    assert cfg.model.num_classes == 10  # interpolation re-resolves vs synthetic
    assert cfg.training.num_epochs == 3
    assert cfg.extra.flag is True
    assert "load_from" not in cfg


def test_group_override_to_null_and_scheduler_on():
    cfg = load_config(
        CONFIG_DIR, "train_config", overrides=["scheduler=cosineannealing"]
    )
    assert cfg.scheduler["_target_"].endswith("CosineAnnealingLR")
    cfg2 = load_config(CONFIG_DIR, "train_config", overrides=["noise=gaussian"])
    assert cfg2.noise.noise_type == "gaussian"


def test_now_interpolation_and_save_roundtrip(tmp_path):
    cfg = load_config(CONFIG_DIR, "train_config")
    assert cfg.experiment_name[:2] == "20"  # %Y...
    out = tmp_path / "config.yaml"
    save_config(cfg, str(out))
    import yaml

    loaded = yaml.safe_load(out.read_text())
    assert loaded["model"]["hidden_dim"] == to_plain(cfg)["model"]["hidden_dim"]


def test_all_model_configs_compose():
    """Every shipped model config resolves its interpolations and names a
    registered model class."""
    from peekvit_tpu.models.registry import resolve_model_class

    model_dir = os.path.join(CONFIG_DIR, "model")
    for fname in sorted(os.listdir(model_dir)):
        name = fname[:-5]
        ds = "modelnet40" if "pct" in name else "imagenette"
        cfg = load_config(
            CONFIG_DIR, "train_config", overrides=[f"model={name}", f"dataset={ds}"]
        )
        target = cfg.model["_target_"]
        cls_name = target.rsplit(".", 1)[-1]
        assert resolve_model_class(cls_name), name
        assert isinstance(cfg.model.num_classes, int), name


def test_instantiate_optimizer_and_loss_targets():
    cfg = load_config(
        CONFIG_DIR,
        "train_config",
        overrides=["loss=crossentropy_mse", "scheduler=cosineannealing"],
    )
    opt = instantiate(cfg.optimizer)
    assert opt.kind == "adam" and opt.lr == 0.001
    sched = instantiate(cfg.scheduler)
    assert sched.lr_at(0, 0.1) == pytest.approx(0.1)
    assert sched.lr_at(sched.T_max, 0.1) == pytest.approx(sched.eta_min)
    ce = instantiate(cfg.loss.classification_loss)
    import jax.numpy as jnp

    logits = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.array([0, 1])
    assert float(ce(logits, labels)) < 0.2
    # loss group carries the additional_losses dict for LossCompose
    assert "mse" in cfg.loss.additional_losses


def test_reference_style_targets_remap():
    assert resolve_target("peekvit.utils.losses.MSELoss").__name__ == "MSELoss"
    assert resolve_target("torch.optim.Adam").__name__ == "Adam"


def test_test_config_composes():
    cfg = load_config(CONFIG_DIR, "test_config", overrides=["dataset=synthetic"])
    assert cfg.test.budgets == [0.1, 0.2, 0.4, 0.6, 1.0]
    assert cfg.model is None


def test_optim_lr_injection():
    import jax.numpy as jnp
    from peekvit_tpu.training.optim import (
        Adam,
        CosineAnnealingLR,
        get_learning_rate,
        set_learning_rate,
    )

    spec = Adam(lr=0.01)
    tx = spec.build()
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    assert get_learning_rate(state) == pytest.approx(0.01)
    sched = CosineAnnealingLR(T_max=10)
    state = set_learning_rate(state, sched.lr_at(5, 0.01))
    assert get_learning_rate(state) == pytest.approx(0.005)
    # update still works after the host-side lr write
    grads = {"w": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    assert np.allclose(np.asarray(updates["w"]).shape, (3,))


def test_optim_param_mask_freezes():
    import jax.numpy as jnp
    from peekvit_tpu.training.optim import SGD

    params = {"head": jnp.ones((2,)), "backbone": jnp.ones((2,))}
    mask = {"head": True, "backbone": False}
    tx = SGD(lr=1.0).build(param_mask=mask)
    state = tx.init(params)
    grads = {"head": jnp.ones((2,)), "backbone": jnp.ones((2,))}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["backbone"]) == 0.0)
    assert np.all(np.asarray(updates["head"]) != 0.0)
