"""End-to-end mini-train tests through the real CLI entry point
(SURVEY.md §4 recommendation 5): 2 epochs on synthetic data, checking the
full config -> data -> model -> trainer -> checkpoint -> logging stack."""

import ast
import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "train"))


def _run_train(tmp_path, overrides):
    from train import main

    base = [
        f"workspace={tmp_path}",
        "dataset=synthetic",
        "dataset.image_size=16",
        "dataset.train_size=64",
        "dataset.val_size=32",
        "training.train_batch_size=16",
        "training.eval_batch_size=16",
        "training.num_epochs=2",
        "training.eval_every=2",
        "training.checkpoint_every=2",
        "training.num_workers=0",
        "model.patch_size=8",
        "model.num_layers=2",
        "model.hidden_dim=32",
        "model.mlp_dim=64",
        "model.num_heads=2",
    ]
    return main(base + list(overrides))[0]


def test_train_vit_end_to_end(tmp_path):
    res = _run_train(tmp_path, [])
    exp = res["experiment_dir"]
    # experiment layout (reference utils.py:11-29)
    assert os.path.isdir(os.path.join(exp, "checkpoints"))
    assert os.path.isfile(os.path.join(exp, "config.yaml"))
    # checkpoints written at epochs 0 and 2
    cks = sorted(os.listdir(os.path.join(exp, "checkpoints")))
    assert cks == ["epoch_000", "epoch_002"]
    # log.txt has the reference metric-key schema
    with open(os.path.join(exp, "log.txt")) as f:
        lines = [ast.literal_eval(line) for line in f]
    keys = set().union(*(line.keys() for line in lines))
    assert "train/total_loss" in keys
    assert "train/classification_loss" in keys
    assert "train/lr" in keys
    assert "val/accuracy" in keys
    # training makes progress on the separable synthetic set
    first = next(l for l in lines if "train/total_loss" in l)["train/total_loss"]
    last = [l for l in lines if "train/total_loss" in l][-1]["train/total_loss"]
    assert last < first


def test_train_residualvit_budget_validation(tmp_path):
    res = _run_train(
        tmp_path,
        [
            "model=residualvit",
            "model.patch_size=8",
            "model.num_layers=2",
            "model.hidden_dim=32",
            "model.mlp_dim=64",
            "model.num_heads=2",
            "model.residual_layers=['attention+mlp','attention+mlp']",
            "loss=crossentropy_mse",
            "loss.additional_losses.mse.skip_layers=[]",
            "training.val_budgets=[0.5,1.0]",
            "scheduler=cosineannealing",
        ],
    )
    exp = res["experiment_dir"]
    with open(os.path.join(exp, "log.txt")) as f:
        lines = [ast.literal_eval(line) for line in f]
    keys = set().union(*(line.keys() for line in lines))
    # per-budget validation keys (reference train.py:156)
    assert "budget_0.5/val/accuracy" in keys
    assert "budget_1.0/val/accuracy" in keys
    # regularizer logged per batch
    assert "train/mse" in keys


def test_checkpoint_resume_roundtrip(tmp_path):
    res = _run_train(tmp_path, [])
    exp = res["experiment_dir"]
    from peekvit_tpu.utils.checkpoint import get_checkpoint_path, load_state

    path = get_checkpoint_path(exp)
    assert path and path.endswith("epoch_002")
    model = load_state(path)  # rebuild from metadata alone
    assert model.model_class == "VisionTransformer"
    import jax.numpy as jnp
    import numpy as np

    x = jnp.zeros((2, 16, 16, 3))
    logits, _ = model(x)
    assert np.asarray(logits).shape == (2, 10)


def test_train_qat_static_entry(tmp_path):
    """training.qat=static through the CLI: the entry calibrates caps on
    the first training images (the printed layer count) and the run
    completes with decreasing loss."""
    import ast

    res = _run_train(tmp_path, ["training.qat=static",
                                "training.qat_calib_images=16"])
    exp = res["experiment_dir"]
    with open(os.path.join(exp, "log.txt")) as f:
        lines = [ast.literal_eval(line) for line in f]
    losses = [l["train/total_loss"] for l in lines
              if "train/total_loss" in l]
    assert losses[-1] < losses[0]


def test_multirun_expansion():
    from train import expand_multirun

    combos = list(expand_multirun(["a=1,2", "b=x"]))
    assert combos == [["a=1", "b=x"], ["a=2", "b=x"]]


def test_train_avit_with_act_losses(tmp_path):
    """Mini-train for the A-ViT family: ACT scan + ponder/distr-prior losses
    flow through the jitted step (SURVEY §4 item 5)."""
    res = _run_train(tmp_path, [
        "model=avit_t_16_224",
        "model.patch_size=8", "model.num_layers=3", "model.hidden_dim=32",
        "model.mlp_dim=64", "model.num_heads=2",
        "model.gate_scale=10.0", "model.gate_center=3.0",
        "loss=avit_losses",
        "loss.additional_losses.distr_prior_loss.target_depth=2",
    ])
    import ast

    with open(os.path.join(res["experiment_dir"], "log.txt")) as f:
        lines = [ast.literal_eval(line) for line in f]
    keys = set().union(*(line.keys() for line in lines))
    assert "train/ponder_loss" in keys
    assert "train/distr_prior_loss" in keys
    vals = [l["train/ponder_loss"] for l in lines if "train/ponder_loss" in l]
    assert all(np.isfinite(v) for v in vals)


def test_train_moevit(tmp_path):
    res = _run_train(tmp_path, [
        "model=moevit", "model.patch_size=8", "model.num_layers=2",
        "model.hidden_dim=32", "model.mlp_dim=64", "model.num_heads=2",
        "model.mlp_moes=[1,2]", "model.attn_moes=[1,1]",
    ])
    assert any(v > 0 for v in res["val_accuracy"].values())


def test_profile_epoch_writes_trace(tmp_path):
    res = _run_train(tmp_path, ["training.profile_epoch=0",
                                "training.num_epochs=0",
                                "training.eval_every=-1",
                                "training.checkpoint_every=-1"])
    prof = os.path.join(res["experiment_dir"], "profile")
    assert os.path.isdir(prof) and os.listdir(prof)


def test_train_eeresidualvit_early_exits(tmp_path):
    """EE model trains with mean-CE over all exit heads."""
    res = _run_train(tmp_path, [
        "model=eeresidualvit", "model.patch_size=8", "model.num_layers=2",
        "model.hidden_dim=32", "model.mlp_dim=64", "model.num_heads=2",
        "model.residual_layers=['attention+mlp','attention+mlp']",
        "training.val_budgets=[0.5]",
    ])
    assert res["val_accuracy"], "no validation ran"


def test_train_maevit(tmp_path):
    """MAE model (logits_recon output format) trains through the CLI."""
    res = _run_train(tmp_path, [
        "model=maevit", "model.patch_size=8", "model.num_layers=2",
        "model.hidden_dim=32", "model.mlp_dim=64", "model.num_heads=2",
        "model.decoder_hidden_dim=32", "model.decoder_mlp_dim=64",
        "model.num_decoder_layers=1", "model.num_decoder_heads=2",
    ])
    assert res["val_accuracy"], "no validation ran"


def test_train_epoch_returns_batch_means():
    """Epoch summary dict == mean of per-step metrics (VERDICT r1 item 7:
    last-batch values masqueraded as an epoch summary)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.training.optim import Adam
    from peekvit_tpu.training.trainer import Trainer

    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=1, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=13,
    )
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(1), model.params["head"]["kernel"].shape)
    trainer = Trainer(model=model, optimizer=Adam(lr=1e-3))

    rng = np.random.default_rng(7)
    batches = [
        (jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32),
         jnp.asarray(rng.integers(0, 5, size=(4,)), jnp.int32))
        for _ in range(3)
    ]

    class CaptureLogger:
        def __init__(self):
            self.rows = []

        def log(self, d):
            self.rows.append(dict(d))

    logger = CaptureLogger()
    sums = trainer.train_epoch(iter(batches), epoch=0, logger=logger)
    per_step = [r for r in logger.rows if "train/total_loss" in r]
    assert len(per_step) == 3 == sums["num_batches"]
    want = np.mean([r["train/total_loss"] for r in per_step])
    np.testing.assert_allclose(sums["total_loss"], want, rtol=1e-6)
    # the per-step losses differ, so a last-batch value would NOT match
    assert not np.isclose(per_step[-1]["train/total_loss"], want, rtol=1e-6)


def test_grad_accumulation_matches_big_batch():
    """k accumulated microbatch steps == one step on the concatenated batch
    (optax.MultiSteps averages grads; CE-mean over equal halves = full-batch
    mean), including the lr-schedule write into the wrapped opt state."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.training.optim import Adam, get_learning_rate
    from peekvit_tpu.training.trainer import Trainer

    spec = dict(image_size=16, patch_size=8, num_layers=1, num_heads=2,
                hidden_dim=32, mlp_dim=64, num_classes=5)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, size=(8,)), jnp.int32)

    def run(ga, batches):
        model = build_model("vit", spec, seed=13)
        tr = Trainer(model=model, optimizer=Adam(lr=1e-2),
                     clip_grad_norm=1.0, grad_accumulation=ga)
        for bx, by in batches:
            tr.train_step(bx, by)
        return tr.model.params, tr.opt_state

    p_big, _ = run(1, [(x, y)])
    p_acc, acc_state = run(2, [(x[:4], y[:4]), (x[4:], y[4:])])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7),
        p_big, p_acc)
    # lr remains reachable through the MultiSteps wrapper
    assert get_learning_rate(acc_state) is not None
    # a non-boundary microstep must leave params untouched
    p_half, _ = run(2, [(x[:4], y[:4])])
    model0 = build_model("vit", spec, seed=13)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 p_half, model0.params)
