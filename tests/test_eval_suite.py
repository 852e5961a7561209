"""Tests for the eval suite: analytic FLOPs, test.py sweep entry point,
mask/cls-token plot entry points, reconstruction trainer."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
for sub in ("train", "validate"):
    p = os.path.join(REPO, sub)
    if p not in sys.path:
        sys.path.insert(0, p)


@pytest.fixture(scope="module")
def tiny_vit():
    from peekvit_tpu.models.registry import build_model

    return build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10),
    )


@pytest.fixture(scope="module")
def tiny_rank():
    from peekvit_tpu.models.registry import build_model

    return build_model(
        "rankvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10, rankvit_layers=[1]),
    )


def test_analytic_flops_dense_vs_xla(tiny_vit):
    """Analytic count at budget=1 within 2x of XLA's own cost analysis
    (XLA counts LN/softmax/elementwise which we deliberately exclude)."""
    import jax.numpy as jnp

    from peekvit_tpu.utils.flops_count import compute_flops, xla_flops

    x = jnp.zeros((1, 16, 16, 3))
    flops, params = compute_flops(tiny_vit, x)
    assert params > 0 and flops > 0
    fn = tiny_vit.apply_fn()
    dense = xla_flops(
        lambda p, xx: fn(p, xx, None, None, {}, train=False)[0],
        tiny_vit.params, x,
    )
    if dense is not None and dense == dense:
        assert flops < dense * 2.0
        assert flops > dense * 0.2


def test_analytic_flops_decrease_with_budget(tiny_rank):
    import jax.numpy as jnp

    from peekvit_tpu.utils.flops_count import compute_flops

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    f_full, _ = compute_flops(tiny_rank, x, budget=1.0)
    f_half, _ = compute_flops(tiny_rank, x, budget=0.5)
    assert f_half < f_full


def test_sparsity_per_module(tiny_rank):
    import jax.numpy as jnp

    from peekvit_tpu.utils.flops_count import sparsity_per_module

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    s = sparsity_per_module(tiny_rank, x, budget=0.5)
    assert s and all(0.0 <= v <= 1.0 for v in s.values())
    assert any(v <= 0.51 for v in s.values())


def _train_once(tmp_path, extra=()):
    from train import main as train_main

    return train_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.train_size=48", "dataset.val_size=24",
        "training.train_batch_size=16", "training.eval_batch_size=16",
        "training.num_epochs=1", "training.eval_every=1",
        "training.checkpoint_every=1", "training.num_workers=0",
        "model.patch_size=8", "model.num_layers=2", "model.hidden_dim=32",
        "model.mlp_dim=64", "model.num_heads=2", *extra,
    ])[0]


def test_test_entry_budget_sweep(tmp_path):
    res = _train_once(tmp_path, [
        "model=rankvit", "model.rankvit_layers=[1]",
    ])
    from test import main as test_main

    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.budgets=[0.5,1.0]", "test.profile=true",
    ])
    summary = results[res["experiment_dir"]]
    rb = summary["results_per_budget"]
    assert set(rb) == {0.5, 1.0}
    assert all(0.0 <= acc <= 1.0 for r in rb.values() for acc in r.values())
    assert summary["flops"][0.5] < summary["flops"][1.0]
    assert summary["timings_wall"] and summary["timings_device"]
    # recap plots written
    images = os.path.join(res["experiment_dir"], "images")
    assert os.path.isfile(os.path.join(images, "budget_vs_acc.png"))
    assert os.path.isfile(os.path.join(images, "flops_vs_acc.png"))
    # test.profile=true captured a jax.profiler trace of the device loop
    prof = os.path.join(res["experiment_dir"], "profile")
    assert os.path.isdir(prof) and os.listdir(prof)


def test_adavit_noise_sweep_entry(tmp_path):
    """Budget x noise sweep runs on an A-ViT config with the NoiseBlock at
    an arbitrary layer (noise.layer=2) — VERDICT r1 item 6."""
    res = _train_once(tmp_path, ["model=avit_t_16_224",
                                 "model.gate_center=5.0"])
    from test import main as test_main

    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "noise=gaussian", "noise.layer=2", "test.noises=[0.0,8.0]",
    ])
    summary = results[res["experiment_dir"]]
    rb = summary["results_per_budget"]
    # A-ViT takes no budget -> single None budget; both noise points swept
    assert set(rb) == {None}
    assert set(rb[None]) == {0.0, 8.0}
    assert all(0.0 <= acc <= 1.0 for acc in rb[None].values())


def test_mask_and_cls_plot_entries(tmp_path):
    res = _train_once(tmp_path, [
        "model=residualvit", "model.patch_size=8", "model.num_layers=2",
        "model.hidden_dim=32", "model.mlp_dim=64", "model.num_heads=2",
        "model.residual_layers=['attention+mlp','attention+mlp']",
    ])
    from create_mask_plots import main as mask_main
    from create_cls_token_plots import main as cls_main

    overrides = [
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.num_images=2", "test.budgets=[0.5]",
        "test.skip_layers_for_masks=[]",
    ]
    paths = mask_main(overrides)
    assert len(paths) == 2 and all(os.path.isfile(p) for p in paths)
    paths = cls_main(overrides)
    assert len(paths) == 6 and all(os.path.isfile(p) for p in paths)


def test_reconstruction_trainer(tmp_path):
    from train_img_reconstruction import main as recon_main

    res = recon_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.train_size=32", "dataset.val_size=16",
        "training.train_batch_size=16", "training.eval_batch_size=16",
        "training.num_epochs=1", "training.eval_every=1",
        "training.checkpoint_every=-1", "training.num_workers=0",
        "training.plot_masks_every=1", "training.num_images_to_plot=1",
        "training.val_budgets=[0.5]",
        "model=residualvitwithdecoder", "model.patch_size=8",
        "model.num_layers=2", "model.hidden_dim=32", "model.mlp_dim=64",
        "model.num_heads=2",
        "model.residual_layers=['attention+mlp','attention+mlp']",
        "model.decoder_hidden_dim=32", "model.decoder_num_layers=1",
        "model.decoder_num_heads=2", "model.decoder_mlp_dim=64",
    ])
    exp = res["experiment_dir"]
    import ast

    with open(os.path.join(exp, "log.txt")) as f:
        lines = [ast.literal_eval(line) for line in f]
    keys = set().union(*(line.keys() for line in lines))
    assert "train/reconstruction_loss" in keys
    recon_dir = os.path.join(exp, "images", "epoch_0", "recon")
    assert os.path.isdir(recon_dir) and os.listdir(recon_dir)


def test_moe_and_mask_visualizers_inline(tiny_vit):
    """MoE expert maps + budget/noise grid + cumulative plots render."""
    import jax.numpy as jnp

    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.utils import visualize as viz

    moe = build_model(
        "moevit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10, mlp_moes=[1, 2]),
    )
    img = np.random.default_rng(0).normal(size=(16, 16, 3)).astype(np.float32)
    figs = viz.plot_moe_expert_maps(moe, [(img, 0)])
    assert figs
    fig = viz.plot_budget_noise_grid({0.5: {0.0: 0.7, 0.1: 0.6},
                                      1.0: {0.0: 0.9, 0.1: 0.8}})
    assert fig
    fig = viz.plot_cumulative_runs(
        {"a": {"budgets": [0.5, 1.0], "accuracies": [0.6, 0.8]},
         "b": {"budgets": [0.5, 1.0], "accuracies": [0.5, 0.7]}}
    )
    assert fig
    # token norms on plain vit via capture_intermediates
    fig = viz.plot_token_norms(tiny_vit, img)
    assert fig


def test_introspection_parity_helpers():
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.utils.introspection import (
        get_learned_thresholds,
        get_moes,
        get_ranking_layers,
    )

    rv = build_model(
        "residualvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             gate_threshold="learnable", add_budget_token=None),
    )
    thr = get_learned_thresholds(rv.params)
    assert thr and all(abs(v - 0.5) < 1e-6 for v in thr.values())

    moe = build_model(
        "moevit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10, mlp_moes=[1, 3]),
    )
    assert get_moes(moe.module) == {"layer_1/mlp": 3}

    rk = build_model(
        "rankvit",
        dict(image_size=16, patch_size=8, num_layers=3, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=10, rankvit_layers=[1, 2]),
    )
    assert get_ranking_layers(rk.module) == [1, 2]


def test_quickstart_notebook_executes():
    """Execute notebooks/quickstart.ipynb end to end (VERDICT r1 item 9):
    the shipped notebook must actually run on the CPU mesh."""
    import nbformat
    from nbclient import NotebookClient

    path = os.path.join(REPO, "notebooks", "quickstart.ipynb")
    nb = nbformat.read(path, as_version=4)
    n_code = sum(1 for c in nb.cells if c.cell_type == "code")
    # CI parameter cell: the fresh kernel doesn't go through conftest, so
    # pin it to the CPU platform (papermill-style injected parameters)
    nb.cells.insert(0, nbformat.v4.new_code_cell(
        "import jax; jax.config.update('jax_platforms', 'cpu')"))
    client = NotebookClient(
        nb, timeout=600, kernel_name="python3",
        resources={"metadata": {"path": REPO}},
    )
    client.execute()  # raises CellExecutionError on any failure
    executed = [c for c in nb.cells if c.cell_type == "code"]
    assert len(executed) == n_code + 1
    assert all(c.execution_count for c in executed)


def test_moevit_entry_uses_fused_engine(tmp_path, capsys):
    """The eval entry routes MoE models through the fused engine
    (round-3 engine coverage, VERDICT r2 #5) and the sweep completes."""
    res = _train_once(tmp_path, ["model=moevit", "model.mlp_moes=[1,2]"])
    from test import main as test_main

    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.skip_flops_count=true",
    ])
    out = capsys.readouterr().out
    assert "fused InferenceEngine" in out
    summary = results[res["experiment_dir"]]
    rb = summary["results_per_budget"]
    assert set(rb) == {None}
    assert all(0.0 <= acc <= 1.0 for acc in rb[None].values())


def test_noise_sweep_stays_on_engine_path(tmp_path, capsys):
    """The budget x noise grid — the reference's headline eval mode
    (validate/test.py:97-129) — runs on the fused engine (VERDICT r3 #5:
    the noises==[None] guard used to force the slow linen path)."""
    res = _train_once(tmp_path, [
        "model=rankvit", "model.rankvit_layers=[1]",
    ])
    from test import main as test_main

    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.budgets=[0.5,1.0]", "test.skip_flops_count=true",
        "noise=gaussian", "noise.layer=0", "test.noises=[0.0,8.0]",
    ])
    out = capsys.readouterr().out
    assert "fused InferenceEngine" in out
    summary = results[res["experiment_dir"]]
    rb = summary["results_per_budget"]
    assert set(rb) == {0.5, 1.0}
    assert all(set(r) == {0.0, 8.0} for r in rb.values())
    images = os.path.join(res["experiment_dir"], "images")
    assert os.path.isfile(os.path.join(images, "budget_noise_grid.png"))


def test_eval_entry_exports_serving_bundles(tmp_path, capsys):
    """test.export_bundle=DIR packages the swept engine into standalone
    serving bundles — one per budget for the exact-drop RankViT engine —
    and a reloaded bundle reproduces the engine's logits."""
    import jax.numpy as jnp

    from peekvit_tpu.serving import load_serving_bundle

    res = _train_once(tmp_path, [
        "model=rankvit", "model.rankvit_layers=[1]",
    ])
    from test import main as test_main

    bdir = os.path.join(str(tmp_path), "bundles")
    test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.budgets=[0.5,1.0]", "test.skip_flops_count=true",
        f"test.export_bundle={bdir}", "test.export_buckets=[4,12]",
    ])
    out = capsys.readouterr().out
    assert out.count("exported serving bundle") == 2, out
    srv = load_serving_bundle(os.path.join(bdir, "budget_0.5"))
    # export_buckets -> a bucketed artifact: flexible batch up to the max
    assert srv.batch_sizes == (4, 12)
    for n in (3, 12):
        x = jnp.asarray(np.random.default_rng(n).normal(
            size=(n, 16, 16, 3)), jnp.float32)
        logits = srv(x, budget=0.5)
        assert logits.shape == (n, 10)
        assert np.isfinite(np.asarray(logits)).all()


def test_quantized_calibrated_eval_entry(tmp_path, capsys):
    """validate/test.py with test.quantized=true + calibration knobs: the
    calibration set is drawn from the val loader, the engine reports the
    calibrated int8 path, and the sweep completes with sane accuracies."""
    res = _train_once(tmp_path, [
        "model=rankvit", "model.rankvit_layers=[1]",
    ])
    from test import main as test_main

    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.budgets=[0.5]", "test.quantized=true",
        "test.calib_images=12", "test.calib_static_caps=true",
        "test.calib_percentile=99.0",
    ])
    out = capsys.readouterr().out
    assert "int8 w8a8" in out and "calibrated on 12" in out \
        and "static caps" in out, out
    summary = results[res["experiment_dir"]]
    rb = summary["results_per_budget"]
    assert set(rb) == {0.5}
    assert all(0.0 <= acc <= 1.0 for r in rb.values() for acc in r.values())


def test_test_entry_compact_and_routed_knobs(tmp_path):
    """Round 5: test.compact routes a ResidualViT eval through the token-
    compaction engine, test.routed routes a MoE eval through the top-1
    routed dispatch — both end to end through the CLI."""
    res = _train_once(tmp_path, [
        "model=residualvit",
        "model.residual_layers=['attention+mlp','attention+mlp']",
        "model.gate_type=sigmoid", "model.gate_bias=0.0",
        "model.add_budget_token=learnable",
    ])
    from test import main as test_main

    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.budgets=[0.5,1.0]", "test.compact=true",
    ])
    rb = results[res["experiment_dir"]]["results_per_budget"]
    assert set(rb) == {0.5, 1.0}
    assert all(0.0 <= acc <= 1.0 for r in rb.values() for acc in r.values())

    # per-layer capacity schedule through the CLI list form
    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.budgets=[0.5]", "test.compact=[1.0,0.5]",
    ])
    rb = results[res["experiment_dir"]]["results_per_budget"]
    assert all(0.0 <= acc <= 1.0 for r in rb.values() for acc in r.values())

    res_moe = _train_once(tmp_path, [
        "model=moevit", "model.mlp_moes=[1,4]",
    ])
    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res_moe['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.routed=4.0",
    ])
    rb = results[res_moe["experiment_dir"]]["results_per_budget"]
    assert all(0.0 <= acc <= 1.0 for r in rb.values() for acc in r.values())
