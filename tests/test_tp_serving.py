"""Tensor-parallel serving (parallel/tp_serving.py): the Megatron
head/column-sharded engine forward over a (data, model) mesh must match
the single-device fused engine and the linen forward on the virtual
8-CPU mesh (interpret-mode Pallas partial kernels inside shard_map)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models.registry import build_model
from peekvit_tpu.parallel import make_mesh

REPO = os.path.join(os.path.dirname(__file__), "..")
for _sub in ("train", "validate"):
    _p = os.path.join(REPO, _sub)
    if _p not in sys.path:
        sys.path.insert(0, _p)


VIT_ARGS = dict(image_size=32, patch_size=8, num_layers=3, num_heads=4,
                hidden_dim=64, mlp_dim=128, num_classes=7)


def _vit(seed=91):
    model = build_model("vit", VIT_ARGS, seed=seed)
    # non-degenerate head so logits spread
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(seed + 1), model.params["head"]["kernel"].shape)
    return model


def _images(batch=4, seed=7):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(batch, 32, 32, 3)), jnp.float32)


def test_tp_engine_matches_single_device_engine():
    """dp x tp mesh (2, 4): logits match the single-device fused engine
    (same folded math, different reduction split) to fp32 tolerance."""
    model = _vit()
    x = _images(4)
    single = InferenceEngine(model, compute_dtype=jnp.float32,
                             interpret=True)
    tp = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                         mesh=make_mesh(n_data=2, n_model=4))
    np.testing.assert_allclose(np.asarray(tp(x)), np.asarray(single(x)),
                               rtol=1e-4, atol=1e-4)


def test_tp_engine_matches_linen():
    """Pure-TP mesh (1, 4) vs the linen fp32 forward (erf vs in-kernel
    tanh gelu bounds the tolerance, same as the other engine tests)."""
    model = _vit(seed=95)
    x = _images(2, seed=9)
    want, _ = model.apply_fn()(model.params, x, None, None, {}, train=False)
    tp = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                         mesh=make_mesh(n_data=1, n_model=4))
    np.testing.assert_allclose(np.asarray(tp(x)), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_tp_engine_guards():
    mesh = make_mesh(n_data=2, n_model=4)

    # batch must divide the data axis
    model = _vit(seed=97)
    tp = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                         mesh=mesh)
    with pytest.raises(ValueError, match="divide the mesh"):
        tp(_images(3))

    # heads must divide over the model axis
    bad_heads = build_model("vit", dict(VIT_ARGS, num_heads=2), seed=98)
    with pytest.raises(ValueError, match="num_heads"):
        InferenceEngine(bad_heads, compute_dtype=jnp.float32,
                        interpret=True, mesh=mesh)

    # families without TP partial kernels refuse the model axis with a
    # clear pointer (A-ViT: ACT control flow)
    avit = build_model("adavit", dict(VIT_ARGS), seed=99)
    with pytest.raises(NotImplementedError, match="data-parallel"):
        InferenceEngine(avit, compute_dtype=jnp.float32, interpret=True,
                        mesh=mesh)

    # ResidualViT outside the shipped-config envelope refuses too
    res_nogate = build_model(
        "residualvit",
        dict(VIT_ARGS, residual_layers=["attention+mlp"] * 3,
             gate_type="sigmoid", add_budget_token=False),
        seed=100,
    )
    with pytest.raises(NotImplementedError):
        InferenceEngine(res_nogate, compute_dtype=jnp.float32,
                        interpret=True, mesh=mesh)


def test_tp_engine_registers_and_multi_class_tokens():
    """The embed fold carries registers + N class tokens through the TP
    path unchanged (sum-classifier over 2 class tokens, 2 registers)."""
    model = build_model(
        "vit", dict(VIT_ARGS, num_class_tokens=2, num_registers=2),
        seed=105)
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(106), model.params["head"]["kernel"].shape)
    x = _images(2, seed=13)
    single = InferenceEngine(model, compute_dtype=jnp.float32,
                             interpret=True)
    tp = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                         mesh=make_mesh(n_data=2, n_model=4))
    np.testing.assert_allclose(np.asarray(tp(x)), np.asarray(single(x)),
                               rtol=1e-4, atol=1e-4)


def test_tp_rankvit_exact_drop_matches_single_device():
    """RankViT over the TP schedule (exact physical drop replicated per
    model shard): logits match the single-device exact-drop engine at
    every budget, incl. budget 1.0 (no drop) and the no-budget call."""
    rank = build_model(
        "rankvit", dict(VIT_ARGS, rankvit_layers=[1, 2]), seed=103)
    rank.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(104), rank.params["head"]["kernel"].shape)
    x = _images(4, seed=11)
    single = InferenceEngine(rank, compute_dtype=jnp.float32,
                             interpret=True)
    tp = InferenceEngine(rank, compute_dtype=jnp.float32, interpret=True,
                         mesh=make_mesh(n_data=2, n_model=4))
    for budget in (0.5, 0.25, 1.0):
        np.testing.assert_allclose(
            np.asarray(tp(x, budget=budget)),
            np.asarray(single(x, budget=budget)),
            rtol=1e-4, atol=1e-4, err_msg=f"budget {budget}")
    np.testing.assert_allclose(np.asarray(tp(x)), np.asarray(single(x)),
                               rtol=1e-4, atol=1e-4)


def test_tp_eval_entry_knob(tmp_path):
    """`test.tensor_parallel_devices=2` serves the eval sweep through the
    TP engine (validate/test.py) — accuracy keys come back sane."""
    from train import main as train_main

    res = train_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.train_size=32", "dataset.val_size=24",
        "training.train_batch_size=16", "training.eval_batch_size=8",
        "training.num_epochs=1", "training.eval_every=1",
        "training.checkpoint_every=1", "training.num_workers=0",
        "model.patch_size=8", "model.num_layers=2", "model.hidden_dim=32",
        "model.mlp_dim=64", "model.num_heads=2",
    ])[0]
    from test import main as test_main

    results = test_main([
        f"workspace={tmp_path}", "dataset=synthetic", "dataset.image_size=16",
        "dataset.val_size=24", f"load_from={res['experiment_dir']}",
        "test.test_batch_size=12", "test.num_workers=0",
        "test.tensor_parallel_devices=2", "test.skip_flops_count=true",
    ])
    summary = results[res["experiment_dir"]]
    accs = [a for r in summary["results_per_budget"].values()
            for a in r.values()]
    assert accs and all(0.0 <= a <= 1.0 for a in accs)


RES_ARGS = dict(VIT_ARGS, residual_layers=["attention+mlp"] * 3,
                gate_type="sigmoid")


@pytest.mark.parametrize("budget_token", ["learnable", True])
def test_tp_residualvit_matches_single_device(budget_token):
    """ResidualViT over the TP schedule (masked partial kernels + psum,
    gates replicated per model shard): logits match the single-device
    fused engine at every budget — including the batch-coupled
    non-learnable budget-token mode, whose WHOLE-batch budget-token mean
    must span the data axis of the dp x tp mesh."""
    res = build_model("residualvit",
                      dict(RES_ARGS, add_budget_token=budget_token),
                      seed=121)
    res.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(122), res.params["head"]["kernel"].shape)
    x = _images(4, seed=17)
    single = InferenceEngine(res, compute_dtype=jnp.float32, interpret=True)
    tp = InferenceEngine(res, compute_dtype=jnp.float32, interpret=True,
                         mesh=make_mesh(n_data=2, n_model=4))
    for budget in (0.25, 0.6, 1.0):
        np.testing.assert_allclose(
            np.asarray(tp(x, budget=budget)),
            np.asarray(single(x, budget=budget)),
            rtol=1e-4, atol=1e-4, err_msg=f"budget {budget}")


def test_tp_residualvit_matches_linen():
    """Pure-TP mesh (1, 4) vs the linen fp32 ResidualViT forward."""
    res = build_model("residualvit",
                      dict(RES_ARGS, add_budget_token="learnable"),
                      seed=125)
    x = _images(2, seed=19)
    want, _ = res.apply_fn()(res.params, x, 0.5, None, {}, train=False)
    tp = InferenceEngine(res, compute_dtype=jnp.float32, interpret=True,
                         mesh=make_mesh(n_data=1, n_model=4))
    np.testing.assert_allclose(np.asarray(tp(x, budget=0.5)),
                               np.asarray(want), rtol=2e-3, atol=2e-3)


def test_tp_eeresidualvit_exit_tuple_matches_single_device():
    """The EE variant's per-layer exit heads ride the TP schedule
    (replicated XLA math on post-psum tokens): the (exit_0..exit_{L-1},
    final) tuple matches the single-device EE engine."""
    ee = build_model("eeresidualvit",
                     dict(RES_ARGS, add_budget_token="learnable"), seed=131)
    x = _images(4, seed=23)
    single = InferenceEngine(ee, compute_dtype=jnp.float32, interpret=True,
                             ee_outputs=True)
    tp = InferenceEngine(ee, compute_dtype=jnp.float32, interpret=True,
                         ee_outputs=True,
                         mesh=make_mesh(n_data=2, n_model=4))
    got, want = tp(x, budget=0.4), single(x, budget=0.4)
    assert len(got) == len(want) == 4  # 3 exits + final
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"output {i}")


def test_tp_residual_param_slices_cover_whole_model():
    """Slicing invariant for the residual prep: re-assembling the
    per-shard slices reproduces the (unfolded) single-device weights."""
    from peekvit_tpu.inference import prepare_engine_params
    from peekvit_tpu.parallel.tp_serving import (
        prepare_tp_residual_serving_params,
    )

    res = build_model("residualvit",
                      dict(RES_ARGS, add_budget_token="learnable"),
                      seed=133)
    n_model = 4
    prep = prepare_engine_params(res.params, jnp.float32)
    tp = prepare_tp_residual_serving_params(res.params, n_model, 4,
                                            jnp.float32)
    d = 64
    dl = d // n_model
    for li, key in enumerate(sorted(
            k for k in prep["encoder"] if k.startswith("layers_"))):
        at = prep["encoder"][key]["self_attention"]
        mlp = prep["encoder"][key]["mlp"]
        wq = np.asarray(at["in_proj_kernel"])
        got = np.concatenate(
            [np.concatenate(
                [np.asarray(tp["tp"]["wqkv"][s, li])[:, c * dl:(c + 1) * dl]
                 for s in range(n_model)], axis=1)
             for c in range(3)], axis=1)
        np.testing.assert_array_equal(got, wq)
        wo = np.concatenate(
            [np.asarray(tp["tp"]["wo"][s, li]) for s in range(n_model)],
            axis=0)
        np.testing.assert_array_equal(wo, np.asarray(at["out_proj_kernel"]))
        w1 = np.concatenate(
            [np.asarray(tp["tp"]["w1"][s, li]) for s in range(n_model)],
            axis=1)
        np.testing.assert_array_equal(w1, np.asarray(mlp["fc1_kernel"]))
        np.testing.assert_array_equal(
            np.asarray(tp["shared"]["ln1s"][li]),
            np.asarray(prep["encoder"][key]["ln_1"]["scale"]))
        np.testing.assert_array_equal(
            np.asarray(tp["shared"]["gk"][li]),
            np.asarray(prep["encoder"][key]["residual_gate"]["projection"]
                       ["kernel"]))


def test_tp_param_slices_cover_whole_model():
    """Slicing invariant: re-assembling the per-shard slices reproduces
    the folded single-device weights exactly (no head/column lost)."""
    from peekvit_tpu.inference import prepare_engine_params
    from peekvit_tpu.parallel.tp_serving import prepare_tp_serving_params

    model = _vit(seed=101)
    n_model = 4
    prep = prepare_engine_params(model.params, jnp.float32, fold_ln=True)
    tp = prepare_tp_serving_params(model.params, n_model, 4, jnp.float32)
    d = 64
    dl = d // n_model
    for li, key in enumerate(sorted(
            k for k in prep["encoder"] if k.startswith("layers_"))):
        lp = prep["encoder"][key]
        # qkv: shard s carries [q_s | k_s | v_s]
        wq = np.asarray(lp["_folded_qkv"]["kernel"])
        got = np.concatenate(
            [np.concatenate(
                [np.asarray(tp["tp"]["wqkv"][s, li])[:, c * dl:(c + 1) * dl]
                 for s in range(n_model)], axis=1)
             for c in range(3)], axis=1)
        np.testing.assert_array_equal(got, wq)
        wo = np.concatenate(
            [np.asarray(tp["tp"]["wo"][s, li]) for s in range(n_model)],
            axis=0)
        np.testing.assert_array_equal(
            wo, np.asarray(lp["self_attention"]["out_proj_kernel"]))
        w1 = np.concatenate(
            [np.asarray(tp["tp"]["w1"][s, li]) for s in range(n_model)],
            axis=1)
        np.testing.assert_array_equal(
            w1, np.asarray(lp["_folded_fc1"]["kernel"]))
        w2 = np.concatenate(
            [np.asarray(tp["tp"]["w2"][s, li]) for s in range(n_model)],
            axis=0)
        np.testing.assert_array_equal(
            w2, np.asarray(lp["mlp"]["fc2_kernel"]))
