"""Token-compaction serving for the gated ResidualViT family (VERDICT r4
#1): the opt-in approximate mode that turns gate sparsity into wall-clock.
After each gate the top-capacity tokens BY GATE VALUE are physically
gathered and the buffer shrinks; surplus slots carry mask 0 / value 0 —
the reference's own representation of a gated-off token — so the only
divergences vs the exact masked engine are capacity overflow and the
count of zero-value bias-key slots the softmax sees."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models.registry import build_model

BASE = dict(image_size=32, patch_size=8, num_layers=3, num_heads=2,
            hidden_dim=32, mlp_dim=64, num_classes=10)
RES = dict(BASE, residual_layers=["attention+mlp"] * 3, gate_type="sigmoid",
           gate_bias=0.0, add_budget_token=True)


def _residual_model(seed=0, name="residualvit", args=RES):
    model = build_model(name, args, seed=seed)
    rng = np.random.default_rng(seed + 100)
    model.params["head"]["kernel"] = jnp.asarray(
        rng.normal(size=model.params["head"]["kernel"].shape) * 0.3,
        jnp.float32)
    # non-trivial gates so masks vary across tokens and budgets
    for i in range(args["num_layers"]):
        model.params["encoder"][f"layers_{i}"]["residual_gate"][
            "projection"]["kernel"] = jnp.asarray(
                rng.normal(size=(args["hidden_dim"], 1)) * 0.5, jnp.float32)
    return model


def test_compact_full_capacity_is_bitwise_exact():
    """capacity >= 1.0 (or auto at budget ~1.0) degrades to the EXACT
    dense masked path — bitwise, not approximately."""
    model = _residual_model(0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    exact = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    full = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                           compact=1.0)
    auto = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                           compact=True)
    want = exact(x, budget=0.5)
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(full(x, budget=0.5)))
    np.testing.assert_array_equal(np.asarray(exact(x, budget=1.0)),
                                  np.asarray(auto(x, budget=1.0)))


def _rank_corr(a, b):
    """Mean per-row Spearman of two (B, C) logit arrays."""
    ra = np.argsort(np.argsort(a, -1), -1).astype(np.float64)
    rb = np.argsort(np.argsort(b, -1), -1).astype(np.float64)
    ra -= ra.mean(-1, keepdims=True)
    rb -= rb.mean(-1, keepdims=True)
    num = (ra * rb).sum(-1)
    den = np.sqrt((ra ** 2).sum(-1) * (rb ** 2).sum(-1)) + 1e-12
    return float((num / den).mean())


def test_compact_close_to_exact_and_budget_matters():
    """Approximate mode on an adversarial random-init fixture (heavy
    capacity overflow at low budgets): class ranking must survive
    compaction — high per-image logit rank correlation, majority top-1
    agreement. Exact thresholds are measured at scale in
    benchmarks/parity_agreement.json."""
    model = _residual_model(2)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    exact = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    auto = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                           compact=True)
    outs = []
    for b in (0.3, 0.8):
        want = np.asarray(exact(x, budget=b))
        got = np.asarray(auto(x, budget=b))
        assert _rank_corr(got, want) > 0.9, b
        # top-1 on this fixture flips easily (16 img tokens, random
        # near-tied logits, gates not budget-calibrated => heavy
        # overflow); the scale fixture's per-budget agreement rates live
        # in benchmarks/parity_agreement.json
        agree = np.mean(got.argmax(-1) == want.argmax(-1))
        assert agree >= 0.5, (b, agree)
        outs.append(got)
    assert not np.allclose(outs[0], outs[1])  # budget actually matters


def test_compact_auto_caches_one_fn_per_budget():
    model = _residual_model(4)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    auto = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                           compact=True)
    auto(x, budget=0.25)
    auto(x, budget=0.5)
    auto(x, budget=0.25)
    assert set(auto._compact_fns) == {0.25, 0.5}
    # capacity = min(1, budget + slack), rounded up to 8: 16 img tokens
    # at budget 0.25 -> ceil(0.375*16)=6 -> 8
    assert auto._compact_caps_for(0.375) == (8,) * 3
    assert auto._compact_caps_for(1.0) is None


def test_compact_capacity_bounds_are_static_shapes():
    """The compacted forward really runs on the smaller buffer: a fixed
    float capacity gives ONE compiled fn whose budget stays traced."""
    model = _residual_model(6)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          compact=0.6)
    a = eng(x, budget=0.2)
    b = eng(x, budget=0.6)
    assert a.shape == b.shape == (2, 10)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_compact_ee_outputs():
    model = _residual_model(8, "eeresidualvit", RES)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    exact = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                            ee_outputs=True)
    cpt = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          ee_outputs=True, compact=0.75)
    a, b = exact(x, budget=0.5), cpt(x, budget=0.5)
    assert len(a) == len(b) == RES["num_layers"] + 1
    for u, v in zip(a, b):
        assert np.array_equal(np.asarray(u).argmax(-1),
                              np.asarray(v).argmax(-1))


def test_compact_guards():
    model = _residual_model(10)
    with pytest.raises(NotImplementedError, match="bf16 single-program"):
        InferenceEngine(model, interpret=True, compact=0.5, quantized=True)
    plain = build_model("vit", BASE, seed=11)
    with pytest.raises(NotImplementedError, match="ResidualViT family"):
        InferenceEngine(plain, interpret=True, compact=0.5)
    noisy = build_model(
        "residualvit", RES, seed=12,
        noise_args=dict(noise_type="gaussian", layer=0))
    with pytest.raises(NotImplementedError, match="NoiseBlock"):
        InferenceEngine(noisy, interpret=True, compact=0.5)
    encdec = build_model(
        "encdecresidualvit", dict(RES, decoder_num_layers=1), seed=13)
    with pytest.raises(NotImplementedError, match="recon"):
        InferenceEngine(encdec, interpret=True, compact=0.5,
                        recon_outputs=True)


def test_compact_dp_mesh_matches_single_device():
    from peekvit_tpu.parallel.mesh import make_mesh

    model = _residual_model(14)
    x = jnp.asarray(np.random.default_rng(15).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    single = InferenceEngine(model, compute_dtype=jnp.float32,
                             interpret=True, compact=0.6)
    sharded = InferenceEngine(model, compute_dtype=jnp.float32,
                              interpret=True, compact=0.6,
                              mesh=make_mesh())
    np.testing.assert_allclose(np.asarray(single(x, budget=0.5)),
                               np.asarray(sharded(x, budget=0.5)),
                               rtol=2e-5, atol=2e-5)


def test_compact_engine_exports_serving_bundle(tmp_path):
    """Compact-auto engines export per-budget bundles (capacity static,
    budget traced); the reloaded bundle matches the live engine."""
    from peekvit_tpu.serving import load_serving_bundle, save_serving_bundle

    model = _residual_model(20)
    x = jnp.asarray(np.random.default_rng(21).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          compact=True)
    with pytest.raises(ValueError, match="compact-auto"):
        save_serving_bundle(eng, str(tmp_path / "nob"), x)
    path = save_serving_bundle(eng, str(tmp_path / "b05"), x, budget=0.5)
    loaded = load_serving_bundle(path)
    np.testing.assert_array_equal(np.asarray(loaded(x, budget=0.5)),
                                  np.asarray(eng(x, budget=0.5)))


def test_compact_per_layer_capacity_schedule():
    """compact= accepts a per-layer schedule (decreasing with depth, the
    trained-gate pattern): later layers compact further, a capacity above
    the current width is a no-op, and a wrong-length schedule errors."""
    model = _residual_model(30)
    x = jnp.asarray(np.random.default_rng(31).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    sched = InferenceEngine(model, compute_dtype=jnp.float32,
                            interpret=True, compact=[1.0, 0.75, 0.5])
    out = sched(x, budget=0.5)
    assert out.shape == (4, 10)
    # 16 img tokens: caps [16, 16(12->rounded up), 8] -> compaction fires
    assert sched._compact_caps_for([1.0, 0.75, 0.5]) == (16, 16, 8)
    exact = InferenceEngine(model, compute_dtype=jnp.float32,
                            interpret=True)
    assert _rank_corr(np.asarray(out),
                      np.asarray(exact(x, budget=0.5))) > 0.9
    with pytest.raises(ValueError, match="entries"):
        InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                        compact=[0.5, 0.5])(x, budget=0.5)
