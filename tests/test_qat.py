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


def test_static_fake_quant_matches_engine_grid():
    """fq_act(x, cap) forward values == the static-caps engine's
    _quant_rows(x, cap) dequant — fixed scale cap/127, saturation."""
    from peekvit_tpu.ops.pallas.quant_blocks import _quant_rows

    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.normal(size=(6, 16)) * 5.0, jnp.float32)
    cap = 4.0  # saturates the tail: |x| > 4 clips to 127 * cap/127
    xq, s = _quant_rows(x, cap)
    np.testing.assert_array_equal(
        np.asarray(fq_act(x, cap)),
        np.asarray(xq.astype(jnp.float32) * s))
    assert float(jnp.max(jnp.abs(x))) > cap  # the saturation branch fired


def test_static_fake_quant_clipped_ste_gradients():
    """Clipped STE: gradient identity inside |x| <= cap, zero where the
    engine saturates (PACT-style)."""
    x = jnp.asarray([-6.0, -2.0, 0.5, 3.0, 9.0], jnp.float32)
    g = jax.grad(lambda t: jnp.sum(fq_act(t, 4.0)))(x)
    np.testing.assert_array_equal(np.asarray(g),
                                  np.asarray([0.0, 1.0, 1.0, 1.0, 0.0]))


def test_qat_static_trainer_runs_and_validates_caps():
    from peekvit_tpu.inference import collect_qat_caps

    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=21,
    )
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.normal(size=(16, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 16), jnp.int32)
    caps = collect_qat_caps(model, x)
    assert len(caps) == 2 and len(caps[0]) == 2 and len(caps[0][0]) == 2

    t = Trainer(model=model, optimizer=Adam(lr=3e-3), qat="static",
                qat_caps=caps)
    assert t.fused is False
    first = None
    for i in range(25):
        m = t.train_step(x, y, step_idx=i)
        if first is None:
            first = float(m["total_loss"])
    assert float(m["total_loss"]) < first - 0.1

    with pytest.raises(ValueError, match="qat_caps"):
        Trainer(model=model, optimizer=Adam(lr=1e-3), qat="static")
    with pytest.raises(ValueError, match="expected False"):
        Trainer(model=model, optimizer=Adam(lr=1e-3), qat="int4")


def test_qat_static_rejects_cap_or_model_mismatch():
    """A caps tuple that does not line up with the model's encoder layers
    fails the consumption check at trace time with a clear error, and
    collect_qat_caps refuses families whose quantized matmuls fall
    outside the four calibrated per-layer sites."""
    from peekvit_tpu.inference import collect_qat_caps

    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=23,
    )
    x = jnp.asarray(np.random.default_rng(24).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    three_layer_caps = tuple(((1.0, 1.0), (1.0, 1.0)) for _ in range(3))
    apply_fn = model.apply_fn()
    with pytest.raises(ValueError, match="consumed caps unevenly"):
        with fake_quant(True, caps=three_layer_caps):
            apply_fn(model.params, x, None, None, {}, train=False)

    moe = build_model(
        "moevit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5,
             mlp_moes=[1, 2]),
        seed=25,
    )
    with pytest.raises(NotImplementedError, match="static"):
        collect_qat_caps(moe, x)


def test_qat_static_composes_with_gated_residualvit():
    """Static caps from the residual stats collector drive a gated
    ResidualViT fine-tune (caps consumed once per encoder layer through
    the masked forward)."""
    from peekvit_tpu.inference import collect_qat_caps

    model = build_model(
        "residualvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token="learnable"),
        seed=26,
    )
    rng = np.random.default_rng(27)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 8), jnp.int32)
    caps = collect_qat_caps(model, x, budget=0.6)
    t = Trainer(model=model, optimizer=Adam(lr=3e-3), qat="static",
                qat_caps=caps)
    first = None
    for i in range(15):
        m = t.train_step(x, y, budget=0.6, step_idx=i)
        if first is None:
            first = float(m["total_loss"])
    assert float(m["total_loss"]) < first


def test_qat_static_composes_with_rankvit_budget():
    """Static caps from the full-token calibrator drive a RankViT
    fine-tune at a reduced budget: the mask-cascade training forward
    still quantizes each encoder site exactly once per layer, so the
    trace-order cap assignment holds under token ranking."""
    from peekvit_tpu.inference import collect_qat_caps

    model = build_model(
        "rankvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5,
             rankvit_layers=[0, 1]),
        seed=31,
    )
    rng = np.random.default_rng(32)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 8), jnp.int32)
    caps = collect_qat_caps(model, x)
    t = Trainer(model=model, optimizer=Adam(lr=3e-3), qat="static",
                qat_caps=caps)
    first = None
    for i in range(15):
        m = t.train_step(x, y, budget=0.5, step_idx=i)
        if first is None:
            first = float(m["total_loss"])
    assert float(m["total_loss"]) < first


def test_qat_static_beats_plain_through_static_caps_engine():
    """The static analogue of the dynamic end-to-end claim: fine-tune the
    same init plain vs qat='static', recalibrate caps on the trained
    weights (the production flow), and serve BOTH through the
    static-caps int8 forward — the QAT weights must score a lower
    engine-path loss. Calibrated at percentile 95 so the caps actually
    saturate part of the activation tail (the regime static QAT is for;
    at 99.9 on this tiny fixture nothing clips and the two fine-tunes
    tie). Deterministic: fixed seeds throughout."""
    from peekvit_tpu.inference import (
        collect_qat_caps,
        quantize_vit_params,
        vit_forward_quant,
    )

    args = dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
                hidden_dim=32, mlp_dim=64, num_classes=5)
    rng = np.random.default_rng(28)
    x = jnp.asarray(rng.normal(size=(32, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 32), jnp.int32)

    losses = {}
    for mode in ("plain", "static"):
        model = build_model("vit", args, seed=29)
        caps0 = collect_qat_caps(model, x, percentile=95.0)
        t = Trainer(model=model, optimizer=Adam(lr=3e-3), fused=False,
                    qat=("static" if mode == "static" else False),
                    qat_caps=(caps0 if mode == "static" else None))
        for i in range(40):
            t.train_step(x, y, step_idx=i)
        caps = collect_qat_caps(model, x, percentile=95.0)
        logits = vit_forward_quant(
            quantize_vit_params(model.params), x, patch_size=8,
            num_heads=2, compute_dtype=jnp.float32, interpret=True,
            caps=caps)
        logp = jax.nn.log_softmax(logits, axis=-1)
        losses[mode] = float(-jnp.mean(logp[jnp.arange(32), y]))
    assert losses["static"] < losses["plain"], losses


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


def test_smoothed_fake_quant_equals_engine_baked_smoothing():
    """The smoothing hook (x/s, w*s at the LN-output sites) must see the
    SAME grid as the engine's baked-in fold (smooth_vit_params divides
    the LN affines and scales the weight rows): tracing the RAW params
    under fake_quant(smoothing=s) matches tracing the SMOOTHED params
    under fake_quant() to fp-reassociation tolerance ((a*b)/s vs
    a*(b/s)), with caps collected on the smoothed model consumed
    identically by both."""
    from peekvit_tpu.inference import (
        collect_qat_calibration,
        smooth_vit_params,
    )

    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=31,
    )
    rng = np.random.default_rng(32)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    # the classifier head is zero-initialized — randomize it so logits
    # actually reflect the encoder's (quantized) token values
    model.params["head"]["kernel"] = jnp.asarray(
        rng.normal(size=(32, 5)) * 0.2, jnp.float32)
    caps, smoothing = collect_qat_calibration(model, x, percentile=95.0)
    assert len(caps) == 2 and len(smoothing) == 2
    assert smoothing[0][0].shape == (32,)

    apply_fn = model.apply_fn()
    with fake_quant(True, caps=caps, smoothing=smoothing):
        hook_out, _ = apply_fn(model.params, x, None, None, {}, train=False)

    smoothed = smooth_vit_params(model.params, smoothing)
    with fake_quant(True, caps=caps):
        baked_out, _ = apply_fn(smoothed, x, None, None, {}, train=False)
    np.testing.assert_allclose(np.asarray(hook_out), np.asarray(baked_out),
                               rtol=2e-4, atol=2e-4)

    # and the smoothed quantization really differs from the unsmoothed one
    with fake_quant(True, caps=caps):
        unsmoothed_out, _ = apply_fn(model.params, x, None, None, {},
                                     train=False)
    assert float(jnp.max(jnp.abs(hook_out - unsmoothed_out))) > 1e-6


def test_fake_quant_zero_consumption_is_an_error():
    """A calibrated context whose wrapped region never reaches the
    maybe_fq hooks would silently train UNQUANTIZED — {0} consumption is
    rejected (ADVICE r4 #3; the context runs at trace time, so a jit
    cache hit never even enters it)."""
    caps = tuple(((1.0, 1.0), (1.0, 1.0)) for _ in range(2))
    with pytest.raises(ValueError, match="consumed caps unevenly"):
        with fake_quant(True, caps=caps):
            pass  # no model apply traced


def test_fake_quant_caps_smoothing_length_mismatch_errors():
    caps = tuple(((1.0, 1.0), (1.0, 1.0)) for _ in range(2))
    smoothing = tuple((np.ones(8, np.float32), np.ones(8, np.float32))
                      for _ in range(3))
    with pytest.raises(ValueError, match="smoothing"):
        with fake_quant(True, caps=caps, smoothing=smoothing):
            pass
    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=33,
    )
    with pytest.raises(ValueError, match="qat_smoothing"):
        Trainer(model=model, optimizer=Adam(lr=1e-3), qat="static",
                qat_caps=caps, qat_smoothing=smoothing)


def test_qat_calibration_registry_rejects_unsupported_families():
    """Dispatch is an explicit class allowlist (ADVICE r4 #5), not name
    substrings: EncDec-Residual (decoder blocks) is rejected even though
    it walks and quacks like a ResidualViT."""
    from peekvit_tpu.inference import collect_qat_calibration

    encdec = build_model(
        "encdecresidualvit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             gate_bias=0.0, add_budget_token=True, decoder_num_layers=1),
        seed=34,
    )
    x = jnp.asarray(np.random.default_rng(35).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    with pytest.raises(NotImplementedError, match="calibrated qat"):
        collect_qat_calibration(encdec, x)


def test_qat_smoothed_static_trainer_runs_and_loss_decreases():
    from peekvit_tpu.inference import collect_qat_calibration

    model = build_model(
        "vit",
        dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=5),
        seed=36,
    )
    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.normal(size=(16, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 16), jnp.int32)
    caps, smoothing = collect_qat_calibration(model, x, percentile=95.0)
    t = Trainer(model=model, optimizer=Adam(lr=3e-3), qat="static",
                qat_caps=caps, qat_smoothing=smoothing)
    first = None
    for i in range(25):
        m = t.train_step(x, y, step_idx=i)
        if first is None:
            first = float(m["total_loss"])
    assert float(m["total_loss"]) < first - 0.1


def test_qat_smoothed_static_beats_plain_through_calibrated_engine():
    """The SmoothQuant-aware analogue of the static e2e claim (VERDICT
    r4 #7): fine-tune the same init plain vs smoothed-static QAT and
    serve BOTH through the engine's DEFAULT calibrated int8 mode
    (calib_images= + calib_static_caps=True — SmoothQuant baked into the
    weights, caps on the smoothed model, recalibrated on the trained
    weights as production does). The QAT weights must score a lower
    engine-path loss. Percentile 95 so the caps saturate part of the
    tail. Deterministic: fixed seeds throughout."""
    from peekvit_tpu.inference import InferenceEngine, collect_qat_calibration

    args = dict(image_size=16, patch_size=8, num_layers=2, num_heads=2,
                hidden_dim=32, mlp_dim=64, num_classes=5)
    rng = np.random.default_rng(38)
    x = jnp.asarray(rng.normal(size=(32, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 32), jnp.int32)

    losses = {}
    for mode in ("plain", "smoothed"):
        model = build_model("vit", args, seed=39)
        caps0, smooth0 = collect_qat_calibration(model, x, percentile=95.0)
        t = Trainer(model=model, optimizer=Adam(lr=3e-3), fused=False,
                    qat=("static" if mode == "smoothed" else False),
                    qat_caps=(caps0 if mode == "smoothed" else None),
                    qat_smoothing=(smooth0 if mode == "smoothed" else None))
        for i in range(40):
            t.train_step(x, y, step_idx=i)
        eng = InferenceEngine(model, compute_dtype=jnp.float32,
                              interpret=True, quantized=True,
                              calib_images=x, calib_percentile=95.0,
                              calib_static_caps=True)
        logits = eng(x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        losses[mode] = float(-jnp.mean(logp[jnp.arange(32), y]))
    assert losses["smoothed"] < losses["plain"], losses
