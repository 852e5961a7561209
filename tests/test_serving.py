"""Serving bundles: export a compiled engine, reload it from the
artifact alone, get the same logits (peekvit_tpu/serving.py; no
reference counterpart — the torch reference serves from the live module,
validate/test.py:113-124)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models.registry import build_model
from peekvit_tpu.serving import load_serving_bundle, save_serving_bundle


def _vit(kind="vit", extra=(), seed=3, **over):
    spec = dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
                hidden_dim=64, mlp_dim=128, num_classes=7)
    spec.update(over)
    model = build_model(kind, spec, seed=seed)
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(9), model.params["head"]["kernel"].shape)
    return model


def _x(b=2, s=32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, s, s, 3)), jnp.float32)


def test_bundle_roundtrip_plain_vit(tmp_path):
    model = _vit()
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    x = _x()
    want = eng(x)
    path = save_serving_bundle(eng, str(tmp_path / "b"), x)
    srv = load_serving_bundle(path)
    got = srv(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # artifact is self-contained: the three files exist
    for f in ("engine.stablehlo", "params.npz", "meta.json"):
        assert (tmp_path / "b" / f).exists()


def test_bundle_roundtrip_quantized(tmp_path):
    model = _vit(seed=5)
    eng = InferenceEngine(model, quantized=True, interpret=True)
    x = _x(seed=2)
    want = eng(x)
    path = save_serving_bundle(eng, str(tmp_path / "q"), x)
    got = load_serving_bundle(path)(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bundle_rankvit_static_budget(tmp_path):
    model = _vit("rankvit", rankvit_layers=[1], seed=7)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    x = _x(seed=3)
    want = eng(x, budget=0.5)
    with pytest.raises(ValueError, match="one geometry per budget"):
        save_serving_bundle(eng, str(tmp_path / "r"), x)
    path = save_serving_bundle(eng, str(tmp_path / "r"), x, budget=0.5)
    srv = load_serving_bundle(path)
    np.testing.assert_array_equal(np.asarray(srv(x, budget=0.5)),
                                  np.asarray(want))
    with pytest.raises(ValueError, match="static budget"):
        srv(x, budget=0.25)


def test_bundle_rankvit_padded_traced_budget(tmp_path):
    """One max_budget= bundle serves every budget under the cap."""
    model = _vit("rankvit", rankvit_layers=[1], seed=7)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          max_budget=0.75)
    x = _x(seed=4)
    path = save_serving_bundle(eng, str(tmp_path / "p"), x)
    srv = load_serving_bundle(path)
    for b in (0.75, 0.5, 0.25):
        np.testing.assert_array_equal(np.asarray(srv(x, budget=b)),
                                      np.asarray(eng(x, budget=b)))
    with pytest.raises(ValueError, match="max_budget"):
        srv(x, budget=0.9)


def test_bundle_residualvit_traced_budget(tmp_path):
    model = build_model(
        "residualvit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=7,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token="learnable"),
        seed=11,
    )
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(9), model.params["head"]["kernel"].shape)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    x = _x(seed=5)
    path = save_serving_bundle(eng, str(tmp_path / "res"), x)
    srv = load_serving_bundle(path)
    for b in (1.0, 0.5):
        np.testing.assert_array_equal(np.asarray(srv(x, budget=b)),
                                      np.asarray(eng(x, budget=b)))


def test_bundle_prunes_dead_param_leaves(tmp_path):
    """The prepared tree carries redundant weight copies (per-layer
    originals + _folded_* + _stacked_layers) so every live-engine
    dispatch path works; the bundle stores only the leaves the traced
    program reads (jax.export module_kept_var_idx) and reloads the rest
    as never-read placeholders."""
    import json

    model = _vit()
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    x = _x()
    want = eng(x)
    path = save_serving_bundle(eng, str(tmp_path / "pr"), x)
    meta = json.loads((tmp_path / "pr" / "meta.json").read_text())
    dead = [k for k, s in meta["params"].items() if s.get("dead")]
    live = [k for k, s in meta["params"].items() if not s.get("dead")]
    assert dead, "fold_ln engines must have dead (redundant) leaves"
    npz = np.load(tmp_path / "pr" / "params.npz")
    assert set(npz.files) == set(live)
    srv = load_serving_bundle(path)
    np.testing.assert_array_equal(np.asarray(srv(x)), np.asarray(want))
    # the pruned leaves are genuinely absent from the served tree
    from peekvit_tpu.serving import _flatten
    assert set(_flatten(srv.params)) == set(live)


def test_bundle_moevit(tmp_path):
    """MoE engines (bf16 and int8 param trees) export via the plain-fn
    path — dense top-1 experts are baked into the traced program."""
    spec = dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
                hidden_dim=64, mlp_dim=128, num_classes=7,
                mlp_moes=[2, 1], attn_moes=[1, 2])
    model = build_model("moevit", spec, seed=13)
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(9), model.params["head"]["kernel"].shape)
    x = _x(seed=6)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    srv = load_serving_bundle(save_serving_bundle(eng, str(tmp_path / "m"),
                                                  x))
    np.testing.assert_array_equal(np.asarray(srv(x)), np.asarray(eng(x)))
    qeng = InferenceEngine(model, quantized=True, interpret=True)
    qsrv = load_serving_bundle(
        save_serving_bundle(qeng, str(tmp_path / "mq"), x))
    np.testing.assert_array_equal(np.asarray(qsrv(x)), np.asarray(qeng(x)))


def test_bundle_adavit(tmp_path):
    """A-ViT: the scanned ACT halting algebra serializes (lax.scan +
    masked merged blocks are ordinary StableHLO)."""
    model = build_model(
        "adavit",
        dict(image_size=32, patch_size=8, num_layers=3, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=7, gate_center=5.0),
        seed=17)
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(9), model.params["head"]["kernel"].shape)
    x = _x(seed=7)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    srv = load_serving_bundle(save_serving_bundle(eng, str(tmp_path / "a"),
                                                  x))
    np.testing.assert_array_equal(np.asarray(srv(x)), np.asarray(eng(x)))


def test_bundle_maevit_recon_outputs(tmp_path):
    """MAE bundles: logits-only by default; recon_outputs=True serves
    the (logits, reconstruction) tuple. The mask_token (train-only) is a
    pruned dead leaf in both."""
    import json

    model = build_model(
        "maevit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=7, mask_ratio=0.25,
             decoder_hidden_dim=32, decoder_mlp_dim=64,
             num_decoder_layers=1, num_decoder_heads=2),
        seed=23)
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(9), model.params["head"]["kernel"].shape)
    x = _x(seed=9)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    srv = load_serving_bundle(save_serving_bundle(eng, str(tmp_path / "m"),
                                                  x))
    np.testing.assert_array_equal(np.asarray(srv(x)), np.asarray(eng(x)))
    meta = json.loads((tmp_path / "m" / "meta.json").read_text())
    assert meta["params"]["mask_token"].get("dead"), \
        "train-only mask_token must be pruned from an eval bundle"

    full = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                           recon_outputs=True)
    srv2 = load_serving_bundle(save_serving_bundle(
        full, str(tmp_path / "mr"), x))
    got, want = srv2(x), full(x)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_bundle_eeresidualvit_tuple_outputs(tmp_path):
    """ee_outputs=True bundles return the full (exit_0.., final) tuple;
    the budget stays a traced scalar in the artifact."""
    model = build_model(
        "eeresidualvit",
        dict(image_size=32, patch_size=8, num_layers=3, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=7,
             residual_layers=["attention+mlp"] * 3, gate_type="sigmoid",
             add_budget_token=0.5),
        seed=19)
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(9), model.params["head"]["kernel"].shape)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          ee_outputs=True)
    x = _x(seed=8)
    srv = load_serving_bundle(save_serving_bundle(eng, str(tmp_path / "ee"),
                                                  x))
    for b in (1.0, 0.6):
        got, want = srv(x, budget=b), eng(x, budget=b)
        assert len(got) == len(want) == 4
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_bundle_encdec_recon_outputs(tmp_path):
    """EncDec recon_outputs=True bundles serve the (logits, recon,
    mask_img) tuple with the budget still a traced scalar."""
    model = build_model(
        "encdecresidualvit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=2,
             hidden_dim=32, mlp_dim=64, num_classes=7,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token="learnable", decoder_num_layers=1),
        seed=29)
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(9), model.params["head"]["kernel"].shape)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          recon_outputs=True)
    x = _x(seed=11)
    srv = load_serving_bundle(save_serving_bundle(eng, str(tmp_path / "ed"),
                                                  x))
    for b in (1.0, 0.5):
        got, want = srv(x, budget=b), eng(x, budget=b)
        assert len(got) == len(want) == 3
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_bundle_pct_and_rankpct(tmp_path):
    """PCT bundles take (B, N, 3) point clouds; RankPCT's exact physical
    drop exports one bundle per budget like exact-drop RankViT."""
    args = dict(num_points=64, num_layers=2, num_heads=4, hidden_dim=64,
                mlp_dim=128, num_classes=40)
    pts = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 64, 3)), jnp.float32)

    model = build_model("pct", args)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    srv = load_serving_bundle(save_serving_bundle(eng, str(tmp_path / "p"),
                                                  pts))
    np.testing.assert_array_equal(np.asarray(srv(pts)), np.asarray(eng(pts)))

    rmodel = build_model("rankpct", args)
    rmodel.enable_ranking(True)
    reng = InferenceEngine(rmodel, compute_dtype=jnp.float32, interpret=True)
    with pytest.raises(ValueError, match="one geometry per budget"):
        save_serving_bundle(reng, str(tmp_path / "r"), pts)
    rsrv = load_serving_bundle(
        save_serving_bundle(reng, str(tmp_path / "r"), pts, budget=0.5))
    np.testing.assert_array_equal(np.asarray(rsrv(pts, budget=0.5)),
                                  np.asarray(reng(pts, budget=0.5)))


def test_bucketed_bundle_pads_and_slices(tmp_path):
    """save_bucketed_bundle serves ANY batch <= the largest bucket; pad
    rows are inert (per-image inference math): sliced outputs are
    bitwise-identical to a direct call on the true batch."""
    from peekvit_tpu.serving import BucketedServingEngine, \
        save_bucketed_bundle

    model = _vit()
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    path = save_bucketed_bundle(eng, str(tmp_path / "bk"), _x(4),
                                batch_sizes=(1, 2, 4))
    srv = load_serving_bundle(path)
    assert isinstance(srv, BucketedServingEngine)
    assert srv.batch_sizes == (1, 2, 4)
    for n in (1, 2, 3, 4):
        x = _x(b=n, seed=20 + n)
        got = np.asarray(srv(x))
        assert got.shape == (n, 7)
        if n in (1, 2, 4):  # exact bucket: the very same traced program
            np.testing.assert_array_equal(got, np.asarray(eng(x)))
        else:  # padded: inert up to fp rounding (XLA gemm blocking is
            # geometry-dependent, so cross-batch-size bitwise is not a
            # contract even on CPU)
            np.testing.assert_allclose(got, np.asarray(eng(x)),
                                       rtol=0, atol=5e-6)
    with pytest.raises(ValueError, match="largest exported bucket"):
        srv(_x(b=5))


def test_bucketed_bundle_traced_budget(tmp_path):
    """Buckets compose with the padded RankViT traced-budget knob: one
    artifact serves any (batch, budget<=cap) pair."""
    from peekvit_tpu.serving import save_bucketed_bundle

    model = _vit("rankvit", rankvit_layers=[1], seed=7)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          max_budget=0.75)
    path = save_bucketed_bundle(eng, str(tmp_path / "rb"), _x(2),
                                batch_sizes=(2, 4))
    srv = load_serving_bundle(path)
    for n, b in ((1, 0.5), (3, 0.25), (4, 0.75)):
        x = _x(b=n, seed=n)
        got, want = np.asarray(srv(x, budget=b)), np.asarray(eng(x, budget=b))
        if n == 4:  # exact bucket -> bitwise; padded -> fp-rounding inert
            np.testing.assert_array_equal(got, want)
        else:
            np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_bucketed_bundle_batch_coupled_refuses_padding(tmp_path):
    """Non-learnable budget-token residual models couple rows through a
    whole-batch budget-token mean: exact bucket sizes serve, padded
    sizes refuse (zero rows would perturb real outputs)."""
    from peekvit_tpu.serving import save_bucketed_bundle

    model = build_model(
        "residualvit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=7,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token=True),
        seed=11,
    )
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    path = save_bucketed_bundle(eng, str(tmp_path / "cp"), _x(2),
                                batch_sizes=(2, 4))
    srv = load_serving_bundle(path)
    assert srv.meta["batch_coupled"] is True
    x = _x(b=2, seed=6)
    np.testing.assert_array_equal(np.asarray(srv(x, budget=0.5)),
                                  np.asarray(eng(x, budget=0.5)))
    with pytest.raises(ValueError, match="whole-batch"):
        srv(_x(b=3), budget=0.5)


def test_serving_cli(tmp_path):
    """python -m peekvit_tpu.serving BUNDLE INPUT.npy: the whole
    deployment surface — load, run, save, bench — without the model
    zoo."""
    from peekvit_tpu.serving import _main

    model = _vit()
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    x = _x()
    path = save_serving_bundle(eng, str(tmp_path / "cli"), x)
    np.save(tmp_path / "batch.npy", np.asarray(x))
    out = str(tmp_path / "logits.npy")
    info = _main([path, str(tmp_path / "batch.npy"), "--out", out,
                  "--bench", "2"])
    assert info["outputs"] == [[2, 7]]
    assert info["ms_per_batch"] > 0
    np.testing.assert_array_equal(np.load(out), np.asarray(eng(x)))


def test_bundle_shape_and_mode_guards(tmp_path):
    model = _vit()
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    x = _x()
    srv = load_serving_bundle(save_serving_bundle(eng, str(tmp_path / "g"),
                                                  x))
    with pytest.raises(ValueError, match="batch"):
        srv(_x(b=3))
    with pytest.raises(ValueError, match="budget knob"):
        srv(x, budget=0.5)
    # noise engines are eval tools, not servable artifacts
    noisy = build_model(
        "vit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=7),
        noise_args=dict(layer=1, noise_type="gaussian"), seed=3)
    neng = InferenceEngine(noisy, compute_dtype=jnp.float32, interpret=True)
    with pytest.raises(NotImplementedError, match="noise"):
        save_serving_bundle(neng, str(tmp_path / "n"), x)
