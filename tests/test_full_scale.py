"""Full-scale (ViT-B/16 @ 224) golden parity: the BASELINE 'top-1 within
0.1 pt at every budget' contract, pinned at the logits level (VERDICT r1
item 4 — earlier parity ran only at toy dims).

No pretrained weights are reachable offline (zero egress, no torchvision),
so the fixture is the DETERMINISTIC torch reference model
(tests/torch_reference.py, seeded): full ViT-B/16 scale, random but
non-degenerate weights. A committed golden-logits file
(tests/fixtures/vit_b16_golden_logits.npy) pins the torch side across
environments; regenerate with
``python tests/test_full_scale.py --regen`` if the torch RNG ever changes.

Chain under test: torch reference -> .pth -> adapters -> linen -> fused
engine -> int8 engine, plus RankViT / ResidualViT budget sweeps at
[0.2, 0.4, 0.8, 1.0].
"""

import math
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # direct `python tests/test_full_scale.py --regen`
    sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models import build_model
from peekvit_tpu.models.registry import MODELS_MAP  # noqa: F401 (import check)

from tests.torch_reference import TorchRankViT, TorchResidualViT, TorchViT

B16 = dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
           hidden_dim=768, mlp_dim=3072, num_classes=1000)
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "vit_b16_golden_logits.npy")
BUDGETS = (0.2, 0.4, 0.8, 1.0)


def _input(batch=2):
    return np.random.default_rng(42).normal(
        size=(batch, 224, 224, 3)).astype(np.float32)


def _make_torch_vit():
    torch.manual_seed(0)
    tm = TorchViT(**B16)
    with torch.no_grad():
        tm.head.weight.normal_(0, 0.02)
        tm.head.bias.zero_()
        tm.class_tokens.normal_(0, 0.02)
    return tm.eval()


@pytest.fixture(scope="module")
def vit_b16_pth(tmp_path_factory):
    tm = _make_torch_vit()
    path = tmp_path_factory.mktemp("b16") / "vit_b16.pth"
    torch.save(tm.peekvit_state_dict(), str(path))
    x = _input()
    with torch.no_grad():
        want = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    return str(path), x, want


def test_golden_logits_fixture(vit_b16_pth):
    """The torch side itself matches the committed golden logits."""
    _, _, want = vit_b16_pth
    golden = np.load(FIXTURE)
    np.testing.assert_allclose(want, golden, rtol=1e-5, atol=1e-5)


def test_full_scale_adapter_linen_engine_parity(vit_b16_pth):
    """torch -> adapters -> linen -> fused engine -> int8, at 224^2."""
    path, x, want = vit_b16_pth
    model = build_model("vit", dict(B16, torch_pretrained_weights=path))
    got, _ = model(jnp.asarray(x))
    got = np.asarray(got)
    spread = np.abs(want).max()
    # 12 layers of fp32 accumulation: tolerance scales with logit spread
    assert np.abs(got - want).max() < 2e-3 * max(spread, 1.0)
    assert np.array_equal(got.argmax(-1), want.argmax(-1))

    engine = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    eng = np.asarray(engine(jnp.asarray(x)))
    assert np.abs(eng - got).max() < 2e-3 * max(spread, 1.0)
    assert np.array_equal(eng.argmax(-1), want.argmax(-1))

    quant = InferenceEngine(model, compute_dtype=jnp.float32,
                            interpret=True, quantized=True)
    q = np.asarray(quant(jnp.asarray(x)))
    assert np.abs(q - want).max() < 0.08 * max(spread, 1.0)
    assert np.array_equal(q.argmax(-1), want.argmax(-1))


def test_full_scale_rankvit_budget_sweep(vit_b16_pth):
    """RankViT-B/16: torch physical drop == linen masked path == engines at
    every budget in the BASELINE sweep."""
    path, x, _ = vit_b16_pth
    rank_layers = [4, 8]
    torch.manual_seed(0)
    tm = TorchRankViT(**B16, rankvit_layers=rank_layers)
    # identical weights to the .pth fixture (the rank ctor consumes extra
    # RNG draws, so re-load the canonical ViT state)
    tm.load_state_dict(_make_torch_vit().state_dict())
    tm = tm.eval()

    model = build_model(
        "rankvit",
        dict(B16, rankvit_layers=rank_layers, torch_pretrained_weights=path),
    )
    engine = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    padded = InferenceEngine(model, compute_dtype=jnp.float32,
                             interpret=True, max_budget=1.0)
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    for budget in BUDGETS:
        tm.set_budget(budget)
        with torch.no_grad():
            want = tm(xt).numpy()
        spread = max(np.abs(want).max(), 1.0)
        got, aux = model(jnp.asarray(x), budget=budget)
        got = np.asarray(got)
        assert np.abs(got - want).max() < 2e-3 * spread, f"budget {budget}"
        assert np.array_equal(got.argmax(-1), want.argmax(-1))
        # mask cascade: ceil(alive * budget) per ranked layer (196 tokens)
        alive = 196
        for i in rank_layers:
            alive = math.ceil(alive * budget)
            m = np.asarray(aux["masks"][f"layer_{i}"])
            assert int(m.sum() / m.shape[0]) == alive, f"layer {i} b={budget}"
        for name, eng in (("exact", engine), ("padded", padded)):
            e = np.asarray(eng(jnp.asarray(x), budget=budget))
            assert np.abs(e - want).max() < 2e-3 * spread, (name, budget)
            assert np.array_equal(e.argmax(-1), want.argmax(-1)), (name, budget)


def test_full_scale_residualvit_budget_sweep():
    """ResidualViT-B/16 (sigmoid gates, constant budget token): torch vs
    linen vs fused masked-kernel engine at every budget."""
    torch.manual_seed(1)
    tm = TorchResidualViT(**B16)
    with torch.no_grad():
        tm.head.weight.normal_(0, 0.02)
        tm.head.bias.zero_()
        tm.class_tokens.normal_(0, 0.02)
        for blk in tm.layers:
            blk.gate_proj.weight.normal_(0, 0.2)  # non-trivial gates
    tm = tm.eval()

    model = build_model(
        "residualvit",
        dict(B16, residual_layers=["attention+mlp"] * 12,
             gate_type="sigmoid", gate_temp=1.0, gate_bias=0.0,
             add_budget_token=0.5),
    )
    # transplant the torch weights (same grammar as test_residualvit.py)
    p = model.params
    # torch (D, C, P, P) -> (P, P, C, D) -> flat (P*P*C, D) patch order
    p["conv_proj"]["kernel"] = jnp.asarray(
        tm.conv_proj.weight.detach().numpy().transpose(2, 3, 1, 0).reshape(
            -1, tm.hidden_dim))
    p["conv_proj"]["bias"] = jnp.asarray(tm.conv_proj.bias.detach().numpy())
    p["class_tokens"] = jnp.asarray(tm.class_tokens.detach().numpy())
    p["encoder"]["pos_embedding"] = jnp.asarray(
        tm.pos_embedding.detach().numpy())
    p["encoder"]["ln"] = {
        "scale": jnp.asarray(tm.ln.weight.detach().numpy()),
        "bias": jnp.asarray(tm.ln.bias.detach().numpy()),
    }
    p["head"]["kernel"] = jnp.asarray(tm.head.weight.detach().numpy().T)
    p["head"]["bias"] = jnp.asarray(tm.head.bias.detach().numpy())
    for i, blk in enumerate(tm.layers):
        p["encoder"][f"layers_{i}"] = {
            "ln_1": {"scale": jnp.asarray(blk.ln_1.weight.detach().numpy()),
                     "bias": jnp.asarray(blk.ln_1.bias.detach().numpy())},
            "ln_2": {"scale": jnp.asarray(blk.ln_2.weight.detach().numpy()),
                     "bias": jnp.asarray(blk.ln_2.bias.detach().numpy())},
            "self_attention": {
                "in_proj_kernel": jnp.asarray(
                    blk.self_attention.in_proj_weight.detach().numpy().T),
                "in_proj_bias": jnp.asarray(
                    blk.self_attention.in_proj_bias.detach().numpy()),
                "out_proj_kernel": jnp.asarray(
                    blk.self_attention.out_proj.weight.detach().numpy().T),
                "out_proj_bias": jnp.asarray(
                    blk.self_attention.out_proj.bias.detach().numpy()),
            },
            "mlp": {
                "fc1_kernel": jnp.asarray(blk.mlp.fc1.weight.detach().numpy().T),
                "fc1_bias": jnp.asarray(blk.mlp.fc1.bias.detach().numpy()),
                "fc2_kernel": jnp.asarray(blk.mlp.fc2.weight.detach().numpy().T),
                "fc2_bias": jnp.asarray(blk.mlp.fc2.bias.detach().numpy()),
            },
            "residual_gate": {"projection": {
                "kernel": jnp.asarray(blk.gate_proj.weight.detach().numpy().T),
                "bias": jnp.asarray(blk.gate_proj.bias.detach().numpy()),
            }},
        }

    x = _input()
    engine = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    for budget in BUDGETS:
        with torch.no_grad():
            want = tm(xt, budget).numpy()
        spread = max(np.abs(want).max(), 1.0)
        got = np.asarray(model(jnp.asarray(x), budget=budget)[0])
        assert np.abs(got - want).max() < 2e-3 * spread, f"budget {budget}"
        assert np.array_equal(got.argmax(-1), want.argmax(-1))
        e = np.asarray(engine(jnp.asarray(x), budget=budget))
        assert np.abs(e - want).max() < 2e-3 * spread, f"engine b={budget}"
        assert np.array_equal(e.argmax(-1), want.argmax(-1))


if __name__ == "__main__":  # fixture regeneration: python tests/test_full_scale.py --regen
    import sys

    if "--regen" in sys.argv:
        tm = _make_torch_vit()
        x = _input()
        with torch.no_grad():
            logits = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.save(FIXTURE, logits)
        print(f"wrote {FIXTURE} {logits.shape}")


# -------------------- realistic (outlier-channel) weights — VERDICT r2 #4


@pytest.fixture(scope="module")
def realistic_b16():
    """ViT-B/16 with pretrained-like outlier channels + a RankViT view of
    the same weights (tests/realistic_weights.py)."""
    from tests.realistic_weights import make_outlier_vit_params

    model = build_model("vit", B16, seed=9)
    model.params = make_outlier_vit_params(model.params, seed=9)
    rank = build_model("rankvit", dict(B16, rankvit_layers=[4, 8]), seed=9)
    rank.params = jax.tree.map(lambda x: x, model.params)
    x = jnp.asarray(_input(4))
    return model, rank, x


def test_realistic_fixture_outliers_and_softmax_clamp(realistic_b16):
    """The fixture must actually exhibit >=10x outlier channels (or it
    proves nothing), the fused kernels' [-80, 115] log2-unit softmax clamp
    must hold with headroom under those outliers, and the fused engine must
    still match the linen forward."""
    from tests.realistic_weights import (
        max_attention_log2_units,
        outlier_ratio,
    )

    model, _, x = realistic_b16
    ratio = outlier_ratio(model.params, x[:2], patch_size=16, num_heads=12)
    assert ratio >= 10.0, f"fixture lost its outliers (ratio {ratio:.1f})"

    worst = max_attention_log2_units(model.params, x[:2], patch_size=16,
                                     num_heads=12)
    assert worst < 80.0, (
        f"attention logits reach {worst:.1f} log2 units — the no-max "
        "softmax clamp in _attn_scores_pv would bite; switch the engine "
        "to a max-subtracting softmax for these weights")

    want, _ = model(x)
    engine = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    got = np.asarray(engine(x))
    want = np.asarray(want)
    spread = max(np.abs(want).max(), 1.0)
    assert np.abs(got - want).max() < 2e-3 * spread
    assert np.array_equal(got.argmax(-1), want.argmax(-1))


def test_realistic_int8_calibrated_agreement_across_budgets(realistic_b16):
    """BASELINE parity contract at ViT-B scale under outlier channels.

    At full compute (budget 1.0) the SmoothQuant-calibrated int8 engine
    must track fp32 tightly (measured ~3% of logit spread) and agree on
    top-1 (the >=99% contract, exact on this batch; the N>=512 statistical
    version lives in benchmarks/parity_agreement.py and BASELINE.md). At
    aggressive budgets the dominant error source is NOT quantization:
    norm-ranked top-k has near-ties at the cut under heavy-tailed outlier
    norms, so ANY arithmetic perturbation flips which tokens survive. The
    low-budget bar therefore constrains what matters for serving — the
    CLASS RANKING (Spearman over the 1000 logits, measured 0.998 at budget
    0.2 vs the bf16 engine's own 0.9993) and top-5 containment of the fp32
    top-1 — instead of the old 8x-relative max-delta bar that would have
    passed almost anything (VERDICT r3)."""
    from benchmarks.parity_agreement import spearman

    _, rank, x = realistic_b16
    quant = InferenceEngine(rank, compute_dtype=jnp.float32, interpret=True,
                            quantized=True, calib_images=np.asarray(x[:2]))
    bf = InferenceEngine(rank, compute_dtype=jnp.bfloat16, interpret=True)
    for budget in (0.2, 1.0):
        want, _ = rank(x, budget=budget)
        want = np.asarray(want)
        got = np.asarray(quant(x, budget=budget))
        spread = np.abs(want).max()
        delta = np.abs(got - want).max()
        if budget == 1.0:
            assert delta < 0.05 * spread, (budget, delta / spread)
            assert np.array_equal(got.argmax(-1), want.argmax(-1))
        else:
            rho_bf = spearman(want, np.asarray(bf(x, budget=budget)))
            rho_i8 = spearman(want, got)
            assert rho_i8 >= max(0.99, rho_bf - 0.005), (
                budget, rho_i8, rho_bf)
            top5 = np.argsort(-got, axis=-1)[:, :5]
            assert (top5 == want.argmax(-1)[:, None]).any(-1).all(), budget


def test_residualvit_quant_calibrated_engine():
    """Residual w8a8 engine with calib_images= (VERDICT r2 #4b): caps flow
    into the masked quant kernels; calibrated logits track the fp32 engine
    at least as closely as the dynamic-scale ones at every budget."""
    model = build_model(
        "residualvit",
        dict(image_size=64, patch_size=16, num_layers=4, num_heads=4,
             hidden_dim=128, mlp_dim=256, num_classes=10,
             residual_layers=["attention+mlp"] * 4, gate_type="sigmoid",
             add_budget_token="learnable"),
        seed=2,
    )
    rng = np.random.default_rng(0)
    p = jax.tree.map(lambda x: np.array(x, np.float32), model.params)
    for name, lp in p["encoder"].items():
        if name.startswith("layers_"):
            lp["residual_gate"]["projection"]["kernel"][:] = rng.normal(
                0, 0.2, lp["residual_gate"]["projection"]["kernel"].shape)
    p["head"]["kernel"][:] = rng.normal(0, 0.02, p["head"]["kernel"].shape)
    model.params = jax.tree.map(jnp.asarray, p)

    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    fp = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    dyn = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          quantized=True)
    cal = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          quantized=True, calib_images=np.asarray(x[:2]))
    assert cal._fn is not dyn._fn
    for budget in (0.3, 1.0):
        ref = np.asarray(fp(x, budget=budget))
        spread = max(np.abs(ref).max(), 1.0)
        d_cal = np.abs(np.asarray(cal(x, budget=budget)) - ref).max()
        assert d_cal < 0.1 * spread, (budget, d_cal)
        # argmax asserted on decided samples only (random-init margins)
        got = np.asarray(cal(x, budget=budget))
        srt = np.sort(ref, axis=-1)
        decided = (srt[:, -1] - srt[:, -2]) > 2 * d_cal
        assert (got.argmax(-1) == ref.argmax(-1))[decided].all(), budget
