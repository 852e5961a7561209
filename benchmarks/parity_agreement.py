"""Statistical fp32 / bf16 / int8 parity at ViT-B scale, N >= 512 images
(VERDICT r3 #3: the BASELINE "top-1 agreement >= 99%" row previously
rested on a 4-image exact check; exact-on-4 is consistent with a true
agreement rate as low as ~50%).

Measures, on the realistic outlier-channel fixture
(tests/realistic_weights.py — the weight statistic that actually stresses
w8a8) at RankViT budgets [0.2..1.0]:

- top-1 agreement of the bf16 fused engine and the SmoothQuant-calibrated
  int8 engine vs an fp32-precision linen reference
  (jax.default_matmul_precision('highest') on TPU);
- top-5 containment (reference top-1 inside the engine's top-5);
- mean Spearman rank correlation of the 1000-class logit vectors.

The reference semantics being scored: /root/reference/validate/test.py
:116-129 (top-1 accuracy per budget). Results are committed as
benchmarks/parity_agreement.json and quoted in BASELINE.md.

Run:  python benchmarks/parity_agreement.py      (~10 min on v5e-1)
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B16 = dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
           hidden_dim=768, mlp_dim=3072, num_classes=1000)
BUDGETS = (0.2, 0.4, 0.6, 0.8, 1.0)
N_IMAGES = 512
BATCH = 64


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    """Mean Spearman rank correlation over rows (images) of two (B, C)
    logit matrices."""
    ra = a.argsort(-1).argsort(-1).astype(np.float64)
    rb = b.argsort(-1).argsort(-1).astype(np.float64)
    ra -= ra.mean(-1, keepdims=True)
    rb -= rb.mean(-1, keepdims=True)
    num = (ra * rb).sum(-1)
    den = np.sqrt((ra ** 2).sum(-1) * (rb ** 2).sum(-1))
    return float((num / den).mean())


def agreement_stats(ref: np.ndarray, got: np.ndarray) -> dict:
    top1 = float((ref.argmax(-1) == got.argmax(-1)).mean())
    top5 = np.argsort(-got, axis=-1)[:, :5]
    in5 = float((top5 == ref.argmax(-1)[:, None]).any(-1).mean())
    return {"top1_agreement": round(top1, 4),
            "ref_top1_in_top5": round(in5, 4),
            "spearman": round(spearman(ref, got), 4)}


def main(n_images: int = N_IMAGES):
    from peekvit_tpu.inference import InferenceEngine
    from peekvit_tpu.models.registry import build_model
    from tests.realistic_weights import make_outlier_vit_params

    on_tpu = jax.default_backend() == "tpu"
    model = build_model("vit", B16, seed=9)
    model.params = make_outlier_vit_params(model.params, seed=9)
    rank = build_model("rankvit", dict(B16, rankvit_layers=[4, 8]), seed=9)
    rank.params = model.params

    rng = np.random.default_rng(42)
    images = rng.normal(size=(n_images, 224, 224, 3)).astype(np.float32)
    calib = images[:32]

    # fp32-precision linen reference: 'highest' forces the 6-pass bf16
    # matmul decomposition on TPU (~fp32 accurate)
    apply_fn = rank.apply_fn()

    @functools.partial(jax.jit, static_argnums=())
    def ref_fwd(params, x, budget):
        with jax.default_matmul_precision("highest"):
            out, _ = apply_fn(params, x, budget, None, {}, train=False)
        return out

    bf16 = InferenceEngine(rank, interpret=not on_tpu)
    int8 = InferenceEngine(rank, interpret=not on_tpu, quantized=True,
                           calib_images=calib)

    results = {"n_images": n_images, "fixture": "outlier-channel ViT-B/16 "
               "(tests/realistic_weights.py, seed 9), RankViT layers [4, 8]",
               "budgets": {}}
    for budget in BUDGETS:
        refs, bfs, i8s = [], [], []
        for i in range(0, n_images, BATCH):
            x = jnp.asarray(images[i:i + BATCH])
            refs.append(np.asarray(ref_fwd(rank.params, x,
                                           jnp.float32(budget))))
            bfs.append(np.asarray(bf16(x, budget=budget)))
            i8s.append(np.asarray(int8(x, budget=budget)))
        ref = np.concatenate(refs)
        bf = np.concatenate(bfs)
        i8 = np.concatenate(i8s)
        results["budgets"][str(budget)] = {
            "bf16_vs_fp32": agreement_stats(ref, bf),
            "int8_vs_fp32": agreement_stats(ref, i8),
            "int8_vs_bf16": agreement_stats(bf, i8),
        }
        print(json.dumps({"budget": budget,
                          **results["budgets"][str(budget)]}), flush=True)

    compact_routed_sections(results, images, n_images, on_tpu)

    path = os.path.join(os.path.dirname(__file__), "parity_agreement.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": path}))
    return results


def _gate_logit_stats(params, images, budget, gate_temp=1.0, gate_bias=0.0):
    """fp32 mirror of the residual engine's gated forward (the
    collect_residualvit_activation_stats pattern) returning each layer's
    gate-LOGIT mean/std — the direct observation the fixture calibration
    needs (masks only reveal the survivor fraction)."""
    from peekvit_tpu.inference import _embed, _layer_ids
    from peekvit_tpu.ops.attention import attention_core

    cast = lambda t: t.astype(jnp.float32)  # noqa: E731
    tokens, d = _embed(params, images, patch_size=16, num_class_tokens=1,
                       num_registers=0, cast=cast)
    b = tokens.shape[0]
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])
    btok = cast(params["learnable_budget_token_1"]) * jnp.float32(budget)
    tokens = jnp.concatenate(
        [tokens, jnp.broadcast_to(btok, (b, 1, d))], axis=1)

    def ln(x, pr, eps):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * cast(pr["scale"]) \
            + cast(pr["bias"])

    stats = []
    for i in _layer_ids(enc):
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        img = tokens[:, 1:-1]
        gp = lp["residual_gate"]["projection"]
        logits = (img @ cast(gp["kernel"]) + cast(gp["bias"])) / gate_temp \
            + gate_bias
        stats.append((float(jnp.mean(logits)), float(jnp.std(logits)),
                      np.asarray(tokens[:, -1, :])))  # evolved budget tok
        sig = jax.nn.sigmoid(logits)
        bg = lp["budget_token_gate"]
        thr = jax.nn.sigmoid(tokens[:, -1:] @ cast(bg["kernel"])
                             + cast(bg["bias"]))
        mask = jax.nn.relu(sig - thr)
        ones = jnp.ones((b, 1, 1), jnp.float32)
        fwd_mask = jnp.concatenate([ones, mask, ones], axis=1)
        tokens = jnp.concatenate(
            [tokens[:, :1], mask * img, tokens[:, -1:]], axis=1)
        ln1 = ln(tokens, lp["ln_1"], 1e-6) * fwd_mask
        qkv = ln1 @ cast(at["in_proj_kernel"]) + cast(at["in_proj_bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = attention_core(q, k, v, 12)
        tokens = tokens + (attn @ cast(at["out_proj_kernel"])
                           + cast(at["out_proj_bias"])) * fwd_mask
        ln2 = ln(tokens, lp["ln_2"], 1e-6) * fwd_mask
        h = jax.nn.gelu(ln2 @ cast(lp["mlp"]["fc1_kernel"])
                        + cast(lp["mlp"]["fc1_bias"]))
        tokens = tokens + h @ cast(lp["mlp"]["fc2_kernel"]) + cast(
            lp["mlp"]["fc2_bias"])
    return stats


def make_half_survivor_residual(seed: int = 9):
    """A ResidualViT-B/16 fixture with a KNOWN, stable survivor rate:
    every layer's gate logits are normalized to ~N(0, 1) by direct
    observation (fp32 forward mirror, :func:`_gate_logit_stats`,
    iterated — earlier layers' rescaled masks shift later layers' token
    distributions), and the budget-token gate is zeroed so the
    threshold is a constant sigmoid(0) = 0.5 -> a stable survivor rate
    (~0.3*N measured: the calibration targets unit logit spread but the
    deeper layers undershoot; the committed table records the measured
    survivor counts, which is all the capacity comparison needs).

    Why a FIXED survivor rate: a random-init model's gates cannot track
    the budget knob (the learnable budget token is zero at init, and
    the reference's evolved-budget-token threshold is a trained
    behavior no analytic surgery reproduces faithfully — three
    attempts documented in the round-5 log). With survivors pinned at
    0.5*N, sweeping the COMPACTION CAPACITY through the auto engine's
    budget knob yields the committed table the mode actually needs:
    agreement as a function of capacity vs a known survivor count —
    capacity >= survivors (overflow ~0, the phantom slot reproduces
    the dropped zero-token bias keys exactly) vs undersized capacity
    (measured degradation)."""
    from peekvit_tpu.models.registry import build_model as _bm

    res = _bm("residualvit", dict(
        B16, residual_layers=["attention+mlp"] * 12, gate_type="sigmoid",
        gate_bias=0.0,  # the default 10.0 saturates sig ~= 1 everywhere
        add_budget_token="learnable"), seed=seed)
    rp = jax.tree.map(lambda t: np.array(t, np.float32), res.params)
    grng = np.random.default_rng(seed + 2)
    d = B16["hidden_dim"]
    for i in range(12):
        lp = rp["encoder"][f"layers_{i}"]
        lp["residual_gate"]["projection"]["kernel"] = grng.normal(
            0, 0.02, (d, 1)).astype(np.float32)
        lp["budget_token_gate"]["kernel"] = np.zeros((d, 1), np.float32)
        lp["budget_token_gate"]["bias"] = np.zeros((1,), np.float32)
    rp["head"]["kernel"] = grng.normal(0, 0.02, rp["head"]["kernel"].shape
                                       ).astype(np.float32)
    res.params = jax.tree.map(jnp.asarray, rp)

    probe = jnp.asarray(np.random.default_rng(seed + 3).normal(
        size=(8, 224, 224, 3)), np.float32)
    for _ in range(2):
        stats = _gate_logit_stats(res.params, probe, 0.5)
        rp = jax.tree.map(lambda t: np.array(t, np.float32), res.params)
        for i, (mu, sd, _) in enumerate(stats):
            sd = max(sd, 1e-3)
            lp = rp["encoder"][f"layers_{i}"]
            lp["residual_gate"]["projection"]["kernel"] /= sd
            lp["residual_gate"]["projection"]["bias"] = (
                (lp["residual_gate"]["projection"]["bias"] - mu) / sd)
        res.params = jax.tree.map(jnp.asarray, rp)
    return res


def compact_routed_sections(results, images, n_images, on_tpu):
    """Token-compaction + routed-MoE agreement (round 5): the compact
    engine approximates the EXACT masked engine, so the reference here
    is the exact bf16 engine itself. The residual table is an
    agreement-vs-CAPACITY sweep on the fixed-survivor-rate fixture
    (stable measured survivor count per layer): rows where capacity covers the
    survivors show the phantom-slot compensation's fidelity; undersized
    rows show the measured overflow degradation. The routed engine is
    exact vs the dense engine unless an expert overflows its
    capacity."""
    from peekvit_tpu.inference import InferenceEngine
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.utils.losses import _mask_list

    res = make_half_survivor_residual()
    exact_eng = InferenceEngine(res, interpret=not on_tpu)
    compact_eng = InferenceEngine(res, interpret=not on_tpu, compact=True)
    apply_res = res.apply_fn()

    @jax.jit
    def gate_masks(params, x, budget):
        _, aux = apply_res(params, x, budget, None, {}, train=False)
        return jnp.stack([jnp.sum(m[..., 0] > 0, axis=-1)
                          for m in _mask_list(aux)])

    results["residual_compact"] = {}
    n_img_tokens = (224 // 16) ** 2
    for budget in BUDGETS:
        caps = compact_eng._compact_caps_for(
            min(1.0, budget + compact_eng._compact_slack))
        cap = caps[0] if caps else n_img_tokens
        exs, cps, survs = [], [], []
        for i in range(0, n_images, BATCH):
            x = jnp.asarray(images[i:i + BATCH])
            exs.append(np.asarray(exact_eng(x, budget=budget)))
            cps.append(np.asarray(compact_eng(x, budget=budget)))
            survs.append(np.asarray(gate_masks(res.params, x,
                                               jnp.float32(budget))))
        surv = np.concatenate(survs, axis=1)  # (L, n_images)
        stats = agreement_stats(np.concatenate(exs), np.concatenate(cps))
        stats["capacity"] = cap
        stats["mean_survivors"] = round(float(surv.mean()), 1)
        stats["mean_overflow_frac"] = round(
            float(np.mean(np.maximum(0, surv - cap)
                          / np.maximum(1, surv))), 4)
        results["residual_compact"][str(budget)] = stats
        print(json.dumps({"residual_compact": budget, **stats}),
              flush=True)

    # ---- routed top-1 MoE (head randomized: the zero-init classifier
    # would make every logit 0 and the agreement stats vacuous)
    moe = build_model("moevit", dict(
        B16, mlp_moes=[1, 1, 1, 1, 2, 2, 2, 2, 4, 4, 4, 4]), seed=9)
    mp = jax.tree.map(lambda t: np.array(t, np.float32), moe.params)
    mp["head"]["kernel"] = np.random.default_rng(13).normal(
        0, 0.02, mp["head"]["kernel"].shape).astype(np.float32)
    moe.params = jax.tree.map(jnp.asarray, mp)
    dense_eng = InferenceEngine(moe, interpret=not on_tpu)
    results["moevit_routed"] = {}
    for cf in (1.0, 2.0):
        r_eng = InferenceEngine(moe, interpret=not on_tpu, routed=cf)
        ds, rs = [], []
        for i in range(0, n_images, BATCH):
            x = jnp.asarray(images[i:i + BATCH])
            ds.append(np.asarray(dense_eng(x)))
            rs.append(np.asarray(r_eng(x)))
        results["moevit_routed"][f"cf{cf}"] = agreement_stats(
            np.concatenate(ds), np.concatenate(rs))
        print(json.dumps({"moevit_routed_cf": cf,
                          **results["moevit_routed"][f"cf{cf}"]}),
              flush=True)


def rerun_sections_only(n_images: int = N_IMAGES):
    """Re-run ONLY the round-5 sections, merging into the committed
    JSON (the fp32/bf16/int8 rank sweep is ~25 min of compiles)."""
    path = os.path.join(os.path.dirname(__file__), "parity_agreement.json")
    with open(path) as f:
        results = json.load(f)
    rng = np.random.default_rng(42)
    images = rng.normal(size=(n_images, 224, 224, 3)).astype(np.float32)
    on_tpu = jax.default_backend() == "tpu"
    compact_routed_sections(results, images, n_images, on_tpu)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sections":
        rerun_sections_only()  # round-5 compact/routed sections only
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else N_IMAGES
        main(n)
