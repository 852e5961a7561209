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

    # ---- token-compaction residual serving (round 5, VERDICT r4 #1):
    # the compact engine approximates the EXACT masked engine, so the
    # reference here is the exact bf16 engine itself; divergence =
    # capacity overflow (positive-gate tokens beyond ceil(budget*N))
    # plus the zero-slot bias-key count. Per-budget agreement + the
    # measured overflow fraction are the committed honesty artifact.
    res = build_model("residualvit", dict(
        B16, residual_layers=["attention+mlp"] * 12, gate_type="sigmoid",
        add_budget_token="learnable"), seed=9)
    rp = jax.tree.map(lambda t: np.array(t, np.float32), res.params)
    grng = np.random.default_rng(11)
    for i in range(12):
        lp = rp["encoder"][f"layers_{i}"]
        lp["residual_gate"]["projection"]["kernel"] = grng.normal(
            0, 0.5, (768, 1)).astype(np.float32)
    res.params = jax.tree.map(jnp.asarray, rp)
    exact_eng = InferenceEngine(res, interpret=not on_tpu)
    compact_eng = InferenceEngine(res, interpret=not on_tpu, compact=True)
    apply_res = res.apply_fn()

    from peekvit_tpu.utils.losses import _mask_list

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
        exs, cps, over = [], [], []
        for i in range(0, n_images, BATCH):
            x = jnp.asarray(images[i:i + BATCH])
            exs.append(np.asarray(exact_eng(x, budget=budget)))
            cps.append(np.asarray(compact_eng(x, budget=budget)))
            surv = np.asarray(gate_masks(res.params, x,
                                         jnp.float32(budget)))
            over.append(np.maximum(0, surv - cap) / np.maximum(1, surv))
        stats = agreement_stats(np.concatenate(exs), np.concatenate(cps))
        stats["capacity"] = cap
        stats["mean_overflow_frac"] = round(
            float(np.mean(np.concatenate(over, axis=1))), 4)
        results["residual_compact"][str(budget)] = stats
        print(json.dumps({"residual_compact": budget, **stats}),
              flush=True)

    # ---- routed top-1 MoE (round 5, VERDICT r4 #2): exact vs the dense
    # engine unless an expert overflows its capacity
    moe = build_model("moevit", dict(
        B16, mlp_moes=[1, 1, 1, 1, 2, 2, 2, 2, 4, 4, 4, 4]), seed=9)
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

    path = os.path.join(os.path.dirname(__file__), "parity_agreement.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": path}))
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_IMAGES
    main(n)
