"""PCT engine vs linen throughput (ModelNet40 scale: 1024 points, d=128,
4 layers — the reference rankpct/pct configs) on v5e-1.

The linen path is gather/top_k-bound on TPU: its ARPE embedding costs
~93 ms/128 clouds (top_k 37 + neighbor gather 56) while the whole 4-layer
encoder runs in 7 ms on the merged Pallas kernels. The engine's
gather-free ARPE kernel (ops/pallas/pct_embed.py: BN-folded linear split,
bisected k-th distance, masked per-channel max — d2 and the kNN mask
never leave VMEM) plus the shared one-dispatch encoder gives the full
forward at ~12 ms. Writes benchmarks/pct_engine.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import device_seconds_per_iter
from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models.registry import build_model

BS = 128


def main():
    assert jax.default_backend() == "tpu", "bench needs the TPU"
    model = build_model("pct", dict(
        num_points=1024, num_layers=4, num_heads=4, hidden_dim=128,
        mlp_dim=512, num_classes=40))
    x = jax.random.normal(jax.random.key(0), (BS, 1024, 3), jnp.float32)

    apply_fn = model.apply_fn()

    def linen_step(params, xx, carry):
        logits, _ = apply_fn(params, xx.at[0, 0, 0].add(carry * 0), None,
                             None, {}, train=False)
        return jnp.sum(logits)

    t_lin = min(device_seconds_per_iter(linen_step, (model.params, x),
                                        reps=10) for _ in range(2))

    eng = InferenceEngine(model)

    def eng_step(params, xx, carry):
        return jnp.sum(eng._fn(params, xx.at[0, 0, 0].add(carry * 0)))

    t_eng = min(device_seconds_per_iter(eng_step, (eng.params, x), reps=10)
                for _ in range(2))

    out = {"batch": BS, "model": "pct_modelnet40_1024pts",
           "linen_ms": round(t_lin * 1e3, 2),
           "linen_clouds_s": round(BS / t_lin, 1),
           "engine_ms": round(t_eng * 1e3, 2),
           "engine_clouds_s": round(BS / t_eng, 1),
           "speedup": round(t_lin / t_eng, 2)}

    # RankPCT physical-drop engine at budget 0.5 (ranking on every layer)
    rank = build_model("rankpct", dict(
        num_points=1024, num_layers=4, num_heads=4, hidden_dim=128,
        mlp_dim=512, num_classes=40))
    rank.enable_ranking(True)
    reng = InferenceEngine(rank)
    reng(x[:8], budget=0.5)
    rfn = reng._rank_fns[0.5]

    def rank_step(params, xx, carry):
        return jnp.sum(rfn(params, xx.at[0, 0, 0].add(carry * 0)))

    t_r = min(device_seconds_per_iter(rank_step, (reng.params, x), reps=10)
              for _ in range(2))
    out["rankpct_engine@0.5_ms"] = round(t_r * 1e3, 2)
    out["rankpct_engine@0.5_clouds_s"] = round(BS / t_r, 1)
    with open(os.path.join(os.path.dirname(__file__),
                           "pct_engine.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
