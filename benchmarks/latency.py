"""Small-batch serving latency for the ViT-B/16 engines (v5e-1).

Throughput benchmarks run at bs256 where the per-image grid amortizes
everything; a serving deployment also cares about small-batch latency.
This sweep times one engine forward (device time via the fori_loop
subtraction — per-iteration time IS the batch latency) at bs 1/8/32/256
for the bf16 engine and the int8 engine, plus the RankViT drop engine at
budget 0.25. Writes benchmarks/latency.json.

Note: below bs8 the one-dispatch encoder's aliasing guard routes the
bf16 engine to the per-layer path (inference.py), so bs1 also covers
that fallback.
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

B16 = dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
           hidden_dim=768, mlp_dim=3072, num_classes=1000)
SIZES = (1, 8, 32, 256)


def bf16(model):
    model.params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                                model.params)
    return model


def time_fn(fn, params, bs):
    x = jax.random.normal(jax.random.key(0), (bs, 224, 224, 3),
                          jnp.bfloat16)

    def step(params, xx, carry):
        return jnp.sum(fn(params, xx.at[0, 0, 0, 0].add(
            (carry * 0).astype(xx.dtype))))

    # small batches finish in ~1 ms: the (tN - t1)/N subtraction needs
    # enough iterations that the loop body dominates the tunnel's
    # scalar-fetch RTT jitter (bs=1 at reps=20 measured garbage)
    reps = max(20, 2048 // bs)
    return min(device_seconds_per_iter(step, (params, x), reps=reps)
               for _ in range(2))


def main():
    assert jax.default_backend() == "tpu", "latency sweep needs the TPU"
    out = {}

    vit = bf16(build_model("vit", B16))
    for tag, kw in (("vit_bf16", {}), ("vit_int8", dict(quantized=True))):
        eng = InferenceEngine(vit, **kw)
        row = {}
        for bs in SIZES:
            t = time_fn(eng._fn, eng.params, bs)
            row[str(bs)] = {"ms": round(t * 1e3, 3),
                            "img_s": round(bs / t, 1)}
            print(json.dumps({tag: {str(bs): row[str(bs)]}}), flush=True)
        out[tag] = row

    rank = bf16(build_model("rankvit", dict(B16, rankvit_layers=[3, 6, 9])))
    eng = InferenceEngine(rank)
    row = {}
    for bs in SIZES:
        x8 = jax.random.normal(jax.random.key(1), (bs, 224, 224, 3),
                               jnp.bfloat16)
        eng(x8, budget=0.25)
        fn = eng._rank_fns[0.25]
        t = time_fn(fn, eng.params, bs)
        row[str(bs)] = {"ms": round(t * 1e3, 3), "img_s": round(bs / t, 1)}
        print(json.dumps({"rank_bf16@0.25": {str(bs): row[str(bs)]}}),
              flush=True)
    out["rank_bf16@0.25"] = row

    with open(os.path.join(os.path.dirname(__file__),
                           "latency.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
