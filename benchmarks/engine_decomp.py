"""Engine-forward decomposition: marginal per-layer cost vs constant
overhead (v5e-1, ViT-B/16 bs256).

benchmarks/layer_ablation.py shows the merged layer KERNEL stack runs at
~4.30 ms/layer standalone with only ~0.07 ms/layer of VPU glue — yet the
shipped engine measures ~54.5 ms per 256-image forward (4696 img/s), i.e.
~2 ms more than 12 x 4.30 + the assumed 0.67 ms embed/classify. This
script pins where the engine-level difference lives by timing the REAL
vit_forward_fused at several depths (marginal cost per layer = slope) and
a 0-layer tree (embed + classify = intercept), plus the embed/classify
pieces separately.

Run:  python benchmarks/engine_decomp.py          (~6 min incl. compiles)
Writes benchmarks/engine_decomp.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import device_seconds_per_iter


def build_params(num_layers: int):
    from peekvit_tpu.inference import prepare_engine_params
    from peekvit_tpu.models.registry import build_model

    model = build_model(
        "vit",
        dict(image_size=224, patch_size=16, num_layers=num_layers,
             num_heads=12, hidden_dim=768, mlp_dim=3072, num_classes=1000),
    )
    # the shipped engine config: bf16, vectors pre-shaped, LN pre-folded
    return prepare_engine_params(model.params, jnp.bfloat16, fold_ln=True)


def main():
    assert jax.default_backend() == "tpu", "decomp bench needs the TPU"
    from peekvit_tpu.inference import (
        _classify,
        _embed,
        _patchify,
        vit_forward_fused,
    )

    x = jax.random.normal(jax.random.key(0), (256, 224, 224, 3),
                          jnp.bfloat16)
    fwd = functools.partial(vit_forward_fused, patch_size=16, num_heads=12)
    out = {}

    def time_depth(L):
        params = build_params(L)

        def step(params, xx, carry):
            # same loop-carry as bench.py: bump the (1, 196, 768) embed
            # bias (0.3 MB) instead of copying the 77 MB input
            bump = (carry * 0).astype(params["_embed_img_bias"].dtype)
            p2 = dict(params,
                      _embed_img_bias=params["_embed_img_bias"] + bump)
            return jnp.sum(fwd(p2, xx))

        t = min(device_seconds_per_iter(step, (params, x), reps=10)
                for _ in range(2))
        return t * 1000

    for L in (0, 6, 12):
        out[f"forward_ms_L{L}"] = round(time_depth(L), 3)
        print(json.dumps({f"forward_ms_L{L}": out[f"forward_ms_L{L}"]}),
              flush=True)

    marg = (out["forward_ms_L12"] - out["forward_ms_L6"]) / 6
    out["marginal_layer_ms"] = round(marg, 4)
    out["intercept_ms"] = round(out["forward_ms_L12"] - 12 * marg, 3)

    # embed alone (patchify + matmul + concats + pos) and patchify alone
    params12 = build_params(12)

    def embed_step(params, xx, carry):
        cast = lambda t: t.astype(jnp.bfloat16)  # noqa: E731
        tokens, _ = _embed(params, xx + carry * 0, 16, 1, 0, cast)
        tokens = tokens + cast(params["encoder"]["pos_embedding"])
        return jnp.sum(tokens.astype(jnp.float32))

    def patchify_step(params, xx, carry):
        return jnp.sum(_patchify(xx + carry * 0, 16).astype(jnp.float32))

    def classify_step(params, xx, carry):
        tokens = jnp.broadcast_to(
            (xx[:, :197, 0, :3] * 0).astype(jnp.bfloat16)[..., :1],
            (256, 197, 768)) + carry.astype(jnp.bfloat16)
        cast = lambda t: t.astype(jnp.bfloat16)  # noqa: E731
        return jnp.sum(_classify(params, tokens, 1, cast))

    for name, fn in (("embed_ms", embed_step), ("patchify_ms", patchify_step),
                     ("classify_ms", classify_step)):
        t = min(device_seconds_per_iter(fn, (params12, x), reps=10)
                for _ in range(2))
        out[name] = round(t * 1000, 3)
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "engine_decomp.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
