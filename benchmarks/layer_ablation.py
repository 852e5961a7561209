"""Per-op VPU-cost ablation for the merged ViT-B/16 layer kernel (v5e-1).

The shipped merged layer (ops/pallas/fused_attention._layer_kernel, folded
plain mode) measures ~4.5 ms/layer at bs256 vs 4.188 ms for the matmul-only
stack (benchmarks/mxu_ceiling.py) — a ~0.3 ms/layer serial-VPU gap
(docs/STATUS.md). This script pins WHERE that gap lives by timing kernel
variants that each strip ONE piece of VPU work from the otherwise-identical
kernel (same grid, same specs, same matmuls):

  full       the shipped folded kernel math (baseline)
  no_clip    softmax exp2 without the [-80, 115] clamp
  no_exp2    scores used raw (no transcendental, no normalize multiply)
  no_norm    rowsum/normalize multiply skipped (exp2 kept)
  no_gelu    MLP activation = identity
  no_ln      LN normalization skipped (rows used raw)
  mm_only    everything stripped (= mxu_ceiling's kernel)

Each Δ vs `full` is that op's serial cost. Timing: nested-fori_loop device
timing (bench.device_seconds_per_iter), min of 2 passes per variant, all in
ONE process — cross-run axon-tunnel noise is ±3-5%, same-process A/B is the
only trustworthy comparison (docs/STATUS.md round-2 finding).

Run:  python benchmarks/layer_ablation.py        (~4 min incl. compiles)
Writes benchmarks/layer_ablation.json and prints one JSON line per variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import device_seconds_per_iter

B, N, D, H, M = 256, 197, 768, 12, 3072
L = 12
LOG2E = 1.4426950408889634


def _variant_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, o_ref, *, num_heads: int,
                    eps: float, skip: frozenset):
    """The folded merged layer with individually strippable VPU ops."""
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    xf = x.astype(jnp.float32)

    def norm(rows):
        if "ln" in skip:
            return rows
        mu = jnp.mean(rows, axis=-1, keepdims=True)
        ms = jnp.mean(rows * rows, axis=-1, keepdims=True)
        var = jnp.maximum(ms - mu * mu, 0.0)
        return (rows - mu) * jax.lax.rsqrt(var + eps)

    def scores_pv(qj, kj, vj):
        qj = (qj.astype(jnp.float32) * (scale * LOG2E)).astype(qj.dtype)
        logits = jax.lax.dot_general(
            qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if "exp2" in skip:
            e = logits.astype(qj.dtype)
        elif "clip" in skip:
            e = jnp.exp2(logits.astype(qj.dtype))
        else:
            e = jnp.exp2(jnp.clip(logits, -80.0, 115.0).astype(qj.dtype))
        ones = vj[:, :1] * jnp.zeros((), vj.dtype) + jnp.ones((), vj.dtype)
        pv_ext = jax.lax.dot_general(
            e, jnp.concatenate([vj, ones], axis=-1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if "norm" in skip or "exp2" in skip:
            return pv_ext[:, :-1]
        return pv_ext[:, :-1] * (1.0 / pv_ext[:, -1:])

    ln = norm(xf).astype(x.dtype)
    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        cols.append(scores_pv(q, k, v).astype(x.dtype))
    attn = jnp.concatenate(cols, axis=-1)
    out = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    y = out + bo_ref[0].astype(jnp.float32) + xf
    ln2 = norm(y).astype(x.dtype)
    h2 = jnp.dot(ln2, w1_ref[...], preferred_element_type=jnp.float32)
    h2 = h2 + b1_ref[0].astype(jnp.float32)
    if "gelu" not in skip:
        h2 = jax.nn.gelu(h2)
    h2 = h2.astype(x.dtype)
    out2 = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
    out2 = out2 + b2_ref[0].astype(jnp.float32) + y
    o_ref[...] = out2.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def variant_layer(ws, skip):
    x, wqkv, bqkv, wo, bo, w1, b1, w2, b2 = ws
    b, n, d = x.shape
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_variant_kernel, num_heads=H, eps=1e-5,
                          skip=skip),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[io, full((d, 3 * d)), full((1, 3 * d)), full((d, d)),
                  full((1, d)), full((d, m)), full((1, m)), full((m, d)),
                  full((1, d))],
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, wqkv, bqkv, wo, bo, w1, b1, w2, b2)


VARIANTS = {
    "full": frozenset(),
    "no_clip": frozenset({"clip"}),
    "no_exp2": frozenset({"exp2"}),
    "no_norm": frozenset({"norm"}),
    "no_gelu": frozenset({"gelu"}),
    "no_ln": frozenset({"ln"}),
    "mm_only": frozenset({"clip", "exp2", "norm", "gelu", "ln"}),
}


def main():
    assert jax.default_backend() == "tpu", "ablation bench needs the TPU"
    ks = jax.random.split(jax.random.key(0), 4)
    wqkv = jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[1], (D, D), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (D, M), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (M, D), jnp.bfloat16) * 0.02
    zeros = lambda k: jnp.zeros((k,), jnp.bfloat16)  # noqa: E731
    x = jax.random.normal(jax.random.key(9), (B, N, D), jnp.bfloat16)
    weights = (wqkv, zeros(3 * D).reshape(1, -1), wo, zeros(D).reshape(1, -1),
               w1, zeros(M).reshape(1, -1), w2, zeros(D).reshape(1, -1))

    def stack(skip):
        def run(ws, xx, carry):
            t = xx + carry * 0
            for _ in range(L):
                t = variant_layer((t,) + ws, skip)
            return jnp.sum(t.astype(jnp.float32))
        return run

    results = {}
    for name, skip in VARIANTS.items():
        t = min(device_seconds_per_iter(stack(skip), (weights, x), reps=10)
                for _ in range(2))
        results[name] = t * 1000 / L
        print(json.dumps({"variant": name,
                          "layer_ms": round(results[name], 4)}), flush=True)
    deltas = {k: round(results[k] - results["full"], 4)
              for k in results if k != "full"}
    out = {"layer_ms": {k: round(v, 4) for k, v in results.items()},
           "delta_vs_full_ms": deltas, "batch": B, "layers": L}
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "layer_ablation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
