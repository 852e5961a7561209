"""Round-5 A/B hunt for the last ~4% of bf16 eval (VERDICT r4 #8).

The shipped one-call encoder measures ~4.40 ms/layer marginal vs the
matmul-only 4.206 + measured VPU glue 0.068 (layer_ablation.json) — a
~0.13 ms/layer residual the round-4 ablations attribute to Mosaic
grid/epilogue structure. This script measures every structural variant
of the one-call grid we could construct; whatever it finds is either
shipped (engine change + bench re-run) or committed here as a negative
with the measured numbers.

Variants:
  base_mi2        the shipped one-call grid (L, B/2)
  mi4             images_per_cell=4 (halves grid cells / prologues,
                  doubles per-cell fp32 scratch)
  mi8             images_per_cell=8
  two_layer_cell  grid (L/2, B/mi) with TWO layers unrolled per cell:
                  halves layer-transition weight refetches and per-cell
                  prologue/epilogue pairs at 2x weight VMEM
  dimsem          dimension_semantics=("arbitrary", "arbitrary") made
                  explicit (pipelining hint)

Run on the TPU:  python benchmarks/bf16_last4.py
Writes bf16_last4.json.
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
from peekvit_tpu.ops.pallas.fused_attention import (
    _layer_kernel,
    encoder_layers_one_call,
)

B, N, D, H, M = 256, 197, 768, 12, 3072
L = 12
VMEM = 100 * 1024 * 1024


def two_layer_call(x, stacked, num_heads, eps, mi):
    layers, d = stacked["wqkv"].shape[0], stacked["wqkv"].shape[1]
    b, n, _ = x.shape
    m = stacked["w1"].shape[-1]
    assert layers % 2 == 0
    io = pl.BlockSpec((mi, n, d), lambda l, bi: (bi, 0, 0),
                      memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (2,) + shape, lambda l, bi: (l,) + tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    def kernel(x_ref, wqkv, bqkv, wo, bo, w1, b1, w2, b2, o_ref):
        _layer_kernel(x_ref, wqkv[0], bqkv[0], wo[0], bo[0], w1[0], b1[0],
                      w2[0], b2[0], o_ref, num_heads=num_heads, eps=eps,
                      mode="plain", folded=True)
        _layer_kernel(o_ref, wqkv[1], bqkv[1], wo[1], bo[1], w1[1], b1[1],
                      w2[1], b2[1], o_ref, num_heads=num_heads, eps=eps,
                      mode="plain", folded=True)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(layers // 2, b // mi),
        in_specs=[io, wspec((d, 3 * d)), wspec((1, 3 * d)), wspec((d, d)),
                  wspec((1, d)), wspec((d, m)), wspec((1, m)),
                  wspec((m, d)), wspec((1, d))],
        out_specs=io,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )(x, stacked["wqkv"], stacked["bqkv"], stacked["wo"], stacked["bo"],
      stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"])


def dimsem_call(x, stacked, num_heads, eps, mi):
    layers, d = stacked["wqkv"].shape[0], stacked["wqkv"].shape[1]
    b, n, _ = x.shape
    m = stacked["w1"].shape[-1]
    io = pl.BlockSpec((mi, n, d), lambda l, bi: (bi, 0, 0),
                      memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda l, bi: (l,) + tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    def kernel(x_ref, wqkv, bqkv, wo, bo, w1, b1, w2, b2, o_ref):
        _layer_kernel(x_ref, wqkv[0], bqkv[0], wo[0], bo[0], w1[0], b1[0],
                      w2[0], b2[0], o_ref, num_heads=num_heads, eps=eps,
                      mode="plain", folded=True)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(layers, b // mi),
        in_specs=[io, wspec((d, 3 * d)), wspec((1, 3 * d)), wspec((d, d)),
                  wspec((1, d)), wspec((d, m)), wspec((1, m)),
                  wspec((m, d)), wspec((1, d))],
        out_specs=io,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM,
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, stacked["wqkv"], stacked["bqkv"], stacked["wo"], stacked["bo"],
      stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"])


def main():
    assert jax.default_backend() == "tpu"
    ks = jax.random.split(jax.random.key(0), 8)
    stacked = {
        "wqkv": jax.random.normal(ks[0], (L, D, 3 * D), jnp.bfloat16) * .02,
        "bqkv": jax.random.normal(ks[1], (L, 1, 3 * D), jnp.bfloat16) * .02,
        "wo": jax.random.normal(ks[2], (L, D, D), jnp.bfloat16) * 0.02,
        "bo": jax.random.normal(ks[3], (L, 1, D), jnp.bfloat16) * 0.02,
        "w1": jax.random.normal(ks[4], (L, D, M), jnp.bfloat16) * 0.02,
        "b1": jax.random.normal(ks[5], (L, 1, M), jnp.bfloat16) * 0.02,
        "w2": jax.random.normal(ks[6], (L, M, D), jnp.bfloat16) * 0.02,
        "b2": jax.random.normal(ks[7], (L, 1, D), jnp.bfloat16) * 0.02,
    }
    x = jax.random.normal(jax.random.key(9), (B, N, D), jnp.bfloat16)

    variants = {
        "base_mi2": jax.jit(functools.partial(
            encoder_layers_one_call, num_heads=H, eps=1e-5,
            images_per_cell=2)),
        "mi4": jax.jit(functools.partial(
            encoder_layers_one_call, num_heads=H, eps=1e-5,
            images_per_cell=4)),
        "two_layer_cell_mi1": jax.jit(functools.partial(
            two_layer_call, num_heads=H, eps=1e-5, mi=1)),
        "two_layer_cell_mi2": jax.jit(functools.partial(
            two_layer_call, num_heads=H, eps=1e-5, mi=2)),
        "dimsem_mi2": jax.jit(functools.partial(
            dimsem_call, num_heads=H, eps=1e-5, mi=2)),
    }
    out = {}
    base_out = None
    for name, fn in variants.items():
        try:
            got = fn(x + 0, stacked)
            if base_out is None:
                base_out = got
            bitwise = bool(jnp.all(got == base_out))

            def step(stk, xx, carry, f=fn):
                return jnp.sum(f(xx + carry.astype(xx.dtype) * 0, stk)
                               .astype(jnp.float32))

            t = min(device_seconds_per_iter(step, (stacked, x), reps=10)
                    for _ in range(2))
            out[name] = {"ms": round(t * 1e3, 3),
                         "ms_per_layer": round(t * 1e3 / L, 4),
                         "bitwise_vs_base": bitwise}
        except Exception as e:  # record compile failures as findings
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: out[name]}), flush=True)

    # working-set note for the 4x variant
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bf16_last4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
