"""A/B: 12 per-layer Pallas dispatches vs ONE pallas_call over a
(layers, batch) grid for the folded bf16 merged layer (ViT-B/16 @224
bs256, v5e-1).

The shipped engine issues one pallas_call per layer; each dispatch is an
XLA custom call plus a fresh Mosaic prologue, and tokens round-trip HBM
between calls either way. A (L, B) grid with

  - io blocks indexed (l, b) -> (b, 0, 0) and input_output_aliases={0: 0}
    (layer l reads what layer l-1 wrote, B grid steps earlier — far
    outside the pipeline's prefetch lookahead, so no RAW hazard), and
  - weights stacked (L, ...) with blocks indexed (l, b) -> (l, 0, 0)
    (resident during the b sweep, re-fetched once per layer transition:
    ~14 MB / 819 GB/s = 17 us, hidden under the ~4.3 ms b sweep)

runs the whole encoder in one dispatch. This script measures both and
writes benchmarks/encoder_one_call.json; if the one-call form wins it
becomes the engine's plain-path structure.
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
from peekvit_tpu.ops.pallas.fused_attention import (_MERGED_VMEM_LIMIT,
                                                    _layer_kernel)

B, N, D, H, M = 256, 197, 768, 12, 3072
L = 12


def _weights(key):
    ks = jax.random.split(key, 4)
    mk = lambda k, shape: (jax.random.normal(k, shape, jnp.float32)  # noqa: E731
                           * 0.02).astype(jnp.bfloat16)
    return (
        mk(ks[0], (L, D, 3 * D)), jnp.zeros((L, 1, 3 * D), jnp.bfloat16),
        mk(ks[1], (L, D, D)), jnp.zeros((L, 1, D), jnp.bfloat16),
        mk(ks[2], (L, D, M)), jnp.zeros((L, 1, M), jnp.bfloat16),
        mk(ks[3], (L, M, D)), jnp.zeros((L, 1, D), jnp.bfloat16),
    )


def _per_layer_calls(x, ws, shared: bool = False):
    """Shipped structure: one folded merged-layer call per layer.
    ``shared=True`` feeds layer 0's weights to every call (same math
    volume, constant weight working set)."""
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspecs = [full((D, 3 * D)), full((1, 3 * D)), full((D, D)), full((1, D)),
              full((D, M)), full((1, M)), full((M, D)), full((1, D))]
    call = pl.pallas_call(
        functools.partial(_layer_kernel, num_heads=H, eps=1e-5, mode="plain",
                          folded=True),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B,),
        in_specs=[io] + wspecs,
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MERGED_VMEM_LIMIT),
    )
    for li in range(L):
        x = call(x, *(w[0 if shared else li] for w in ws))
    return x


def _one_call(x, ws, mi: int = 1):
    """One dispatch: grid (L, B/mi), aliased token buffer, stacked
    weights."""
    io = pl.BlockSpec((mi, N, D), lambda l, b: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    wfull = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda l, b: (l,) + tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    def kernel(x_ref, wqkv, bqkv, wo, bo, w1, b1, w2, b2, o_ref, *, num_heads,
               eps):
        _layer_kernel(x_ref, wqkv[0], bqkv[0], wo[0], bo[0], w1[0], b1[0],
                      w2[0], b2[0], o_ref, num_heads=num_heads, eps=eps,
                      mode="plain", folded=True)

    return pl.pallas_call(
        functools.partial(kernel, num_heads=H, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(L, B // mi),
        in_specs=[io, wfull((D, 3 * D)), wfull((1, 3 * D)), wfull((D, D)),
                  wfull((1, D)), wfull((D, M)), wfull((1, M)),
                  wfull((M, D)), wfull((1, D))],
        out_specs=io,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MERGED_VMEM_LIMIT),
    )(x, *ws)


def main():
    assert jax.default_backend() == "tpu", "A/B needs the real chip"
    ws = _weights(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, N, D), jnp.bfloat16) * 0.1

    # numerical check first (same math, different dispatch structure)
    a = _per_layer_calls(x, ws)
    b = _one_call(x, ws)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    print(f"max |per_layer - one_call| = {err:.3e}", file=sys.stderr,
          flush=True)

    def run_per_layer(ws, xx, carry):
        return jnp.sum(_per_layer_calls(
            xx.at[0, 0, 0].add((carry * 0).astype(xx.dtype)), ws).astype(
                jnp.float32))

    def run_one_call(ws, xx, carry):
        return jnp.sum(_one_call(
            xx.at[0, 0, 0].add((carry * 0).astype(xx.dtype)), ws).astype(
                jnp.float32))

    def run_shared_weights(ws, xx, carry):
        # every layer uses layer 0's weights: same math volume, but the
        # 14 MB weight working set never changes between calls — isolates
        # the cost of streaming DISTINCT weights per layer
        return jnp.sum(_per_layer_calls(
            xx.at[0, 0, 0].add((carry * 0).astype(xx.dtype)), ws,
            shared=True).astype(jnp.float32))

    def run_one_call_mi2(ws, xx, carry):
        return jnp.sum(_one_call(
            xx.at[0, 0, 0].add((carry * 0).astype(xx.dtype)), ws,
            mi=2).astype(jnp.float32))

    res = {}
    for name, fn in (("per_layer_calls", run_per_layer),
                     ("one_call", run_one_call),
                     ("per_layer_shared_weights", run_shared_weights),
                     ("one_call_mi2", run_one_call_mi2)):
        t = min(device_seconds_per_iter(fn, (ws, x), reps=10)
                for _ in range(3))
        res[name] = round(t * 1e3, 4)
        print(json.dumps({name: res[name]}), flush=True)
    res["delta_ms"] = round(res["per_layer_calls"] - res["one_call"], 4)
    res["max_abs_err"] = err
    res["batch"], res["layers"] = B, L
    with open(os.path.join(os.path.dirname(__file__),
                           "encoder_one_call.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
