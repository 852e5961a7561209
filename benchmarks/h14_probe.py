"""ViT-H/14 merged-kernel gap probe (v5e-1).

vit_scale.json has ViT-H at 0.769 of its analytic roofline while ViT-B
runs at 0.861 — ~0.9 ms/layer of excess over the analytic layer time.
H differs from B in three ways the kernels care about: N = 257 is not
sublane-aligned (bf16 tiles are (16, 128); 197 = B's N isn't either, but
B runs mi=2 so its row dim is 394), head_dim is 80 (lane slices at
offsets 80h never 128-align), and the 39 MB/layer weights clamp
images_per_cell to 1.

This probe separates those: the mm-only layer stack (benchmarks/
mxu_ceiling.py structure, parametrized to H shapes) and the shipped
one-call encoder are each timed at N = 257 (shipped), 264 (8-aligned)
and 272 (16-aligned, the full bf16 sublane tile). Padded variants are
TIMING-ONLY here (padded keys join the softmax), but the analytic
overhead of the extra rows is priced in `padded_ideal` so the JSON shows
net-win or net-loss directly. Writes benchmarks/h14_probe.json.
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

from bench import device_seconds_per_iter, peak_flops
from peekvit_tpu.ops.pallas.fused_attention import (
    encoder_layers_one_call,
)

B, N, D, H, M, L = 64, 257, 1280, 16, 5120, 32


def _mm_only_kernel(x_ref, wqkv_ref, wo_ref, w1_ref, w2_ref, o_ref,
                    *, num_heads: int):
    mi, n, d = x_ref.shape
    hd = d // num_heads
    x = x_ref[...].reshape(mi * n, d)
    qkv = jnp.dot(x, wqkv_ref[...],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        e = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        pv = jax.lax.dot_general(
            e, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cols.append(pv.astype(x.dtype))
    attn = jnp.concatenate(cols, axis=-1)
    out = jnp.dot(attn, wo_ref[...],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    h2 = jnp.dot(out, w1_ref[...],
                 preferred_element_type=jnp.float32).astype(x.dtype)
    out2 = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = out2.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=())
def mm_only_layer(x, wqkv, wo, w1, w2):
    b, n, d = x.shape
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mm_only_kernel, num_heads=H),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[io, full((d, 3 * d)), full((d, d)), full((d, m)),
                  full((m, d))],
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, wqkv, wo, w1, w2)


def ideal_layer_ms(n):
    macs = n * (3 * D * D) + H * (n * n * (D // H)) * 2 + n * D * D \
        + 2 * n * D * M
    return B * 2.0 * macs / peak_flops(jax.devices()[0]) * 1e3


def time_mm(n):
    ks = jax.random.split(jax.random.key(0), 4)
    wqkv = jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[1], (D, D), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (D, M), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (M, D), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.key(9), (B, n, D), jnp.bfloat16)

    def stack(ws, xx, carry):
        t = xx + carry * 0
        for _ in range(4):
            t = mm_only_layer(t, *ws)
        return jnp.sum(t.astype(jnp.float32))

    t = min(device_seconds_per_iter(stack, ((wqkv, wo, w1, w2), x),
                                    reps=10) for _ in range(2))
    return t * 1000 / 4


def time_one_call(n):
    ks = jax.random.split(jax.random.key(1), 8)
    stacked = {
        "wqkv": jax.random.normal(ks[0], (L, D, 3 * D), jnp.bfloat16) * 0.02,
        "bqkv": jnp.zeros((L, 1, 3 * D), jnp.bfloat16),
        "wo": jax.random.normal(ks[1], (L, D, D), jnp.bfloat16) * 0.02,
        "bo": jnp.zeros((L, 1, D), jnp.bfloat16),
        "w1": jax.random.normal(ks[2], (L, D, M), jnp.bfloat16) * 0.02,
        "b1": jnp.zeros((L, 1, M), jnp.bfloat16),
        "w2": jax.random.normal(ks[3], (L, M, D), jnp.bfloat16) * 0.02,
        "b2": jnp.zeros((L, 1, D), jnp.bfloat16),
    }
    x = jax.random.normal(jax.random.key(5), (B, n, D), jnp.bfloat16)

    def stack(ws, xx, carry):
        t = xx + carry * 0
        t = encoder_layers_one_call(t, ws, H, 1e-5, False)
        return jnp.sum(t.astype(jnp.float32))

    t = min(device_seconds_per_iter(stack, (stacked, x), reps=10)
            for _ in range(2))
    return t * 1000 / L


def main():
    assert jax.default_backend() == "tpu", "probe needs the TPU"
    out = {"batch": B, "ideal_layer_ms_n257": round(ideal_layer_ms(257), 3)}
    for n in (257, 264, 272):
        out[f"mm_only_layer_ms_n{n}"] = round(time_mm(n), 3)
        print(json.dumps({f"mm_n{n}": out[f"mm_only_layer_ms_n{n}"]}),
              flush=True)
    for n in (257, 264, 272):
        out[f"one_call_layer_ms_n{n}"] = round(time_one_call(n), 3)
        out[f"padded_ideal_ms_n{n}"] = round(ideal_layer_ms(n), 3)
        print(json.dumps({f"oc_n{n}": out[f"one_call_layer_ms_n{n}"]}),
              flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "h14_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
