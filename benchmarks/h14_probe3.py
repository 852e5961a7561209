"""ViT-H/14 attention-structure shootout (v5e-1).

h14_probe2.json pinned the H gap: the merged kernel's 32 per-head
score/PV matmuls cost 1.44 ms/layer against an 0.11 ms analytic cost —
per-matmul MXU fill/drain at (257, 80) shapes that neither token padding
nor head-dim-128 padding recovers (hdpad measured WORSE, 5.08 vs 4.43).
ViT-B amortizes the same structure to noise because its per-image layer
is 16 us, not 69 us, and its per-head matmuls are smaller still.

Candidates measured here at H shapes (B=64, N=257, D=1280, H=16, M=5120):
- xla_layer:   the whole layer in XLA (batched (B*H) attention einsums —
               XLA's batched matmul emitter vs Mosaic's unrolled loop).
- split_hbm:   Pallas for the weight matmuls (qkv; proj+MLP), XLA batched
               attention between them — pays one (B, N, 3D) bf16 HBM
               round trip (~0.3 ms/layer at 819 GB/s) to run attention
               batched.
- twophase:    merged kernel, head loop split into scores-for-all-heads
               then PV-for-all-heads (16 independent matmuls in program
               order for Mosaic to overlap, instead of 16 dependent
               scores->PV chains).
- full:        the shipped structure (reference point from probe2).

Writes benchmarks/h14_probe3.json.
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

B, N, D, H, M = 64, 257, 1280, 16, 5120
HD = D // H
SCALE = 1.0 / (HD ** 0.5)


# ---------------------------------------------------------------- xla layer
@jax.jit
def xla_layer(x, wqkv, wo, w1, w2):
    b, n, d = x.shape
    qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32).astype(x.dtype)
    qkv = qkv.reshape(b, n, 3, H, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (b, H, n, hd)
    e = jnp.einsum("bhqd,bhkd->bhqk", q * SCALE, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(e, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = jnp.dot(attn, wo, preferred_element_type=jnp.float32).astype(x.dtype)
    h2 = jnp.dot(out, w1, preferred_element_type=jnp.float32).astype(x.dtype)
    out2 = jnp.dot(h2, w2, preferred_element_type=jnp.float32)
    return out2.astype(x.dtype)


# ------------------------------------------------------- split: pallas + xla
def _qkv_kernel(x_ref, wqkv_ref, o_ref):
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    qkv = jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = qkv.reshape(mi, n, 3 * d).astype(o_ref.dtype)


def _tail_kernel(a_ref, x_ref, wo_ref, w1_ref, w2_ref, o_ref):
    mi, n, d = x_ref.shape
    a = a_ref[...].reshape(mi * n, d)
    out = jnp.dot(a, wo_ref[...], preferred_element_type=jnp.float32)
    out = out.astype(a.dtype)
    h2 = jnp.dot(out, w1_ref[...],
                 preferred_element_type=jnp.float32).astype(a.dtype)
    out2 = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = out2.reshape(mi, n, d).astype(o_ref.dtype)


@jax.jit
def split_hbm_layer(x, wqkv, wo, w1, w2):
    b, n, d = x.shape
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = lambda w: pl.BlockSpec((1, n, w), lambda i: (i, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    qkv = pl.pallas_call(
        _qkv_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, 3 * d), x.dtype),
        grid=(b,), in_specs=[io(d), full((d, 3 * d))], out_specs=io(3 * d),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, wqkv)
    qkv = qkv.reshape(b, n, 3, H, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    e = jnp.einsum("bhqd,bhkd->bhqk", q * SCALE, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(e, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
    return pl.pallas_call(
        _tail_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[io(d), io(d), full((d, d)), full((d, m)), full((m, d))],
        out_specs=io(d),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(attn, x, wo, w1, w2)


# ----------------------------------------------------- merged (two schedules)
def _merged_kernel(x_ref, wqkv_ref, wo_ref, w1_ref, w2_ref, o_ref, *,
                   twophase: bool):
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    qkv = jnp.dot(x, wqkv_ref[...],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    if twophase:
        es = []
        for h in range(H):
            q = qkv[:, h * HD:(h + 1) * HD]
            k = qkv[:, d + h * HD:d + (h + 1) * HD]
            es.append(jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
        cols = []
        for h in range(H):
            v = qkv[:, 2 * d + h * HD:2 * d + (h + 1) * HD]
            pv = jax.lax.dot_general(
                es[h], v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cols.append(pv.astype(x.dtype))
    else:
        cols = []
        for h in range(H):
            q = qkv[:, h * HD:(h + 1) * HD]
            k = qkv[:, d + h * HD:d + (h + 1) * HD]
            v = qkv[:, 2 * d + h * HD:2 * d + (h + 1) * HD]
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


@functools.partial(jax.jit, static_argnums=(5,))
def merged_layer(x, wqkv, wo, w1, w2, twophase):
    b, n, d = x.shape
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_merged_kernel, twophase=twophase),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[io, full((d, 3 * d)), full((d, d)), full((d, m)),
                  full((m, d))],
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, wqkv, wo, w1, w2)


def time_fn(fn):
    ks = jax.random.split(jax.random.key(0), 4)
    wqkv = jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[1], (D, D), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (D, M), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (M, D), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.key(9), (B, N, D), jnp.bfloat16)

    def stack(ws, xx, carry):
        t = xx + carry * 0
        for _ in range(4):
            t = fn(t, *ws)
        return jnp.sum(t.astype(jnp.float32))

    t = min(device_seconds_per_iter(stack, ((wqkv, wo, w1, w2), x), reps=10)
            for _ in range(2))
    return t * 1000 / 4


def main():
    assert jax.default_backend() == "tpu", "probe needs the TPU"
    out = {"batch": B}
    for name, fn in (
        ("xla_layer", xla_layer),
        ("split_hbm", split_hbm_layer),
        ("twophase", lambda *a: merged_layer(*a, True)),
        ("full", lambda *a: merged_layer(*a, False)),
    ):
        out[name + "_ms"] = round(time_fn(fn), 3)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "h14_probe3.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
