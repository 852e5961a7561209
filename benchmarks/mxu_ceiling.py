"""Attainable-ceiling microbench for the ViT-B/16 eval forward (v5e-1).

BASELINE.md's throughput target is stated against the ANALYTIC roofline
(peak bf16 MXU FLOPs / model FLOPs), which assumes every matmul runs at
100% MXU utilization. At head_dim 64 with N = 197 that is not attainable:
the per-head score/PV matmuls fill 64/128 of the systolic depth and
197/256 of the lane tiles (~38% utilization) — a property of the MODEL
SHAPE, not of any kernel. This benchmark PINS the attainable ceiling by
timing a matmul-only variant of the shipped merged layer kernel
(ops/pallas/fused_attention._layer_kernel): the same six matmuls at the
same shapes/dtypes, with the mandatory fp32->bf16 accumulator casts
(Mosaic requires 32-bit matmul accumulators) but NO LayerNorm, softmax,
or gelu. Whatever this stack measures is the speed-of-light for the
layer stack on this chip; the gap between it and the shipped kernel is
the (partially hideable) VPU cost.

Run on the TPU:  python benchmarks/mxu_ceiling.py
Prints one JSON line per measurement plus a summary line.
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

B, N, D, H, M = 256, 197, 768, 12, 3072
L = 12


def _mm_only_kernel(x_ref, wqkv_ref, wo_ref, w1_ref, w2_ref, o_ref,
                    *, num_heads: int):
    """The merged layer's six matmuls, VPU glue stripped (casts kept —
    they are mandatory to feed the MXU from fp32 accumulators)."""
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


@jax.jit
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


def layer_flops_per_image() -> float:
    """2 * MACs of one ViT-B layer at N=197 (qkv, scores, PV, proj, MLP)."""
    macs = N * (3 * D * D) + H * (N * N * (D // H)) * 2 + N * D * D \
        + 2 * N * D * M
    return 2.0 * macs


def main():
    dev = jax.devices()[0]
    assert jax.default_backend() == "tpu", "ceiling bench needs the TPU"
    ks = jax.random.split(jax.random.key(0), 4)
    wqkv = jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[1], (D, D), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (D, M), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (M, D), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.key(9), (B, N, D), jnp.bfloat16)

    def stack(ws, xx, carry):
        t = xx + carry * 0
        for _ in range(L):
            t = mm_only_layer(t, *ws)
        return jnp.sum(t.astype(jnp.float32))

    t_mm = min(device_seconds_per_iter(stack, ((wqkv, wo, w1, w2), x),
                                       reps=10) for _ in range(2))
    per_layer_ms = t_mm * 1000 / L

    ideal_layer_s = B * layer_flops_per_image() / peak_flops(dev)
    mxu_util = ideal_layer_s / (t_mm / L)
    # implied ceiling for the FULL forward: matmul-only layer stack plus
    # the shipped engine's MEASURED non-layer overhead (embed + classify
    # intercept from benchmarks/engine_decomp.json; round 3 assumed a
    # conservative 1.3 ms — round 4's pre-folding and one-dispatch
    # encoder cut the real intercept to ~0.42 ms, raising the ceiling)
    overhead_s = 1.3e-3
    decomp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "engine_decomp.json")
    if os.path.exists(decomp):
        with open(decomp) as f:
            overhead_s = json.load(f)["intercept_ms"] * 1e-3
    ceiling_img_s = B / (t_mm + overhead_s)
    out = {
        "mm_only_layer_ms": round(per_layer_ms, 3),
        "mxu_utilization": round(mxu_util, 4),
        "overhead_ms": round(overhead_s * 1e3, 3),
        "attainable_ceiling_img_s": round(ceiling_img_s, 1),
        "vs_analytic_roofline": round(
            ceiling_img_s * L * layer_flops_per_image() * B
            / (B * peak_flops(dev)), 4),
        "note": "matmul-only merged layer stack + measured engine"
                " intercept; the gap to 1.0 is the head_dim-64 score/PV"
                " MXU underutilization, a model-shape property",
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "mxu_ceiling.json"), "w") as f:
        json.dump(out, f, indent=1)
    return per_layer_ms, ceiling_img_s


if __name__ == "__main__":
    main()
