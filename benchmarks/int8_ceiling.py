"""Attainable-ceiling microbench for the int8 (w8a8) serving path
(VERDICT r3 #2: the bf16 path got a measured ceiling in round 3; the int8
engine — the declared >roofline path — ran at ~0.57 of the naive 2x-int8
MXU rate with no committed ceiling).

The int8 layer is NOT 4 int8 matmuls at 2x: only the weight matmuls (qkv,
out-proj, fc1, fc2) run int8xint8->int32; the per-head score/PV matmuls
stay bf16 (scores are activation x activation — quantizing them is a
different accuracy regime), and every int8 matmul REQUIRES a requantize
step on its input activations (fp -> int8 cast; with static caps that is
one multiply+round+clip sweep, the minimal mandatory form) plus an
int32 -> fp dequant scale on its output.

This kernel times exactly that chain with LN / softmax / gelu / dynamic
abs-max row scans stripped: int8 weight matmuls + bf16 score/PV + the
mandatory requant/dequant casts. Whatever it measures is the
speed-of-light for the shipped int8 decomposition on this chip.

Run:  python benchmarks/int8_ceiling.py          (~4 min on v5e-1)
Writes benchmarks/int8_ceiling.json.
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
from benchmarks.mxu_ceiling import layer_flops_per_image

B, N, D, H, M = 256, 197, 768, 12, 3072
L = 12


def _requant(x_f32, inv_scale):
    """fp -> int8 with a STATIC scale: the minimal mandatory requantize
    (one multiply + round + clip sweep; the shipped kernels' dynamic mode
    adds an abs-max row scan on top — that delta is measured separately)."""
    return jnp.clip(jnp.round(x_f32 * inv_scale), -127, 127).astype(jnp.int8)


def _int8_mm_only_kernel(xq_ref, wqkv_ref, wo_ref, w1_ref, w2_ref, o_ref,
                         *, num_heads: int):
    mi, n, d = xq_ref.shape
    hd = d // num_heads
    xq = xq_ref[...].reshape(mi * n, d)
    inv = jnp.float32(1.0 / 6.0)
    deq = jnp.float32(6.0 / 127.0)

    qkv = jax.lax.dot_general(
        xq, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * deq
    qkv_b = qkv.astype(jnp.bfloat16)
    cols = []
    for h in range(num_heads):
        q = qkv_b[:, h * hd:(h + 1) * hd]
        k = qkv_b[:, d + h * hd:d + (h + 1) * hd]
        v = qkv_b[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        e = jax.lax.dot_general(  # bf16 scores (as the shipped kernel)
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            e, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cols.append(pv)
    attn = jnp.concatenate(cols, axis=-1)  # f32
    attn_q = _requant(attn, inv)
    out = jax.lax.dot_general(
        attn_q, wo_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * deq
    out_q = _requant(out, inv)
    h1 = jax.lax.dot_general(
        out_q, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * deq
    h1_q = _requant(h1, inv)
    out2 = jax.lax.dot_general(
        h1_q, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * deq
    o_ref[...] = _requant(out2, inv).reshape(mi, n, d)


@jax.jit
def int8_mm_only_layer(xq, wqkv, wo, w1, w2):
    b, n, d = xq.shape
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_int8_mm_only_kernel, num_heads=H),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.int8),
        grid=(b,),
        in_specs=[io, full((d, 3 * d)), full((d, d)), full((d, m)),
                  full((m, d))],
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (4 * D * D + 2 * N * D + 2 * D * M),
            bytes_accessed=(2 * B * N * D + (4 * D * D + 2 * D * M)),
            transcendentals=0),
    )(xq, wqkv, wo, w1, w2)


def main():
    assert jax.default_backend() == "tpu", "ceiling bench needs the TPU"
    dev = jax.devices()[0]
    ks = jax.random.split(jax.random.key(0), 4)
    mk = lambda k, shape: jnp.clip(  # noqa: E731
        jnp.round(jax.random.normal(k, shape) * 40), -127, 127
    ).astype(jnp.int8)
    wqkv = mk(ks[0], (D, 3 * D))
    wo = mk(ks[1], (D, D))
    w1 = mk(ks[2], (D, M))
    w2 = mk(ks[3], (M, D))
    xq = mk(jax.random.key(9), (B, N, D))

    def stack(ws, xx, carry):
        # The loop-carry dependency must ride a FLOAT multiply: integer
        # `carry*0` constant-folds to 0 (valid for ints), the body becomes
        # loop-invariant and XLA hoists the whole stack out of the timing
        # fori_loop (measured: negative layer time). Float `carry*0` is
        # not foldable (NaN/Inf), so perturb one element through it.
        bump = (carry * 0.0).astype(jnp.int8)
        t = xx.at[0, 0, 0].add(bump)
        for _ in range(L):
            t = int8_mm_only_layer(t, *ws)
        return jnp.sum(t.astype(jnp.float32))

    best = 1e9
    for _ in range(3):
        best = min(best, device_seconds_per_iter(
            stack, ((wqkv, wo, w1, w2), xq), reps=40))
    per_layer_ms = best * 1000 / L
    assert per_layer_ms > 0.5, (
        f"implausible layer time {per_layer_ms} ms — the timing loop was "
        "optimized away (loop-invariant body?)")

    # ceiling for the full int8 forward = int8 mm-only stack + the bf16
    # engine's MEASURED non-layer overhead (embed + classify stay bf16;
    # intercept from engine_decomp.json, same treatment as mxu_ceiling)
    overhead_s = 1.3e-3
    decomp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "engine_decomp.json")
    if os.path.exists(decomp):
        with open(decomp) as f:
            overhead_s = json.load(f)["intercept_ms"] * 1e-3
    ceiling_img_s = B / (best + overhead_s)
    analytic_roofline = peak_flops(dev) / (L * layer_flops_per_image())
    # the realizable bar: the glue-free ceiling above plus the
    # SEMANTICALLY MANDATORY VPU work the halved matmul time cannot hide
    # (int8_ablation.json: static_1p vs mm_only = LN + gelu + the
    # quant-rounding chain at calibrated static scales)
    ablate = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "int8_ablation.json")
    attain = None
    if os.path.exists(ablate):
        with open(ablate) as f:
            aj = json.load(f)["layer_ms"]
        attain = B / (L * aj["static_1p"] * 1e-3 + overhead_s)
    out = {
        "int8_mm_only_layer_ms": round(per_layer_ms, 4),
        "overhead_ms": round(overhead_s * 1e3, 3),
        "attainable_int8_ceiling_img_s": round(ceiling_img_s, 1),
        "vs_bf16_analytic_roofline": round(ceiling_img_s / analytic_roofline,
                                           4),
        "attainable_with_mandatory_glue_img_s": (
            round(attain, 1) if attain else None),
        "note": "int8 weight matmuls + bf16 score/PV + mandatory "
                "requant/dequant casts; LN/softmax/gelu/abs-max stripped "
                "(the _with_mandatory_glue line adds them back per "
                "int8_ablation.json static_1p)",
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "int8_ceiling.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
