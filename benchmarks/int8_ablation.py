"""Per-op VPU-cost ablation for the merged int8 (w8a8) ViT-B/16 layer
kernel (v5e-1) — the int8 analogue of benchmarks/layer_ablation.py.

The shipped int8 engine (6.4k img/s, dynamic per-row quantization) runs at
~80% of the measured attainable int8 ceiling (benchmarks/int8_ceiling.py:
int8 weight matmuls + bf16 score/PV + mandatory static requant chain =
2.57 ms/layer). Because the int8 matmuls halve the MXU time, VPU glue that
hid under the bf16 kernel's matmul latency (layer_ablation.json: 0.068 ms
total) can dominate here. This script times variants of the otherwise
identical merged int8 kernel (same grid/specs/matmuls as
ops/pallas/quant_blocks._q_layer_kernel, plain mode):

  full_dyn    shipped math, dynamic per-row abs-max quant (engine default)
  static      static calibration caps at all 4 quant sites (the
              calib_images= path — skips 4 abs-max row scans)
  static_1p   static + one-pass LN statistics (E[x^2] - mu^2)
  static_fold static_1p + LN affine folded into the quantized weights /
              bias (gamma into W rows at build, beta @ W into bias) — the
              kernel quantizes the NORMALIZED rows directly
  gelu_sig    static_1p with the sigmoid-approx gelu x*sigmoid(1.702x)
              (one exp2 + reciprocal instead of tanh's exponent pair;
              max abs error ~0.02 — below the int8 rounding step)
  gelu_bf16   static_1p with the tanh gelu computed in bf16 (VPU packs
              2 bf16 lanes per f32 lane for elementwise ops)
  no_ln       LN stripped entirely (upper bound for any LN treatment)
  no_gelu     static_1p with identity MLP activation
  mm_only     everything stripped (= int8_ceiling's kernel, bf16 IO)

Run:  python benchmarks/int8_ablation.py        (~6 min incl. compiles)
Writes benchmarks/int8_ablation.json.
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
from peekvit_tpu.ops.pallas.fused_attention import _attn_scores_pv

B, N, D, H, M = 256, 197, 768, 12, 3072
L = 12
CAP = 6.0


def _quant(rows, *, dynamic: bool):
    if dynamic:
        s = jnp.maximum(jnp.max(jnp.abs(rows), axis=-1, keepdims=True),
                        1e-12) / 127.0
    else:
        s = jnp.float32(CAP / 127.0)
    return jnp.clip(jnp.round(rows / s), -127, 127).astype(jnp.int8), s


def _mm(xq, sx, w_ref, sw_ref):
    acc = jax.lax.dot_general(
        xq, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw_ref[...].astype(jnp.float32)


def _variant_kernel(x_ref, lns1, lnb1, wqkv_ref, sqkv_ref, bqkv_ref,
                    wo_ref, so_ref, bo_ref, lns2, lnb2, w1_ref, s1_ref,
                    b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *,
                    num_heads: int, eps: float, mode: str):
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    dynamic = mode == "full_dyn"
    one_pass = mode in ("static_1p", "static_fold", "no_gelu", "no_ln",
                        "mm_only", "gelu_sig", "gelu_bf16")
    affine = mode not in ("static_fold", "no_ln", "mm_only")
    do_ln = mode not in ("no_ln", "mm_only")
    do_gelu = mode not in ("no_gelu", "mm_only")
    xf = x_ref[...].reshape(mi * n, d).astype(jnp.float32)

    def norm(rows, s_ref, b_ref):
        if not do_ln:
            return rows
        mu = jnp.mean(rows, axis=-1, keepdims=True)
        if one_pass:
            ms = jnp.mean(rows * rows, axis=-1, keepdims=True)
            var = jnp.maximum(ms - mu * mu, 0.0)
        else:
            var = jnp.mean((rows - mu) ** 2, axis=-1, keepdims=True)
        out = (rows - mu) * jax.lax.rsqrt(var + eps)
        if affine:
            out = out * s_ref[0].astype(jnp.float32) + b_ref[0].astype(
                jnp.float32)
        return out

    lq, ls = _quant(norm(xf, lns1, lnb1), dynamic=dynamic)
    qkv = (_mm(lq, ls, wqkv_ref, sqkv_ref)
           + bqkv_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            if mode == "mm_only":
                e = jax.lax.dot_general(
                    qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                pv = jax.lax.dot_general(
                    e, vj, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append(pv.astype(jnp.bfloat16))
            else:
                outs.append(_attn_scores_pv(qj, kj, vj, scale).astype(
                    jnp.bfloat16))
        cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(cols, axis=-1)

    aq, as_ = _quant(attn.astype(jnp.float32), dynamic=dynamic)
    y = _mm(aq, as_, wo_ref, so_ref) + bo_ref[0].astype(jnp.float32) + xf

    lq2, ls2 = _quant(norm(y, lns2, lnb2), dynamic=dynamic)
    h2 = _mm(lq2, ls2, w1_ref, s1_ref) + b1_ref[0].astype(jnp.float32)
    if mode == "gelu_sig":
        h2 = h2 * jax.nn.sigmoid(1.702 * h2)
    elif mode == "gelu_bf16":
        h2 = jax.nn.gelu(h2.astype(jnp.bfloat16)).astype(jnp.float32)
    elif do_gelu:
        h2 = jax.nn.gelu(h2)
    hq, hs = _quant(h2, dynamic=dynamic)
    out2 = _mm(hq, hs, w2_ref, s2_ref) + b2_ref[0].astype(jnp.float32) + y
    o_ref[...] = out2.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def variant_layer(ws, mode):
    x = ws[0]
    b, n, d = x.shape
    m = ws[11].shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspecs = [full((1, d)), full((1, d)), full((d, 3 * d)), full((1, 3 * d)),
              full((1, 3 * d)), full((d, d)), full((1, d)), full((1, d)),
              full((1, d)), full((1, d)), full((d, m)), full((1, m)),
              full((1, m)), full((m, d)), full((1, d)), full((1, d))]
    return pl.pallas_call(
        functools.partial(_variant_kernel, num_heads=H, eps=1e-5, mode=mode),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[io] + wspecs,
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ws)


MODES = ("full_dyn", "static", "static_1p", "static_fold", "gelu_sig",
         "gelu_bf16", "no_gelu", "no_ln", "mm_only")


def main():
    assert jax.default_backend() == "tpu", "ablation bench needs the TPU"
    ks = jax.random.split(jax.random.key(0), 4)
    mkq = lambda k, shape: jnp.clip(  # noqa: E731
        jnp.round(jax.random.normal(k, shape) * 40), -127, 127
    ).astype(jnp.int8)
    vec = lambda k, fill: jnp.full((1, k), fill, jnp.float32)  # noqa: E731
    sc = jnp.float32(2.0 / 127.0)
    weights = (
        vec(D, 1.0), vec(D, 0.0),                       # ln1 scale/bias
        mkq(ks[0], (D, 3 * D)), jnp.full((1, 3 * D), sc), vec(3 * D, 0.0),
        mkq(ks[1], (D, D)), jnp.full((1, D), sc), vec(D, 0.0),
        vec(D, 1.0), vec(D, 0.0),                       # ln2 scale/bias
        mkq(ks[2], (D, M)), jnp.full((1, M), sc), vec(M, 0.0),
        mkq(ks[3], (M, D)), jnp.full((1, D), sc), vec(D, 0.0),
    )
    x = jax.random.normal(jax.random.key(9), (B, N, D), jnp.bfloat16)

    def stack(mode):
        def run(ws, xx, carry):
            t = xx + carry * 0
            for _ in range(L):
                t = variant_layer((t,) + ws, mode)
            return jnp.sum(t.astype(jnp.float32))
        return run

    results = {}
    for mode in MODES:
        t = min(device_seconds_per_iter(stack(mode), (weights, x), reps=10)
                for _ in range(2))
        results[mode] = t * 1000 / L
        print(json.dumps({"variant": mode,
                          "layer_ms": round(results[mode], 4)}), flush=True)
    deltas = {k: round(results[k] - results["full_dyn"], 4)
              for k in results if k != "full_dyn"}
    out = {"layer_ms": {k: round(v, 4) for k, v in results.items()},
           "delta_vs_full_dyn_ms": deltas, "batch": B, "layers": L}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "int8_ablation.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
