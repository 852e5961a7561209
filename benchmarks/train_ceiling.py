"""Attainable-ceiling microbench for the TRAIN step (VERDICT r4 #4).

Round 4 closed the eval gap against a MEASURED matmul-only ceiling
(benchmarks/mxu_ceiling.py) but stated the train number against a
heuristic "3x the forward analytic FLOPs" roofline that prices no
saved-activation traffic and no recompute. This bench gives training the
same rigor: it times the EXACT work classes of the shipped split path
(custom-VJP Pallas attention + XLA MLP, save_qkv=True —
training/fused.py, ops/pallas/fused_attention_vjp.py), glue stripped:

  fwd_mm        the merged layer's six matmuls (reuses mxu_ceiling's
                matmul-only kernel — the train forward IS the eval stack
                plus saves)
  save_write    pure-store cost of the per-layer saved tensors the split
                path writes for the backward: qkv (B,N,3D) [save_qkv],
                attn head outputs (B,N,D) [XLA's dWo operand], MLP ln2
                (B,N,D) and gelu output h (B,N,M) [XLA residuals]
  attn_bwd_mm   a Pallas kernel with the saved-backward's exact matmul
                multiset (_attn_bwd_kernel_saved): dattn, per-head
                {logits recompute, dv, ds, dq, dk}, dln — softmax/LN
                glue removed, casts kept
  xla_bwd_mm    the six XLA weight/input-grad matmuls per layer over
                (B*N) rows: dWo, dWqkv, dW2, dh, dW1, dln2 — the part
                the real path runs in XLA (its mm-only time IS the
                attainable bar for it)
  adam_update   the fp32 m/v/p streaming update over ViT-B's 86.6M
                params (HBM-bound)

attainable_step = sum of the five (each stage on this chip cannot beat
its own matmul/stream time; the sum is the no-glue schedule). The real
step is measured in the same process with the production-shaped
grad-consuming carry (bench.device_train_seconds_per_step). Writes
train_ceiling.json.

Run on the TPU:  python benchmarks/train_ceiling.py
"""

from __future__ import annotations

import functools
import json
import numpy as np
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import (
    device_seconds_per_iter,
    device_train_seconds_per_step,
    peak_flops,
)
from mxu_ceiling import layer_flops_per_image, mm_only_layer

B, N, D, H, M = 256, 197, 768, 12, 3072
L = 12
HD = D // H


def _attn_bwd_mm_kernel(g_ref, qkv_ref, wqkv_ref, wo_ref, dx_ref,
                        dqkv_ref, *, num_heads: int):
    """The saved-qkv attention backward's matmul multiset
    (fused_attention_vjp._attn_bwd_kernel_saved), glue stripped: softmax
    and its gradient algebra, LN stats/backward and the bias reductions
    removed; every matmul, its shapes/dtypes, and the mandatory
    fp32->bf16 accumulator casts kept."""
    mi, n, d = g_ref.shape
    hd = d // num_heads
    g = g_ref[...].reshape(mi * n, d)
    qkv = qkv_ref[...].reshape(mi * n, 3 * d)
    dattn = jax.lax.dot_general(
        g, wo_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)
    cols_q, cols_k, cols_v = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        da = dattn[:, h * hd:(h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = logits.astype(g.dtype)  # stands in for softmax(logits)
        cols_v.append(jax.lax.dot_general(
            s, da, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(g.dtype))
        ds = jax.lax.dot_general(
            da, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz = ds.astype(g.dtype)  # stands in for the softmax-grad algebra
        cols_q.append(jax.lax.dot_general(
            dz, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(g.dtype))
        cols_k.append(jax.lax.dot_general(
            dz, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(g.dtype))
    dqkv = jnp.concatenate(cols_q + cols_k + cols_v, axis=-1)
    dqkv_ref[...] = dqkv.reshape(mi, n, 3 * d)
    dx = jax.lax.dot_general(
        dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[...] = dx.reshape(mi, n, d).astype(dx_ref.dtype)


@jax.jit
def attn_bwd_mm(g, qkv, wqkv, wo):
    b, n, d = g.shape
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    io3 = pl.BlockSpec((1, n, 3 * d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_bwd_mm_kernel, num_heads=H),
        out_shape=(jax.ShapeDtypeStruct((b, n, d), g.dtype),
                   jax.ShapeDtypeStruct((b, n, 3 * d), g.dtype)),
        grid=(b,),
        in_specs=[io, io3, full((d, 3 * d)), full((d, d))],
        out_specs=(io, io3),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(g, qkv, wqkv, wo)


def main():
    dev = jax.devices()[0]
    assert jax.default_backend() == "tpu", "train ceiling needs the TPU"
    ks = jax.random.split(jax.random.key(0), 8)
    wqkv = jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[1], (D, D), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (D, M), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (M, D), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.key(9), (B, N, D), jnp.bfloat16)
    qkv = jax.random.normal(ks[4], (B, N, 3 * D), jnp.bfloat16)

    out = {"batch": B}

    # ---- 1. forward matmul stack (identical to the eval ceiling)
    def fwd_stack(ws, xx, carry):
        t = xx + carry * 0
        for _ in range(L):
            t = mm_only_layer(t, *ws)
        return jnp.sum(t.astype(jnp.float32))

    t_fwd = min(device_seconds_per_iter(
        fwd_stack, ((wqkv, wo, w1, w2), x), reps=10) for _ in range(2))
    out["fwd_mm_ms"] = round(t_fwd * 1e3, 2)

    # ---- 2. saved-activation write stream (per layer: qkv 3D + attn D
    #         + ln2 D + h M, all bf16)
    def save_stream(xx, carry):
        s = (carry * 0 + 1).astype(xx.dtype)
        acc = jnp.float32(0.0)
        col = xx[..., :1]  # (B, N, 1) source the stores depend on
        for i in range(L):
            si = s * (1.0 + i)
            saves = (jnp.broadcast_to(col * si, (B, N, 3 * D)),
                     jnp.broadcast_to(col * si, (B, N, D)),
                     jnp.broadcast_to(col * si, (B, N, D)),
                     jnp.broadcast_to(col * si, (B, N, M)))
            # consume one element of each so none is DCE'd, while the
            # full arrays are materialized by optimization_barrier
            saves = jax.lax.optimization_barrier(saves)
            acc += sum(t[0, 0, 0].astype(jnp.float32) for t in saves)
        return acc

    t_save = min(device_seconds_per_iter(save_stream, (x,), reps=8)
                 for _ in range(2))
    bytes_per_step = 2 * B * N * (3 * D + D + D + M) * L
    out["save_write_ms"] = round(t_save * 1e3, 2)
    out["save_bytes_gb"] = round(bytes_per_step / 1e9, 2)
    out["save_gbps"] = round(bytes_per_step / t_save / 1e9, 1)

    # ---- 3. attention backward matmul stack (Pallas, saved-qkv schedule)
    def attn_bwd_stack(ws, g0, q0, carry):
        g, q = g0 + carry * 0, q0
        for _ in range(L):
            g, q = attn_bwd_mm(g, q, *ws)
        return jnp.sum(g.astype(jnp.float32))

    t_abwd = min(device_seconds_per_iter(
        attn_bwd_stack, ((wqkv, wo), x, qkv), reps=8) for _ in range(2))
    out["attn_bwd_mm_ms"] = round(t_abwd * 1e3, 2)

    # ---- 4. XLA weight/input-grad matmuls over (B*N) rows
    def xla_bwd_stack(ws, xx, carry):
        wqkv_, wo_, w1_, w2_ = ws
        g = (xx + carry * 0).reshape(B * N, D)
        acc = jnp.float32(0.0)
        for _ in range(L):
            h_op = jnp.broadcast_to(g[:, :1], (B * N, M)).astype(g.dtype)
            dW2 = jax.lax.dot_general(
                h_op, g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh = jax.lax.dot_general(
                g, w2_, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(g.dtype)
            dW1 = jax.lax.dot_general(
                g, dh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dln2 = jax.lax.dot_general(
                dh, w1_, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(g.dtype)
            dWo = jax.lax.dot_general(
                dln2, g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_op = jnp.concatenate([dh[:, :D], dh[:, D:2 * D],
                                       dh[:, 2 * D:3 * D]], axis=-1)
            dWqkv = jax.lax.dot_general(
                dln2, dqkv_op, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += (dW2[0, 0] + dW1[0, 0] + dWo[0, 0] + dWqkv[0, 0])
            g = dln2 + (acc * 0).astype(dln2.dtype)
        return acc

    t_xbwd = min(device_seconds_per_iter(
        xla_bwd_stack, ((wqkv, wo, w1, w2), x), reps=8) for _ in range(2))
    out["xla_bwd_mm_ms"] = round(t_xbwd * 1e3, 2)

    # ---- 5. adam streaming update (fp32 m/v/p over ViT-B's param count)
    n_params = 86_567_656
    chunk = jnp.zeros((n_params,), jnp.float32)

    @jax.jit
    def adam_step(p, m, v, g):
        m2 = 0.9 * m + 0.1 * g
        v2 = 0.999 * v + 0.001 * g * g
        p2 = p - 1e-3 * m2 / (jnp.sqrt(v2) + 1e-8)
        return p2, m2, v2

    g = jax.random.normal(jax.random.key(5), (n_params,), jnp.float32)

    def adam_loop(g, carry):
        p, m, v = adam_step(chunk + carry * 0, chunk, chunk, g)
        return p[0] + m[0] + v[0]

    t_adam = min(device_seconds_per_iter(adam_loop, (g,), reps=8)
                 for _ in range(2))
    out["adam_ms"] = round(t_adam * 1e3, 2)

    # ---- 6. mandatory VPU glue floor (the int8-story second bound):
    # elementwise streams at the real shapes/dtypes of the glue the
    # matmul-only stacks strip — per layer: gelu fwd+bwd on (B*N, M)
    # fp32 (the XLA MLP's exact erf gelu and its analytic grad), the
    # softmax recompute + softmax-grad algebra on (B*H, N, N) fp32 (the
    # saved-bwd kernel's VPU work), and LN fwd stats + LN bwd chains on
    # (B*N, D). Measured as streams with no matmul overlap, so
    # [mm_only, mm_only + glue] brackets the achievable step: the real
    # schedule can hide SOME glue under MXU time but not more than all
    # of it.
    bn = B * N
    inv_sqrt2 = float(1.0 / np.sqrt(2.0))
    inv_sqrt2pi = float(1.0 / np.sqrt(2.0 * np.pi))

    def glue_stream(xx, carry):
        s = (carry * 0 + 1.0).astype(jnp.float32)
        col = xx.reshape(bn, D)[:, :1].astype(jnp.float32)
        acc = jnp.float32(0.0)
        hrow = jnp.broadcast_to(col * s, (bn, M))
        srow_src = xx.reshape(bn, D)[:B * H, :1].astype(jnp.float32)
        for l in range(L):
            sl = s * (1.0 + l)
            # gelu fwd + analytic bwd on (B*N, M)
            h = jax.lax.optimization_barrier(hrow * sl)
            gf = 0.5 * h * (1.0 + jax.lax.erf(h * inv_sqrt2))
            gb = (0.5 * (1.0 + jax.lax.erf(h * inv_sqrt2))
                  + h * jnp.exp(-0.5 * h * h) * inv_sqrt2pi)
            acc += gf[0, 0] + gb[0, 0]
            # softmax recompute + grad algebra on (B*H, N, N)
            z = jax.lax.optimization_barrier(
                jnp.broadcast_to(srow_src * sl, (B * H, N))[:, None, :]
                * jnp.ones((1, N, 1), jnp.float32))
            e = jnp.exp(z - jnp.max(z, axis=-1, keepdims=True))
            sm = e / jnp.sum(e, axis=-1, keepdims=True)
            ds = sm * (z - jnp.sum(z * sm, axis=-1, keepdims=True))
            acc += sm[0, 0, 0] + ds[0, 0, 0]
            # LN fwd stats + bwd chains on (B*N, D), twice per layer
            for _ in range(2):
                y = jax.lax.optimization_barrier(
                    jnp.broadcast_to(col * sl, (bn, D)))
                mu = jnp.mean(y, axis=-1, keepdims=True)
                var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
                xh = (y - mu) * jax.lax.rsqrt(var + 1e-6)
                dln = xh * 2.0
                dxb = (dln - jnp.mean(dln, axis=-1, keepdims=True)
                       - xh * jnp.mean(dln * xh, axis=-1, keepdims=True))
                acc += xh[0, 0] + dxb[0, 0]
        return acc

    t_glue = min(device_seconds_per_iter(glue_stream, (x,), reps=6)
                 for _ in range(2))
    out["glue_floor_ms"] = round(t_glue * 1e3, 2)

    # ---- attainable vs measured
    attainable_ms = (t_fwd + t_save + t_abwd + t_xbwd + t_adam) * 1e3
    out["attainable_step_ms"] = round(attainable_ms, 2)
    out["attainable_img_s"] = round(B / attainable_ms * 1e3, 1)
    out["attainable_with_glue_ms"] = round(attainable_ms + t_glue * 1e3, 2)
    out["attainable_with_glue_img_s"] = round(
        B / (attainable_ms + t_glue * 1e3) * 1e3, 1)

    # the real step, measured the production-shaped way
    import optax

    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.training.fused import vit_forward_trainable

    model = build_model("vit", dict(
        image_size=224, patch_size=16, num_layers=12, num_heads=12,
        hidden_dim=768, mlp_dim=3072, num_classes=1000))
    yt = jax.random.randint(jax.random.key(3), (B,), 0, 1000)

    def loss_fn(p, xi):
        logits = vit_forward_trainable(p, xi, patch_size=16, num_heads=12,
                                       interpret=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yt).mean()

    tx = optax.adam(1e-3)
    opt_state = tx.init(model.params)

    def update_fn(grads, o, p):
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2

    xt = jax.random.normal(jax.random.key(2), (B, 224, 224, 3),
                           jnp.float32)
    t_step = min(device_train_seconds_per_step(
        jax.value_and_grad(loss_fn), update_fn, model.params, opt_state,
        xt, reps=6) for _ in range(2))
    out["measured_step_ms"] = round(t_step * 1e3, 2)
    out["measured_img_s"] = round(B / t_step, 1)
    out["step_vs_attainable"] = round(attainable_ms / (t_step * 1e3), 4)
    out["step_vs_attainable_with_glue"] = round(
        (attainable_ms + t_glue * 1e3) / (t_step * 1e3), 4)
    from peekvit_tpu.utils.flops_count import analytic_macs

    roofline3 = peak_flops(dev) / (3.0 * 2.0 * analytic_macs(model.module))
    out["vs_3x_heuristic_roofline"] = round(B / t_step / roofline3, 4)
    out["note"] = (
        "two bounds, int8-ceiling style: attainable_step = matmul-only "
        "stage floors (fwd + saved-tensor stores + Pallas attention-bwd "
        "matmul multiset + XLA grad matmuls + adam); "
        "attainable_with_glue adds the MEASURED mandatory VPU glue "
        "streams (gelu fwd+bwd, softmax recompute+grad, LN fwd+bwd at "
        "real shapes, zero matmul overlap). The achievable step lies "
        "between them (the schedule can hide some glue under MXU time); "
        "measured/with-glue ~= 1 means the step is AT its explained "
        "envelope")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
