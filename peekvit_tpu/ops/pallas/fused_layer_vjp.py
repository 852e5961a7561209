"""Trainable MERGED transformer layer: custom VJP over one-Pallas-kernel
forward and one-Pallas-kernel backward (VERDICT r3 #6).

Round 3 showed that splitting the layer into an attention kernel plus an XLA
MLP pays a (B, N, D) HBM round trip between the sublayers — and, in
training, XLA's autodiff additionally materializes the (B, N, mlp_dim)
gelu input for the backward pass (~150 MB per ViT-B layer at batch 256).
This module removes both:

- forward: ops/pallas/fused_attention's merged `_layer_kernel` structure
  (LN1 -> qkv -> MHSA -> out-proj -> residual -> LN2 -> fc1 -> gelu -> fc2
  -> residual) in ONE kernel; only `out` leaves VMEM.
- backward: ONE kernel that recomputes the whole forward from `x`
  (flash-style) and produces `dx` AND every weight/bias/LN gradient.
  Weight-grad accumulators live in VMEM blocks with grid-CONSTANT index
  maps: the TPU grid is sequential, so each image cell accumulates its
  contribution in-place (`@pl.when(i == 0)` initializes) and the ~28 MB of
  fp32 accumulators are written to HBM exactly once. Neither `h`
  (B, N, mlp_dim) nor `dqkv` (B, N, 3D) ever exists in HBM.

The softmax here is the standard max-subtracted form (training parity with
the linen path; the inference kernels' exp2 fast softmax drops
max-subtraction, fine for eval). gelu is the tanh approximation — Mosaic
has no erf lowering (see fused_attention.py:306-314) — with its exact
derivative in the backward kernel.

Semantics mirror the reference layer (reference models/blocks.py:74-98 via
torchvision EncoderBlock); gradient parity vs jax.grad of a pure-jnp
replica is pinned in tests/test_pallas_vjp.py, train-step parity in
tests/test_fused_training.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from peekvit_tpu.ops.pallas.fused_attention import _MERGED_VMEM_LIMIT

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_C = 0.044715


def _ln_f32(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    return xhat * gamma + beta, xhat, inv


def _ln_bwd(dln, xhat, inv, gamma):
    dxhat = dln * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return (dxhat - m1 - xhat * m2) * inv


def _gelu_tanh(x):
    """tanh-approx gelu in fp32 (jax.nn.gelu(approximate=True))."""
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad(x):
    """d/dx of the tanh-approx gelu, fp32."""
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _mhsa_rows(qkv, num_heads, n, mi, dtype):
    """Per-head, per-image standard softmax attention over packed qkv rows.
    Returns attn (mi*n, d) in ``dtype``."""
    d = qkv.shape[-1] // 3
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            logits = jax.lax.dot_general(
                qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jax.nn.softmax(logits, axis=-1)
            outs.append(jax.lax.dot_general(
                s.astype(vj.dtype), vj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype))
        cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    return jnp.concatenate(cols, axis=-1)


# --------------------------------------------------------------- fwd kernel


def _layer_fwd_kernel(x_ref, lns1_ref, lnb1_ref, wqkv_ref, bqkv_ref, wo_ref,
                      bo_ref, lns2_ref, lnb2_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, *, num_heads: int, eps: float):
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    xf = x.astype(jnp.float32)
    ln1, _, _ = _ln_f32(x, lns1_ref[0].astype(jnp.float32),
                        lnb1_ref[0].astype(jnp.float32), eps)
    qkv = jnp.dot(ln1.astype(x.dtype), wqkv_ref[...],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    attn = _mhsa_rows(qkv, num_heads, n, mi, x.dtype)
    proj = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    y = proj + bo_ref[0].astype(jnp.float32) + xf  # fp32 residual in VMEM

    ln2, _, _ = _ln_f32(y, lns2_ref[0].astype(jnp.float32),
                        lnb2_ref[0].astype(jnp.float32), eps)
    hpre = jnp.dot(ln2.astype(x.dtype), w1_ref[...],
                   preferred_element_type=jnp.float32)
    h = _gelu_tanh(hpre + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32) + y
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


# --------------------------------------------------------------- bwd kernel


def _layer_bwd_kernel(x_ref, g_ref, lns1_ref, lnb1_ref, wqkv_ref, bqkv_ref,
                      wo_ref, bo_ref, lns2_ref, lnb2_ref, w1_ref, b1_ref,
                      w2_ref,
                      dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                      dlns1_ref, dlnb1_ref, dw1_ref, db1_ref, dw2_ref,
                      db2_ref, dlns2_ref, dlnb2_ref,
                      *, num_heads: int, eps: float):
    """Recompute-everything merged-layer backward; all grads accumulated
    in grid-resident VMEM blocks (init at cell 0, += after)."""
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    i = pl.program_id(0)

    def accum(ref, val):
        @pl.when(i == 0)
        def _():
            ref[...] = val

        @pl.when(i != 0)
        def _():
            ref[...] += val

    def accum_row(ref, vec):
        # (8, k) block with the partial sum in row 0 (TPU sublane tiling
        # needs multiples of 8; iota+where, Mosaic has no scatter)
        k = ref.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (8, k), 0)
        accum(ref, jnp.where(row == 0, vec[None, :], 0.0))

    x = x_ref[...].reshape(mi * n, d)
    g = g_ref[...].reshape(mi * n, d).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    gamma1 = lns1_ref[0].astype(jnp.float32)
    beta1 = lnb1_ref[0].astype(jnp.float32)
    gamma2 = lns2_ref[0].astype(jnp.float32)
    beta2 = lnb2_ref[0].astype(jnp.float32)

    # ---- recompute forward
    ln1_f32, xhat1, inv1 = _ln_f32(x, gamma1, beta1, eps)
    ln1 = ln1_f32.astype(x.dtype)
    qkv = jnp.dot(ln1, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    attn = _mhsa_rows(qkv, num_heads, n, mi, x.dtype)
    proj = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    y = proj + bo_ref[0].astype(jnp.float32) + xf
    _, xhat2, inv2 = _ln_f32(y, gamma2, beta2, eps)
    ln2 = (xhat2 * gamma2 + beta2)
    ln2b = ln2.astype(x.dtype)
    hpre = jnp.dot(ln2b, w1_ref[...], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[0].astype(jnp.float32)
    h = _gelu_tanh(hpre).astype(x.dtype)

    # ---- MLP backward (out = h @ W2 + b2 + y)
    accum(dw2_ref, jax.lax.dot_general(
        h, g.astype(x.dtype), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    accum_row(db2_ref, jnp.sum(g, axis=0))
    dh = jax.lax.dot_general(
        g.astype(x.dtype), w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dhpre = dh * _gelu_tanh_grad(hpre)
    dhpre_b = dhpre.astype(x.dtype)
    accum(dw1_ref, jax.lax.dot_general(
        ln2b, dhpre_b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    accum_row(db1_ref, jnp.sum(dhpre, axis=0))
    dln2 = jax.lax.dot_general(
        dhpre_b, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    accum_row(dlns2_ref, jnp.sum(dln2 * xhat2, axis=0))
    accum_row(dlnb2_ref, jnp.sum(dln2, axis=0))
    dy = _ln_bwd(dln2, xhat2, inv2, gamma2) + g

    # ---- attention backward (y = attn @ Wo + bo + x) with cotangent dy
    dy_b = dy.astype(x.dtype)
    accum(dwo_ref, jax.lax.dot_general(
        attn, dy_b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    accum_row(dbo_ref, jnp.sum(dy, axis=0))
    dattn = jax.lax.dot_general(
        dy_b, wo_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

    dq_cols, dk_cols, dv_cols = [], [], []
    for hh in range(num_heads):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, d + hh * hd:d + (hh + 1) * hd]
        v = qkv[:, 2 * d + hh * hd:2 * d + (hh + 1) * hd]
        da_h = dattn[:, hh * hd:(hh + 1) * hd]
        dq_l, dk_l, dv_l = [], [], []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            daj = da_h[j * n:(j + 1) * n]
            logits = jax.lax.dot_general(
                qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jax.nn.softmax(logits, axis=-1)
            sb = s.astype(x.dtype)
            dv_l.append(jax.lax.dot_general(
                sb, daj, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
            ds = jax.lax.dot_general(
                daj, vj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dz = s * (ds - jnp.sum(ds * s, axis=-1, keepdims=True))
            dzb = (dz * scale).astype(x.dtype)
            dq_l.append(jax.lax.dot_general(
                dzb, kj, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
            dk_l.append(jax.lax.dot_general(
                dzb, qj, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
        cat = (lambda ls: jnp.concatenate(ls, axis=0) if mi > 1 else ls[0])
        dq_cols.append(cat(dq_l))
        dk_cols.append(cat(dk_l))
        dv_cols.append(cat(dv_l))
    dqkv = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)

    accum(dwqkv_ref, jax.lax.dot_general(
        ln1, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    accum_row(dbqkv_ref, jnp.sum(dqkv.astype(jnp.float32), axis=0))
    dln1 = jax.lax.dot_general(
        dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    accum_row(dlns1_ref, jnp.sum(dln1 * xhat1, axis=0))
    accum_row(dlnb1_ref, jnp.sum(dln1, axis=0))
    dx = _ln_bwd(dln1, xhat1, inv1, gamma1) + dy
    dx_ref[...] = dx.reshape(mi, n, d).astype(dx_ref.dtype)


# ------------------------------------------------------------- custom VJP


def _fwd_call(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
              w1, b1, w2, b2, num_heads, eps, interpret, mi):
    b, n, d = x.shape
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_fwd_kernel, num_heads=num_heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io, full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d)), full((1, d)),
                  full((1, d)), full((1, d)), full((d, m)), full((1, m)),
                  full((m, d)), full((1, d))],
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MERGED_VMEM_LIMIT),
        interpret=interpret,
    )(x, lns1.reshape(1, d), lnb1.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d),
      lns2.reshape(1, d), lnb2.reshape(1, d), w1, b1.reshape(1, m), w2,
      b2.reshape(1, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def layer_block_trainable(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out,
                          lns2, lnb2, w1, b1, w2, b2, num_heads: int,
                          eps: float = 1e-5, interpret: bool = False,
                          images_per_cell: int = 1):
    """Differentiable MERGED pre-LN transformer layer:
    y = x + OutProj(MHSA(LN1(x))); out = y + fc2(gelu(fc1(LN2(y)))).
    One Pallas kernel per direction; backward emits every gradient."""
    return _fwd_call(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
                     w1, b1, w2, b2, num_heads, eps, interpret,
                     images_per_cell)


def _trainable_fwd(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
                   w1, b1, w2, b2, num_heads, eps, interpret, mi):
    out = _fwd_call(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
                    w1, b1, w2, b2, num_heads, eps, interpret, mi)
    return out, (x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
                 w1, b1, w2, b2)


def _trainable_bwd(num_heads, eps, interpret, mi, res, g):
    (x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2, w1, b1,
     w2, b2) = res
    b, n, d = x.shape
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # grad accumulators: ONE block for the whole grid (constant index map);
    # the sequential TPU grid accumulates in-place, HBM sees one write
    acc = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_layer_bwd_kernel, num_heads=num_heads, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),          # dx
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),     # dwqkv
            jax.ShapeDtypeStruct((8, 3 * d), jnp.float32),     # dbqkv
            jax.ShapeDtypeStruct((d, d), jnp.float32),         # dwo
            jax.ShapeDtypeStruct((8, d), jnp.float32),         # dbo
            jax.ShapeDtypeStruct((8, d), jnp.float32),         # dlns1
            jax.ShapeDtypeStruct((8, d), jnp.float32),         # dlnb1
            jax.ShapeDtypeStruct((d, m), jnp.float32),         # dw1
            jax.ShapeDtypeStruct((8, m), jnp.float32),         # db1
            jax.ShapeDtypeStruct((m, d), jnp.float32),         # dw2
            jax.ShapeDtypeStruct((8, d), jnp.float32),         # db2
            jax.ShapeDtypeStruct((8, d), jnp.float32),         # dlns2
            jax.ShapeDtypeStruct((8, d), jnp.float32),         # dlnb2
        ),
        grid=(b // mi,),
        in_specs=[io, io, full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d)), full((1, d)),
                  full((1, d)), full((1, d)), full((d, m)), full((1, m)),
                  full((m, d))],
        out_specs=(io, acc((d, 3 * d)), acc((8, 3 * d)), acc((d, d)),
                   acc((8, d)), acc((8, d)), acc((8, d)), acc((d, m)),
                   acc((8, m)), acc((m, d)), acc((8, d)), acc((8, d)),
                   acc((8, d))),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MERGED_VMEM_LIMIT),
        interpret=interpret,
    )(x, g, lns1.reshape(1, d), lnb1.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d),
      lns2.reshape(1, d), lnb2.reshape(1, d), w1, b1.reshape(1, m), w2)

    (dx, dwqkv, dbqkv, dwo, dbo, dlns1, dlnb1, dw1, db1, dw2, db2, dlns2,
     dlnb2) = outs
    row0 = lambda t, like: jnp.sum(t, axis=0).astype(like.dtype)  # noqa: E731
    return (dx,
            row0(dlns1, lns1).reshape(lns1.shape),
            row0(dlnb1, lnb1).reshape(lnb1.shape),
            dwqkv.astype(w_qkv.dtype),
            row0(dbqkv, b_qkv).reshape(b_qkv.shape),
            dwo.astype(w_out.dtype),
            row0(dbo, b_out).reshape(b_out.shape),
            row0(dlns2, lns2).reshape(lns2.shape),
            row0(dlnb2, lnb2).reshape(lnb2.shape),
            dw1.astype(w1.dtype),
            row0(db1, b1).reshape(b1.shape),
            dw2.astype(w2.dtype),
            row0(db2, b2).reshape(b2.shape))


layer_block_trainable.defvjp(_trainable_fwd, _trainable_bwd)


# ------------------------------------------------------------ hybrid VJP
#
# Measured on v5e (benchmarks/train_step.py): the all-Pallas backward above
# LOSES to the split path — its per-grid-cell weight-gradient matmuls
# (197-row contractions, accumulated 256 times into VMEM blocks) cannot
# match XLA batching the same contractions over the whole (B*N) dimension
# at full MXU efficiency. The hybrid keeps the merged kernel where it wins
# (the forward: no inter-sublayer HBM round trip, fp32 residual in VMEM)
# and hands the backward to XLA: recompute the layer from `x` with a
# pure-jnp replica of the kernel math (remat-style — nothing but `x` and
# the weights is saved) and let autodiff emit batched gradient matmuls.


def _layer_jnp(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
               w1, b1, w2, b2, num_heads, eps):
    """Pure-jnp replica of _layer_fwd_kernel's math (standard softmax,
    tanh gelu, fp32 LN/residuals, bf16 matmul operands) for the hybrid
    backward's recompute."""
    b, n, d = x.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    xf = x.astype(jnp.float32)
    ln1, _, _ = _ln_f32(x.reshape(b * n, d), lns1.astype(jnp.float32),
                        lnb1.astype(jnp.float32), eps)
    ln1 = ln1.reshape(b, n, d)
    qkv = (ln1.astype(x.dtype) @ w_qkv).astype(jnp.float32) + b_qkv.astype(
        jnp.float32)
    qkv = qkv.astype(x.dtype)
    q = qkv[..., :d].reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    k = qkv[..., d:2 * d].reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    v = qkv[..., 2 * d:].reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqc,bhkc->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    s = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhqk,bhkc->bhqc", s.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
    proj = (attn @ w_out).astype(jnp.float32) + b_out.astype(jnp.float32)
    y = proj + xf
    ln2, _, _ = _ln_f32(y.reshape(b * n, d), lns2.astype(jnp.float32),
                        lnb2.astype(jnp.float32), eps)
    ln2 = ln2.reshape(b, n, d)
    hpre = (ln2.astype(x.dtype) @ w1).astype(jnp.float32) + b1.astype(
        jnp.float32)
    h = _gelu_tanh(hpre).astype(x.dtype)
    out = (h @ w2).astype(jnp.float32) + b2.astype(jnp.float32) + y
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def layer_block_hybrid(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out,
                       lns2, lnb2, w1, b1, w2, b2, num_heads: int,
                       eps: float = 1e-5, interpret: bool = False,
                       images_per_cell: int = 1):
    """Merged Pallas FORWARD + XLA recompute BACKWARD (see module note).
    Same signature/semantics as layer_block_trainable."""
    return _fwd_call(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
                     w1, b1, w2, b2, num_heads, eps, interpret,
                     images_per_cell)


def _hybrid_fwd(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
                w1, b1, w2, b2, num_heads, eps, interpret, mi):
    out = _fwd_call(x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
                    w1, b1, w2, b2, num_heads, eps, interpret, mi)
    return out, (x, lns1, lnb1, w_qkv, b_qkv, w_out, b_out, lns2, lnb2,
                 w1, b1, w2, b2)


def _hybrid_bwd(num_heads, eps, interpret, mi, res, g):
    del interpret, mi
    _, vjp = jax.vjp(
        lambda *operands: _layer_jnp(*operands, num_heads, eps), *res)
    return vjp(g)


layer_block_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


# ------------------------------------------- sequence-parallel tail block
#
# Megatron-SP shards the TOKEN axis; each device computes LN1 + qkv on its
# local rows, all-gathers K/V, then everything after the gather is local
# again: attention (local Q against full K/V), out-projection, residual,
# LN2, MLP. That post-gather tail is this kernel — the SP analogue of the
# merged layer (VERDICT r3 weak #7: the parallel training forwards should
# keep the single-chip kernel stack). One Pallas kernel per image for the
# forward; backward recomputes via a pure-jnp replica (the hybrid trick
# above — XLA batches the gradient matmuls better than per-cell VMEM
# accumulation). Standard max-subtracted softmax with additive key-mask
# exclusion (padded/ranked-off tokens never contribute; matches
# ops/attention.attention_core's key_mask semantics).


def _sp_tail_math(x, q, k, v, kmask, w_out, b_out, lns2, lnb2, w1, b1,
                  w2, b2, num_heads, eps, rows_2d: bool):
    """Shared fwd math: jnp arrays in, works both inside the kernel (2-D
    rows per image) and as the backward's batched replica (3-D)."""
    d = x.shape[-1]
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    xf = x.astype(jnp.float32)
    if rows_2d:
        cols = []
        for h in range(num_heads):
            qh = q[:, h * hd:(h + 1) * hd]
            kh = k[:, h * hd:(h + 1) * hd]
            vh = v[:, h * hd:(h + 1) * hd]
            logits = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(kmask[None, :] > 0, logits, -jnp.inf)
            s = jax.nn.softmax(logits, axis=-1)
            cols.append(jax.lax.dot_general(
                s.astype(vh.dtype), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
        attn = jnp.concatenate(cols, axis=-1)
    else:
        b, nq, _ = q.shape
        nk = k.shape[1]
        qh = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqc,bhkc->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kmask[:, None, None, :] > 0, logits, -jnp.inf)
        s = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bhkc->bhqc", s.astype(vh.dtype), vh,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, nq, d)
    proj = jax.lax.dot_general(
        attn, w_out, dimension_numbers=(((attn.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = proj + b_out.astype(jnp.float32).reshape(-1) + xf
    sh = y.shape
    ln2, _, _ = _ln_f32(y.reshape(-1, d),
                        lns2.astype(jnp.float32).reshape(-1),
                        lnb2.astype(jnp.float32).reshape(-1), eps)
    ln2 = ln2.reshape(sh).astype(x.dtype)
    hpre = jax.lax.dot_general(
        ln2, w1, dimension_numbers=(((ln2.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = _gelu_tanh(hpre + b1.astype(jnp.float32).reshape(-1)).astype(x.dtype)
    out = jax.lax.dot_general(
        h, w2, dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (out + b2.astype(jnp.float32).reshape(-1) + y).astype(x.dtype)


def _sp_tail_kernel(x_ref, q_ref, k_ref, v_ref, km_ref, wo_ref, bo_ref,
                    lns2_ref, lnb2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    o_ref, *, num_heads: int, eps: float):
    nq, d = x_ref.shape[1], x_ref.shape[2]
    nk = k_ref.shape[1]
    o_ref[...] = _sp_tail_math(
        x_ref[...].reshape(nq, d), q_ref[...].reshape(nq, d),
        k_ref[...].reshape(nk, d), v_ref[...].reshape(nk, d),
        km_ref[...].reshape(nk), wo_ref[...], bo_ref[0],
        lns2_ref[0], lnb2_ref[0], w1_ref[...], b1_ref[0], w2_ref[...],
        b2_ref[0], num_heads, eps, rows_2d=True,
    ).reshape(o_ref.shape).astype(o_ref.dtype)


def _sp_tail_call(x, q, k, v, kmask, w_out, b_out, lns2, lnb2, w1, b1, w2,
                  b2, num_heads, eps, interpret):
    b, nq, d = x.shape
    nk = k.shape[1]
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    ioq = pl.BlockSpec((1, nq, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    iok = pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    iom = pl.BlockSpec((1, nk), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sp_tail_kernel, num_heads=num_heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, nq, d), x.dtype),
        grid=(b,),
        in_specs=[ioq, ioq, iok, iok, iom, full((d, d)), full((1, d)),
                  full((1, d)), full((1, d)), full((d, m)), full((1, m)),
                  full((m, d)), full((1, d))],
        out_specs=ioq,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MERGED_VMEM_LIMIT),
        interpret=interpret,
    )(x, q, k, v, kmask, w_out, b_out.reshape(1, d), lns2.reshape(1, d),
      lnb2.reshape(1, d), w1, b1.reshape(1, m), w2, b2.reshape(1, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def sp_tail_block(x, q, k, v, kmask, w_out, b_out, lns2, lnb2, w1, b1,
                  w2, b2, num_heads: int, eps: float = 1e-5,
                  interpret: bool = False):
    """Post-gather SP tail: out = y + MLP(LN2(y)),
    y = x + OutProj(Attn(q, k, v; kmask)). x/q: (B, n_local, D);
    k/v: (B, n_full, D); kmask: (B, n_full) with 1 = attend. Pallas
    forward, XLA-recompute backward (differentiable in all tensor args
    except kmask, which is a selection input)."""
    return _sp_tail_call(x, q, k, v, kmask, w_out, b_out, lns2, lnb2,
                         w1, b1, w2, b2, num_heads, eps, interpret)


def _sp_tail_fwd(x, q, k, v, kmask, w_out, b_out, lns2, lnb2, w1, b1, w2,
                 b2, num_heads, eps, interpret):
    out = _sp_tail_call(x, q, k, v, kmask, w_out, b_out, lns2, lnb2, w1,
                        b1, w2, b2, num_heads, eps, interpret)
    return out, (x, q, k, v, kmask, w_out, b_out, lns2, lnb2, w1, b1, w2, b2)


def _sp_tail_bwd(num_heads, eps, interpret, res, g):
    del interpret
    x, q, k, v, kmask, *ws = res

    def replica(x_, q_, k_, v_, *ws_):
        return _sp_tail_math(x_, q_, k_, v_, kmask, *ws_, num_heads, eps,
                             rows_2d=False)

    _, vjp = jax.vjp(replica, x, q, k, v, *ws)
    dx, dq, dk, dv, *dws = vjp(g)
    return (dx, dq, dk, dv, jnp.zeros_like(kmask), *dws)


sp_tail_block.defvjp(_sp_tail_fwd, _sp_tail_bwd)
