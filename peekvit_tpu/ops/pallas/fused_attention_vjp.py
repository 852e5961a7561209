"""Trainable fused attention sublayer: custom VJP over Pallas kernels.

Forward = ops/pallas/fused_attention's attention block (LN -> qkv -> MHSA ->
out-proj -> residual) with one extra output: the concatenated head outputs
``attn`` (needed for dW_out without a second attention recompute).

Backward splits work by what each engine is best at:
- a Pallas kernel recomputes LN/qkv/softmax per image (flash-style) and
  produces ``dx`` (including the residual and LN backward) and ``dqkv`` —
  the fp32 score-matrix algebra (dS, softmax backward, dQ/dK/dV) never
  touches HBM;
- XLA computes the big weight-grad matmuls (dWqkv = LN(x)^T dqkv,
  dW_out = attn^T g) at MXU peak, plus the bias sums.

Gradient parity vs jax.grad of the pure-jnp reference is pinned in
tests/test_pallas_vjp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_f32(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    return xhat * gamma + beta, xhat, inv


def _ln_bwd(dln, xhat, inv, gamma):
    """LN backward for the data path (gamma/beta grads handled by caller)."""
    dxhat = dln * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return (dxhat - m1 - xhat * m2) * inv


# --------------------------------------------------------------- fwd kernel


def _attn_fwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wo_ref,
                     bo_ref, o_ref, attn_ref, *maybe_qkv_ref,
                     num_heads: int, eps: float):
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    xf = x.astype(jnp.float32)
    ln, _, _ = _ln_f32(x, lns_ref[0].astype(jnp.float32),
                       lnb_ref[0].astype(jnp.float32), eps)
    ln = ln.astype(x.dtype)
    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    if maybe_qkv_ref:  # save_qkv mode: the backward skips the qkv recompute
        maybe_qkv_ref[0][...] = qkv.reshape(mi, n, 3 * d)

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
                preferred_element_type=jnp.float32).astype(x.dtype))
        cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(cols, axis=-1)
    attn_ref[...] = attn.reshape(mi, n, d)

    out = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    out = out + bo_ref[0].astype(jnp.float32) + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


# --------------------------------------------------------------- bwd kernel


def _attn_bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                     wo_ref, dx_ref, dqkv_ref, dlns_ref, dlnb_ref,
                     *, num_heads: int, eps: float):
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    g = g_ref[...].reshape(mi * n, d).astype(jnp.float32)
    gamma = lns_ref[0].astype(jnp.float32)
    beta = lnb_ref[0].astype(jnp.float32)

    # recompute forward intermediates (flash-style)
    ln_f32, xhat, inv = _ln_f32(x, gamma, beta, eps)
    ln = ln_f32.astype(x.dtype)
    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    # dattn = g @ Wo^T
    dattn = jax.lax.dot_general(
        g.astype(x.dtype), wo_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    dqkv_cols_q, dqkv_cols_k, dqkv_cols_v = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        da_h = dattn[:, h * hd:(h + 1) * hd]
        dq_list, dk_list, dv_list = [], [], []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            daj = da_h[j * n:(j + 1) * n]
            logits = jax.lax.dot_general(
                qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jax.nn.softmax(logits, axis=-1)  # (N, N) fp32
            sb = s.astype(x.dtype)
            # dV = S^T @ dattn
            dv_list.append(jax.lax.dot_general(
                sb, daj, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
            # dS = dattn @ V^T ; softmax bwd
            ds = jax.lax.dot_general(
                daj, vj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dz = s * (ds - jnp.sum(ds * s, axis=-1, keepdims=True))
            dzb = (dz * scale).astype(x.dtype)
            # dQ = scale * dZ @ K ; dK = scale * dZ^T @ Q
            dq_list.append(jax.lax.dot_general(
                dzb, kj, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
            dk_list.append(jax.lax.dot_general(
                dzb, qj, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
        cat = (lambda ls: jnp.concatenate(ls, axis=0) if mi > 1 else ls[0])
        dqkv_cols_q.append(cat(dq_list))
        dqkv_cols_k.append(cat(dk_list))
        dqkv_cols_v.append(cat(dv_list))
    dqkv = jnp.concatenate(
        dqkv_cols_q + dqkv_cols_k + dqkv_cols_v, axis=-1
    )  # (mi*N, 3D) — [all q heads | all k heads | all v heads] == layout
    dqkv_ref[...] = dqkv.reshape(mi, n, 3 * d)

    # dln = dqkv @ Wqkv^T ; LN backward ; residual add
    dln = jax.lax.dot_general(
        dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # (1, 8, d) output block (TPU tiling needs sublane multiples of 8);
    # partials live in row 0, the rest is zeroed and summed away by XLA.
    # (iota+where, not .at[].set — Mosaic has no scatter lowering)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    dlns_ref[0] = jnp.where(row == 0, jnp.sum(dln * xhat, axis=0)[None, :], 0.0)
    dlnb_ref[0] = jnp.where(row == 0, jnp.sum(dln, axis=0)[None, :], 0.0)
    dx = _ln_bwd(dln, xhat, inv, gamma) + g
    dx_ref[...] = dx.reshape(mi, n, d).astype(dx_ref.dtype)


def _attn_bwd_kernel_saved(x_ref, g_ref, qkv_ref, lns_ref, lnb_ref,
                           wqkv_ref, wo_ref, dx_ref, dqkv_ref, ln_ref,
                           dlns_ref, dlnb_ref, *, num_heads: int,
                           eps: float):
    """Backward with the forward's qkv SAVED (read from HBM) instead of
    recomputed: skips the LN+qkv matmul recompute (~23% of a layer's
    forward MACs) for one extra (mi, N, 3D) stream in each direction, and
    emits ``ln`` (recovered from the same LN stats the LN-backward needs
    anyway) so the XLA weight-grad matmul doesn't re-materialize it in
    fp32."""
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    g = g_ref[...].reshape(mi * n, d).astype(jnp.float32)
    qkv = qkv_ref[...].reshape(mi * n, 3 * d)
    gamma = lns_ref[0].astype(jnp.float32)
    beta = lnb_ref[0].astype(jnp.float32)

    # LN stats only (cheap VPU; the matmul recompute is what we skip)
    ln_f32, xhat, inv = _ln_f32(x, gamma, beta, eps)
    ln_ref[...] = ln_f32.astype(ln_ref.dtype).reshape(mi, n, d)

    # dattn = g @ Wo^T
    dattn = jax.lax.dot_general(
        g.astype(x.dtype), wo_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    dqkv_cols_q, dqkv_cols_k, dqkv_cols_v = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        da_h = dattn[:, h * hd:(h + 1) * hd]
        dq_list, dk_list, dv_list = [], [], []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            daj = da_h[j * n:(j + 1) * n]
            logits = jax.lax.dot_general(
                qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jax.nn.softmax(logits, axis=-1)  # (N, N) fp32
            sb = s.astype(x.dtype)
            dv_list.append(jax.lax.dot_general(
                sb, daj, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
            ds = jax.lax.dot_general(
                daj, vj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dz = s * (ds - jnp.sum(ds * s, axis=-1, keepdims=True))
            dzb = (dz * scale).astype(x.dtype)
            dq_list.append(jax.lax.dot_general(
                dzb, kj, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
            dk_list.append(jax.lax.dot_general(
                dzb, qj, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
        cat = (lambda ls: jnp.concatenate(ls, axis=0) if mi > 1 else ls[0])
        dqkv_cols_q.append(cat(dq_list))
        dqkv_cols_k.append(cat(dk_list))
        dqkv_cols_v.append(cat(dv_list))
    dqkv = jnp.concatenate(dqkv_cols_q + dqkv_cols_k + dqkv_cols_v, axis=-1)
    dqkv_ref[...] = dqkv.reshape(mi, n, 3 * d)

    dln = jax.lax.dot_general(
        dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    dlns_ref[0] = jnp.where(row == 0, jnp.sum(dln * xhat, axis=0)[None, :], 0.0)
    dlnb_ref[0] = jnp.where(row == 0, jnp.sum(dln, axis=0)[None, :], 0.0)
    dx = _ln_bwd(dln, xhat, inv, gamma) + g
    dx_ref[...] = dx.reshape(mi, n, d).astype(dx_ref.dtype)


def _fwd_call(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, num_heads,
              eps, interpret, mi, save_qkv=False):
    b, n, d = x.shape
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b, n, d), x.dtype),
                 jax.ShapeDtypeStruct((b, n, d), x.dtype)]
    out_specs = [io, io]
    if save_qkv:
        out_shape.append(jax.ShapeDtypeStruct((b, n, 3 * d), x.dtype))
        out_specs.append(pl.BlockSpec((mi, n, 3 * d), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, num_heads=num_heads, eps=eps),
        out_shape=tuple(out_shape),
        grid=(b // mi,),
        in_specs=[io, full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d)), full((1, d))],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def attention_block_trainable(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                              b_out, num_heads: int, eps: float = 1e-5,
                              interpret: bool = False,
                              images_per_cell: int = 1,
                              save_qkv: bool = False):
    """Differentiable x + OutProj(MHSA(LN(x))) with fused fwd/bwd kernels.

    ``save_qkv=True`` spends (B, N, 3D) of HBM per layer to skip the
    backward's LN+qkv-matmul recompute and the XLA-side fp32 LN
    rematerialization feeding the weight-grad matmul."""
    out = _fwd_call(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                    num_heads, eps, interpret, images_per_cell, save_qkv)
    return out[0]


def _trainable_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                   num_heads, eps, interpret, images_per_cell, save_qkv):
    res = _fwd_call(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                    num_heads, eps, interpret, images_per_cell, save_qkv)
    if save_qkv:
        out, attn, qkv = res
        return out, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, attn, qkv)
    out, attn = res
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, attn, None)


def _trainable_bwd(num_heads, eps, interpret, images_per_cell, save_qkv,
                   res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, attn, qkv = res
    if save_qkv:
        return _trainable_bwd_saved(num_heads, eps, interpret,
                                    images_per_cell, res, g)
    b, n, d = x.shape
    mi = images_per_cell
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    io3 = pl.BlockSpec((mi, n, 3 * d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    # per-cell LN-param partials summed by XLA afterwards ((1, 8, d)
    # blocks: TPU tiling requires sublane multiples of 8)
    lnp = pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    dx, dqkv, dlns_parts, dlnb_parts = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, 3 * d), x.dtype),
            jax.ShapeDtypeStruct((b // mi, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b // mi, 8, d), jnp.float32),
        ),
        grid=(b // mi,),
        in_specs=[io, io, full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d))],
        out_specs=(io, io3, lnp, lnp),
        interpret=interpret,
    )(x, g, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out)

    gf = g.reshape(-1, d).astype(jnp.float32)
    dqkv_f = dqkv.reshape(-1, 3 * d)
    # big weight-grad matmuls on XLA (MXU peak); LN(x) recomputed cheaply
    xf = x.reshape(-1, d).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    d_wqkv = (ln.astype(x.dtype).T @ dqkv_f).astype(w_qkv.dtype)
    d_bqkv = jnp.sum(dqkv_f.astype(jnp.float32), axis=0).astype(w_qkv.dtype)
    attn_f = attn.reshape(-1, d)
    d_wout = (attn_f.T.astype(jnp.float32) @ gf).astype(w_out.dtype)
    d_bout = jnp.sum(gf, axis=0).astype(w_out.dtype)
    d_lns = jnp.sum(dlns_parts, axis=(0, 1)).astype(ln_scale.dtype)
    d_lnb = jnp.sum(dlnb_parts, axis=(0, 1)).astype(ln_bias.dtype)
    return dx, d_lns, d_lnb, d_wqkv, d_bqkv, d_wout, d_bout


def _trainable_bwd_saved(num_heads, eps, interpret, images_per_cell, res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, attn, qkv = res
    b, n, d = x.shape
    mi = images_per_cell
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    io3 = pl.BlockSpec((mi, n, 3 * d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    lnp = pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    dx, dqkv, ln, dlns_parts, dlnb_parts = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_saved, num_heads=num_heads,
                          eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, 3 * d), x.dtype),
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b // mi, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b // mi, 8, d), jnp.float32),
        ),
        grid=(b // mi,),
        in_specs=[io, io, io3, full((1, d)), full((1, d)),
                  full((d, 3 * d)), full((d, d))],
        out_specs=(io, io3, io, lnp, lnp),
        interpret=interpret,
    )(x, g, qkv, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w_qkv,
      w_out)

    gf = g.reshape(-1, d).astype(jnp.float32)
    dqkv_f = dqkv.reshape(-1, 3 * d)
    d_wqkv = (ln.reshape(-1, d).T @ dqkv_f).astype(w_qkv.dtype)
    d_bqkv = jnp.sum(dqkv_f.astype(jnp.float32), axis=0).astype(w_qkv.dtype)
    attn_f = attn.reshape(-1, d)
    d_wout = (attn_f.T.astype(jnp.float32) @ gf).astype(w_out.dtype)
    d_bout = jnp.sum(gf, axis=0).astype(w_out.dtype)
    d_lns = jnp.sum(dlns_parts, axis=(0, 1)).astype(ln_scale.dtype)
    d_lnb = jnp.sum(dlnb_parts, axis=(0, 1)).astype(ln_bias.dtype)
    return dx, d_lns, d_lnb, d_wqkv, d_bqkv, d_wout, d_bout


attention_block_trainable.defvjp(_trainable_fwd, _trainable_bwd)


# ---------------------------------------------- masked (gated) trainable


def _masked_fwd_kernel(x_ref, m_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       wo_ref, bo_ref, o_ref, attn_ref, *maybe_qkv_ref,
                       num_heads: int, eps: float):
    """ResidualViT attention sublayer fwd:
    out = x + mask * OutProj(MHSA(mask * LN(x))); also emits attn for dWo."""
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    ln, _, _ = _ln_f32(x, lns_ref[0].astype(jnp.float32),
                       lnb_ref[0].astype(jnp.float32), eps)
    s1 = (ln * mask).astype(x.dtype)
    qkv = jnp.dot(s1, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    if maybe_qkv_ref:  # save_qkv mode: the backward skips ALL recomputes
        maybe_qkv_ref[0][...] = qkv.reshape(mi, n, 3 * d)

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
                preferred_element_type=jnp.float32).astype(x.dtype))
        cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(cols, axis=-1)
    attn_ref[...] = attn.reshape(mi, n, d)

    proj = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    proj = proj + bo_ref[0].astype(jnp.float32)
    out = proj * mask + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


def _masked_bwd_kernel(x_ref, m_ref, g_ref, lns_ref, lnb_ref, wqkv_ref,
                       bqkv_ref, wo_ref, bo_ref,
                       dx_ref, dqkv_ref, dm_ref, dlns_ref, dlnb_ref,
                       *, num_heads: int, eps: float):
    """Backward of the masked attention sublayer (recompute style).

    Emits dx (residual + LN bwd folded in), dqkv (for XLA's dWqkv), dm
    (the gate mask cotangent: both the output-mask and the input-mask
    terms), and per-cell LN-param partials.
    """
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    g = g_ref[...].reshape(mi * n, d).astype(jnp.float32)
    gamma = lns_ref[0].astype(jnp.float32)
    beta = lnb_ref[0].astype(jnp.float32)

    # --- recompute forward
    ln_f32, xhat, inv = _ln_f32(x, gamma, beta, eps)
    s1 = (ln_f32 * mask).astype(x.dtype)
    qkv = jnp.dot(s1, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    heads = []
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
                preferred_element_type=jnp.float32).astype(x.dtype))
        heads.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(heads, axis=-1)
    proj = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    proj = proj + bo_ref[0].astype(jnp.float32)

    # --- backward
    # out = proj * mask + x   =>   dproj = g * mask ; dm += sum(g*proj, -1)
    dproj = g * mask
    dm = jnp.sum(g * proj, axis=-1, keepdims=True)
    dattn = jax.lax.dot_general(
        dproj.astype(x.dtype), wo_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

    dq_cols, dk_cols, dv_cols = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        da_h = dattn[:, h * hd:(h + 1) * hd]
        dq_l, dk_l, dv_l = [], [], []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            daj = da_h[j * n:(j + 1) * n]
            logits = jax.lax.dot_general(
                qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jax.nn.softmax(logits, axis=-1)
            dv_l.append(jax.lax.dot_general(
                s.astype(x.dtype), daj,
                dimension_numbers=(((0,), (0,)), ((), ())),
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
    dqkv_ref[...] = dqkv.reshape(mi, n, 3 * d)

    # ds1 = dqkv @ Wqkv^T ; s1 = mask * ln
    ds1 = jax.lax.dot_general(
        dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dm = dm + jnp.sum(ds1 * ln_f32, axis=-1, keepdims=True)
    dln = ds1 * mask
    row = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    dlns_ref[0] = jnp.where(row == 0, jnp.sum(dln * xhat, axis=0)[None, :], 0.0)
    dlnb_ref[0] = jnp.where(row == 0, jnp.sum(dln, axis=0)[None, :], 0.0)
    dx = _ln_bwd(dln, xhat, inv, gamma) + g
    dx_ref[...] = dx.reshape(mi, n, d).astype(dx_ref.dtype)
    dm_ref[...] = dm.reshape(mi, n, 1).astype(dm_ref.dtype)


def _masked_bwd_kernel_saved(x_ref, m_ref, g_ref, attn_ref, qkv_ref,
                             lns_ref, lnb_ref, wqkv_ref, wo_ref, bo_ref,
                             dx_ref, dqkv_ref, dm_ref, s1_ref,
                             dlns_ref, dlnb_ref, *, num_heads: int,
                             eps: float):
    """Masked backward with the forward's qkv SAVED and proj rebuilt from
    the (already-saved) attn with one d x d matmul — removes BOTH forward
    recomputes the recompute-style kernel pays (the LN+qkv matmul and the
    full attention pass that only existed to rebuild ``proj`` for dm).
    Also emits ``s1`` = mask*LN(x) so XLA's dWqkv matmul doesn't
    re-materialize it in fp32."""
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    g = g_ref[...].reshape(mi * n, d).astype(jnp.float32)
    attn = attn_ref[...].reshape(mi * n, d)
    qkv = qkv_ref[...].reshape(mi * n, 3 * d)
    gamma = lns_ref[0].astype(jnp.float32)
    beta = lnb_ref[0].astype(jnp.float32)

    ln_f32, xhat, inv = _ln_f32(x, gamma, beta, eps)
    s1_ref[...] = (ln_f32 * mask).astype(s1_ref.dtype).reshape(mi, n, d)

    proj = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    proj = proj + bo_ref[0].astype(jnp.float32)

    dproj = g * mask
    dm = jnp.sum(g * proj, axis=-1, keepdims=True)
    dattn = jax.lax.dot_general(
        dproj.astype(x.dtype), wo_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

    dq_cols, dk_cols, dv_cols = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        da_h = dattn[:, h * hd:(h + 1) * hd]
        dq_l, dk_l, dv_l = [], [], []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            daj = da_h[j * n:(j + 1) * n]
            logits = jax.lax.dot_general(
                qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jax.nn.softmax(logits, axis=-1)
            dv_l.append(jax.lax.dot_general(
                s.astype(x.dtype), daj,
                dimension_numbers=(((0,), (0,)), ((), ())),
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
    dqkv_ref[...] = dqkv.reshape(mi, n, 3 * d)

    ds1 = jax.lax.dot_general(
        dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dm = dm + jnp.sum(ds1 * ln_f32, axis=-1, keepdims=True)
    dln = ds1 * mask
    row = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    dlns_ref[0] = jnp.where(row == 0, jnp.sum(dln * xhat, axis=0)[None, :], 0.0)
    dlnb_ref[0] = jnp.where(row == 0, jnp.sum(dln, axis=0)[None, :], 0.0)
    dx = _ln_bwd(dln, xhat, inv, gamma) + g
    dx_ref[...] = dx.reshape(mi, n, d).astype(dx_ref.dtype)
    dm_ref[...] = dm.reshape(mi, n, 1).astype(dm_ref.dtype)


def _masked_fwd_call(x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                     num_heads, eps, interpret, mi, save_qkv=False):
    b, n, d = x.shape
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b, n, d), x.dtype),
                 jax.ShapeDtypeStruct((b, n, d), x.dtype)]
    out_specs = [io, io]
    if save_qkv:
        out_shape.append(jax.ShapeDtypeStruct((b, n, 3 * d), x.dtype))
        out_specs.append(pl.BlockSpec((mi, n, 3 * d), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_masked_fwd_kernel, num_heads=num_heads, eps=eps),
        out_shape=tuple(out_shape),
        grid=(b // mi,),
        in_specs=[io, iom, full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d)), full((1, d))],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def masked_attention_block_trainable(x, mask, ln_scale, ln_bias, w_qkv,
                                     b_qkv, w_out, b_out, num_heads: int,
                                     eps: float = 1e-6,
                                     interpret: bool = False,
                                     save_qkv: bool = False):
    """Differentiable x + mask*OutProj(MHSA(mask*LN(x))); the mask is a
    differentiable operand, so gate gradients flow (ResidualViT training).

    ``save_qkv=True`` spends (B, N, 3D) of HBM per layer to remove both of
    the backward's forward recomputes (LN+qkv matmul, attention pass)."""
    out = _masked_fwd_call(x, mask, ln_scale, ln_bias, w_qkv, b_qkv,
                           w_out, b_out, num_heads, eps, interpret, 1,
                           save_qkv)
    return out[0]


def _masked_trainable_fwd(x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                          b_out, num_heads, eps, interpret, save_qkv):
    res = _masked_fwd_call(x, mask, ln_scale, ln_bias, w_qkv, b_qkv,
                           w_out, b_out, num_heads, eps, interpret, 1,
                           save_qkv)
    qkv = res[2] if save_qkv else None
    return res[0], (x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                    res[1], qkv)


def _masked_trainable_bwd(num_heads, eps, interpret, save_qkv, res, g):
    x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, attn, qkv = res
    if save_qkv:
        return _masked_trainable_bwd_saved(num_heads, eps, interpret,
                                           res, g)
    b, n, d = x.shape
    mi = 1
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    io3 = pl.BlockSpec((mi, n, 3 * d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    lnp = pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    dx, dqkv, dm, dlns_parts, dlnb_parts = pl.pallas_call(
        functools.partial(_masked_bwd_kernel, num_heads=num_heads, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, 3 * d), x.dtype),
            jax.ShapeDtypeStruct((b, n, 1), mask.dtype),
            jax.ShapeDtypeStruct((b // mi, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b // mi, 8, d), jnp.float32),
        ),
        grid=(b // mi,),
        in_specs=[io, iom, io, full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d)), full((1, d))],
        out_specs=(io, io3, iom, lnp, lnp),
        interpret=interpret,
    )(x, mask, g, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d))

    # XLA weight-grad matmuls; s1 = mask*LN(x) recomputed cheaply
    gf = g.reshape(-1, d).astype(jnp.float32)
    xf = x.reshape(-1, d).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    s1 = (ln * mask.reshape(-1, 1).astype(jnp.float32)).astype(x.dtype)
    dqkv_f = dqkv.reshape(-1, 3 * d)
    d_wqkv = (s1.T @ dqkv_f).astype(w_qkv.dtype)
    d_bqkv = jnp.sum(dqkv_f.astype(jnp.float32), axis=0).astype(w_qkv.dtype)
    dproj = gf * mask.reshape(-1, 1).astype(jnp.float32)
    attn_f = attn.reshape(-1, d)
    d_wout = (attn_f.T.astype(jnp.float32) @ dproj).astype(w_out.dtype)
    d_bout = jnp.sum(dproj, axis=0).astype(w_out.dtype)
    d_lns = jnp.sum(dlns_parts, axis=(0, 1)).astype(ln_scale.dtype)
    d_lnb = jnp.sum(dlnb_parts, axis=(0, 1)).astype(ln_bias.dtype)
    return dx, dm, d_lns, d_lnb, d_wqkv, d_bqkv, d_wout, d_bout


def _masked_trainable_bwd_saved(num_heads, eps, interpret, res, g):
    x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, attn, qkv = res
    b, n, d = x.shape
    mi = 1
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    io3 = pl.BlockSpec((mi, n, 3 * d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    lnp = pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    dx, dqkv, dm, s1, dlns_parts, dlnb_parts = pl.pallas_call(
        functools.partial(_masked_bwd_kernel_saved, num_heads=num_heads,
                          eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b, n, 3 * d), x.dtype),
            jax.ShapeDtypeStruct((b, n, 1), mask.dtype),
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((b // mi, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b // mi, 8, d), jnp.float32),
        ),
        grid=(b // mi,),
        in_specs=[io, iom, io, io, io3, full((1, d)), full((1, d)),
                  full((d, 3 * d)), full((d, d)), full((1, d))],
        out_specs=(io, io3, iom, io, lnp, lnp),
        interpret=interpret,
    )(x, mask, g, attn, qkv, ln_scale.reshape(1, d),
      ln_bias.reshape(1, d), w_qkv, w_out, b_out.reshape(1, d))

    gf = g.reshape(-1, d).astype(jnp.float32)
    dqkv_f = dqkv.reshape(-1, 3 * d)
    d_wqkv = (s1.reshape(-1, d).T @ dqkv_f).astype(w_qkv.dtype)
    d_bqkv = jnp.sum(dqkv_f.astype(jnp.float32), axis=0).astype(w_qkv.dtype)
    dproj = gf * mask.reshape(-1, 1).astype(jnp.float32)
    attn_f = attn.reshape(-1, d)
    d_wout = (attn_f.T.astype(jnp.float32) @ dproj).astype(w_out.dtype)
    d_bout = jnp.sum(dproj, axis=0).astype(w_out.dtype)
    d_lns = jnp.sum(dlns_parts, axis=(0, 1)).astype(ln_scale.dtype)
    d_lnb = jnp.sum(dlnb_parts, axis=(0, 1)).astype(ln_bias.dtype)
    return dx, dm, d_lns, d_lnb, d_wqkv, d_bqkv, d_wout, d_bout


masked_attention_block_trainable.defvjp(_masked_trainable_fwd,
                                        _masked_trainable_bwd)
