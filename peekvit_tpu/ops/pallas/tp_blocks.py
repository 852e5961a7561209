"""Tensor-parallel PARTIAL sublayer kernels (Megatron layout on TPU).

Serving-side tensor parallelism for the ViT engines: each chip of the
mesh's ``model`` axis holds a head-slice of the attention weights and a
column/row slice of the MLP, runs these kernels on the full (replicated)
token stream, and contributes a PARTIAL sublayer output; one
``lax.psum`` over the model axis per sublayer completes the Megatron
schedule (column-parallel qkv/fc1, row-parallel out-proj/fc2 — the same
rules as parallel/mesh.py's training ``_TP_RULES``, hand-scheduled here
because Pallas calls are not GSPMD-partitionable).

The kernels mirror the single-device merged/folded kernels
(fused_attention.py ``_layer_kernel`` with ``folded=True``): LayerNorm
affines are pre-folded into the qkv/fc1 weight slices, so in-kernel LN
is the plain row normalization, and the fast exp2 softmax with the
folded rowsum ones-column is reused via ``_attn_scores_pv``. Unlike the
single-device kernels they return the bare partial projection products —
no bias, no residual add — in fp32: the psum must see unrounded
partials, and bias/residual are added ONCE after the reduction (adding
them per-shard would multiply them by the shard count).

No reference counterpart: the reference is single-device
(SURVEY.md §"Parallelism inventory"; /root/reference/train/train.py:61).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from peekvit_tpu.ops.pallas.fused_attention import (
    _attn_scores_pv,
    _norm_rows,
    _safe_images_per_cell,
)


def _tp_attn_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, o_ref, *,
                    heads_local: int, head_dim: int, eps: float):
    """Partial attention sublayer for one model-parallel shard:
    norm(x) @ wqkv_local -> local-head MHSA -> @ wo_local. Output is the
    fp32 partial out-projection (no bias/residual — added post-psum)."""
    mi, n, d = x_ref.shape
    dl = heads_local * head_dim  # this shard's slice of the head dim
    scale = 1.0 / (head_dim ** 0.5)
    x = x_ref[...].reshape(mi * n, d)

    ln = _norm_rows(x.astype(jnp.float32), eps).astype(x.dtype)
    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    attn_cols = []
    for h in range(heads_local):  # static unroll over LOCAL heads
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, dl + h * head_dim:dl + (h + 1) * head_dim]
        v = qkv[:, 2 * dl + h * head_dim:2 * dl + (h + 1) * head_dim]
        outs = []
        for j in range(mi):  # per-image scores (no cross-image attention)
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            outs.append(_attn_scores_pv(qj, kj, vj, scale).astype(x.dtype))
        attn_cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(attn_cols, axis=-1)  # (mi*N, dl)

    partial = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = partial.reshape(mi, n, d)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def tp_attention_partial(x, wqkv, bqkv, wo, heads_local: int,
                         eps: float = 1e-5, interpret: bool = False,
                         images_per_cell: int = 1) -> jax.Array:
    """Partial Megatron attention sublayer on one shard.

    x: (B, N, D) replicated tokens; wqkv: (D, 3*dl) folded-LN column
    slice laid out [q_local | k_local | v_local]; bqkv: (1, 3*dl);
    wo: (dl, D) row slice. Returns fp32 (B, N, D) partials — callers
    psum over the model axis, then add ``x + partials + b_out``.
    """
    b, n, d = x.shape
    dl = wo.shape[0]
    head_dim = dl // heads_local
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — weights resident
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tp_attn_kernel, heads_local=heads_local,
                          head_dim=head_dim, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        grid=(b // mi,),
        in_specs=[io, full((d, 3 * dl)), full((1, 3 * dl)), full((dl, d))],
        out_specs=io,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (4 * d * dl + 2 * n * dl),
            bytes_accessed=(b * n * d * (x.dtype.itemsize + 4)
                            + 4 * d * dl * x.dtype.itemsize),
            transcendentals=b * heads_local * n * n,
        ),
        interpret=interpret,
    )(x, wqkv, bqkv, wo)


def _tp_masked_attn_kernel(x_ref, m_ref, lns_ref, lnb_ref, wqkv_ref,
                           bqkv_ref, wo_ref, o_ref, *,
                           heads_local: int, head_dim: int, eps: float):
    """Partial MASKED attention sublayer (ResidualViT semantics, reference
    residualvit.py:249-260 via fused_attention._masked_attn_kernel):
    mask * LN_affine(x) feeds this shard's qkv column slice; output is the
    fp32 partial out-projection. The bias add, the OUTPUT mask multiply
    and the residual all happen post-psum in the caller — masking the
    partial here would be equivalent (mask is per-row) but the bias must
    be added exactly once, so the whole epilogue stays outside."""
    mi, n, d = x_ref.shape
    dl = heads_local * head_dim
    scale = 1.0 / (head_dim ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)

    xf = x.astype(jnp.float32)
    ln = _norm_rows(xf, eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = (ln * mask).astype(x.dtype)

    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    attn_cols = []
    for h in range(heads_local):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, dl + h * head_dim:dl + (h + 1) * head_dim]
        v = qkv[:, 2 * dl + h * head_dim:2 * dl + (h + 1) * head_dim]
        outs = []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            outs.append(_attn_scores_pv(qj, kj, vj, scale).astype(x.dtype))
        attn_cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(attn_cols, axis=-1)

    partial = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = partial.reshape(mi, n, d)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def tp_masked_attention_partial(x, mask, ln_scale, ln_bias, wqkv, bqkv, wo,
                                heads_local: int, eps: float = 1e-6,
                                interpret: bool = False,
                                images_per_cell: int = 1) -> jax.Array:
    """Partial Megatron MASKED attention sublayer on one shard.

    x: (B, N, D) replicated tokens; mask: (B, N, 1) replicated gate mask
    (identical on every model shard — gates compute from replicated
    activations); ln_scale/ln_bias: (1, D) block-LN affine (NOT folded —
    the row mask multiplies the affined LN output, which does not commute
    with a folded bias); wqkv: (D, 3*dl) column slice ``[q_s|k_s|v_s]``;
    wo: (dl, D) row slice. Returns fp32 (B, N, D) partials — callers psum
    over the model axis, then apply ``(psum + b_out) * mask + x``.
    """
    b, n, d = x.shape
    dl = wo.shape[0]
    head_dim = dl // heads_local
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — weights resident
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tp_masked_attn_kernel, heads_local=heads_local,
                          head_dim=head_dim, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        grid=(b // mi,),
        in_specs=[io, iom, full((1, d)), full((1, d)), full((d, 3 * dl)),
                  full((1, 3 * dl)), full((dl, d))],
        out_specs=io,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (4 * d * dl + 2 * n * dl),
            bytes_accessed=(b * n * d * (x.dtype.itemsize + 4)
                            + 4 * d * dl * x.dtype.itemsize),
            transcendentals=b * heads_local * n * n,
        ),
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, d), ln_bias.reshape(1, d), wqkv,
      bqkv.reshape(1, 3 * dl), wo)


def _tp_masked_mlp_kernel(x_ref, m_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                          w2_ref, o_ref, *, eps: float):
    """Partial MASKED MLP sublayer: mask * LN_affine(x) @ w1_local ->
    gelu -> @ w2_local. fp32 partials, no bias/residual (post-psum; the
    MLP output itself is NOT masked — reference residualvit.py:258-260,
    matching fused_attention._masked_mlp_kernel)."""
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    ln = _norm_rows(x.astype(jnp.float32), eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = (ln * mask).astype(x.dtype)
    h = jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    partial = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = partial.reshape(mi, n, d)


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def tp_masked_mlp_partial(x, mask, ln_scale, ln_bias, w1, b1, w2,
                          eps: float = 1e-6, interpret: bool = False,
                          images_per_cell: int = 1) -> jax.Array:
    """Partial Megatron MASKED MLP sublayer on one shard.

    x: (B, N, D) replicated tokens; mask: (B, N, 1) replicated gate mask;
    ln affine explicit (unfolded, see tp_masked_attention_partial);
    w1: (D, Ml) column slice; b1: (1, Ml) column slice; w2: (Ml, D) row
    slice. Returns fp32 (B, N, D) partials — callers psum, then
    ``psum + b2 + x`` (no output mask, reference semantics).
    """
    b, n, d = x.shape
    ml = w1.shape[-1]
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tp_masked_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        grid=(b // mi,),
        in_specs=[io, iom, full((1, d)), full((1, d)), full((d, ml)),
                  full((1, ml)), full((ml, d))],
        out_specs=io,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * d * ml,
            bytes_accessed=(b * n * d * (x.dtype.itemsize + 4)
                            + 2 * d * ml * x.dtype.itemsize),
            transcendentals=b * n * ml,
        ),
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w1,
      b1.reshape(1, ml), w2)


def _tp_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, o_ref, *, eps: float):
    """Partial MLP sublayer: norm(x) @ w1_local -> gelu -> @ w2_local.
    fp32 partials, no bias/residual (post-psum)."""
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    ln = _norm_rows(x.astype(jnp.float32), eps).astype(x.dtype)
    h = jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    partial = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = partial.reshape(mi, n, d)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def tp_mlp_partial(x, w1, b1, w2, eps: float = 1e-5,
                   interpret: bool = False,
                   images_per_cell: int = 1) -> jax.Array:
    """Partial Megatron MLP sublayer on one shard.

    x: (B, N, D) replicated tokens; w1: (D, Ml) folded-LN column slice;
    b1: (1, Ml); w2: (Ml, D) row slice. Returns fp32 (B, N, D) partials.
    """
    b, n, d = x.shape
    ml = w1.shape[-1]
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tp_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        grid=(b // mi,),
        in_specs=[io, full((d, ml)), full((1, ml)), full((ml, d))],
        out_specs=io,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * d * ml,
            bytes_accessed=(b * n * d * (x.dtype.itemsize + 4)
                            + 2 * d * ml * x.dtype.itemsize),
            transcendentals=b * n * ml,
        ),
        interpret=interpret,
    )(x, w1, b1, w2)
