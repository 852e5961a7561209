"""int8 (w8a8) fused transformer blocks for the v5e MXU.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured 1.94x
in-kernel). These kernels mirror ops/pallas/fused_attention's fused blocks
with every weight matmul (qkv, out-proj, fc1, fc2) in int8:

- weights: symmetric per-output-channel int8, quantized once on the host
  (``quantize_linear``);
- activations: symmetric per-token int8, quantized dynamically inside the
  kernel (one abs-max per row, VPU-cheap);
- accumulation in int32, dequantized with s_act[:, None] * s_w[None, :];
- attention scores / softmax / LN / gelu stay in fp32-on-VPU exactly like
  the bf16 kernels.

Quantization noise is the standard w8a8 tradeoff (see PAPERS.md ViT
quantization survey); the bf16 kernels remain the default engine path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from peekvit_tpu.ops.pallas.fused_attention import (_attn_scores_pv,
                                                    _safe_images_per_cell)


def quantize_linear(w: jax.Array):
    """(in, out) weights -> (int8 weights, (1, out) fp32 scales)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _quant_rows(x: jax.Array, cap=None):
    """fp (rows, d) -> (int8 rows, fp32 scales).

    ``cap=None``: dynamic symmetric per-row quantization (one abs-max per
    row). ``cap=<float or traced scalar>``: STATIC calibrated quantization
    — scale is cap/127 and activations saturate at the cap (percentile
    calibration clips outliers instead of letting them inflate the scale);
    also skips the per-row abs-max VPU pass. A python-float cap constant-
    folds at compile time; the one-call encoder feeds per-layer caps from
    a VMEM block (traced scalars), same math."""
    xf = x.astype(jnp.float32)
    if cap is not None:
        s = jnp.maximum(jnp.asarray(cap, jnp.float32), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return xq, s
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def _qmatmul(xq, sx, wq_ref, sw_ref):
    """int8 x int8 -> fp32 with per-row x per-column dequant."""
    acc = jax.lax.dot_general(
        xq, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw_ref[...].astype(jnp.float32)


def _ln_f32(x, scale_ref, bias_ref, eps):
    # one-pass statistics (var = E[x^2] - mu^2), same treatment as the
    # bf16 merged kernels (fused_attention._norm_rows: ~0.04 ms/layer on
    # v5e per int8_ablation.json static -> static_1p; cancellation risk
    # negligible for transformer residual streams, parity pinned at ViT-B
    # scale incl. the outlier fixture)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return out * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(
        jnp.float32
    )


def _quant_linear_xla(x, wq, sw, b, cap=None):
    """XLA w8a8 linear: per-row dynamic act quant (or STATIC calibrated
    quant when ``cap`` is given — same semantics as the in-kernel path),
    int8 dot -> int32, dequant. Same math as _quant_rows + _qmatmul; used
    as the fallback when weights exceed the Pallas VMEM budget (ViT-L/H
    scale)."""
    xq, sx = _quant_rows(x, cap)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw.astype(jnp.float32) + b.astype(
        jnp.float32)


def quant_attention_block_xla(x, ln_scale, ln_bias, wqkv_q, sqkv, b_qkv,
                              wo_q, so, b_out, num_heads: int,
                              eps: float = 1e-5, mask=None, caps=None):
    """XLA fallback for quant_attention_block (+ masked variant when
    ``mask`` is given): x + [mask *] OutProj(MHSA([mask *] LN(x))).
    ``caps``: optional (ln_cap, attn_cap) static calibration pair — the
    same pair quant_attention_block takes, so a calibrated engine stays
    calibrated when the VMEM guard routes a layer here (ADVICE r2)."""
    from peekvit_tpu.ops.attention import attention_core

    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    ln = _ln_f32(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), eps)
    if mask is not None:
        ln = ln * mask.astype(jnp.float32)
    qkv = _quant_linear_xla(ln, wqkv_q, sqkv, b_qkv,
                            caps[0] if caps else None).astype(jnp.bfloat16)
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    attn = attention_core(q, k, v, num_heads)
    out = _quant_linear_xla(attn, wo_q, so, b_out, caps[1] if caps else None)
    if mask is not None:
        out = out * mask.astype(jnp.float32)
    return (out + xf).astype(x.dtype)


def quant_mlp_block_xla(x, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2, b2,
                        eps: float = 1e-5, mask=None, caps=None):
    """XLA fallback for quant_mlp_block (+ masked variant). ``caps``:
    optional (ln_cap, gelu_cap) static calibration pair (ADVICE r2)."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    ln = _ln_f32(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), eps)
    if mask is not None:
        ln = ln * mask.astype(jnp.float32)
    h = jax.nn.gelu(_quant_linear_xla(ln, w1_q, s1, b1,
                                      caps[0] if caps else None))
    out = _quant_linear_xla(h, w2_q, s2, b2, caps[1] if caps else None)
    return (out + xf).astype(x.dtype)


def _q_attn_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                   wo_ref, so_ref, bo_ref, o_ref, *, num_heads: int,
                   eps: float, caps=None):
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    xf = x.astype(jnp.float32)

    ln = _ln_f32(x, lns_ref, lnb_ref, eps)
    lq, ls = _quant_rows(ln, caps[0] if caps else None)
    qkv = _qmatmul(lq, ls, wqkv_ref, sqkv_ref) + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv.astype(jnp.bfloat16)

    attn_cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            outs.append(
                _attn_scores_pv(qj, kj, vj, scale).astype(jnp.bfloat16))
        attn_cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(attn_cols, axis=-1)

    aq, as_ = _quant_rows(attn, caps[1] if caps else None)
    out = _qmatmul(aq, as_, wo_ref, so_ref) + bo_ref[0].astype(jnp.float32) + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


def _q_mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                  w2_ref, s2_ref, b2_ref, o_ref, *, eps: float, caps=None):
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    xf = x.astype(jnp.float32)
    ln = _ln_f32(x, lns_ref, lnb_ref, eps)
    lq, ls = _quant_rows(ln, caps[0] if caps else None)
    h = _qmatmul(lq, ls, w1_ref, s1_ref) + b1_ref[0].astype(jnp.float32)
    h = jax.nn.gelu(h)
    hq, hs = _quant_rows(h, caps[1] if caps else None)
    out = _qmatmul(hq, hs, w2_ref, s2_ref) + b2_ref[0].astype(jnp.float32) + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


def _specs(mi, n, d, weight_shapes):
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return io, [full(s) for s in weight_shapes]


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12, 13))
def quant_attention_block(x, ln_scale, ln_bias, wqkv_q, sqkv, b_qkv,
                          wo_q, so, b_out, num_heads: int, eps: float = 1e-5,
                          interpret: bool = False, images_per_cell: int = 2,
                          caps=None):
    """int8 x + OutProj(MHSA(LN(x))). Weight args from quantize_linear."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    io, (w_lns, w_lnb, w_qkv, w_sqkv, w_bqkv, w_o, w_so, w_bo) = _specs(
        mi, n, d,
        [(1, d), (1, d), (d, 3 * d), (1, 3 * d), (1, 3 * d),
         (d, d), (1, d), (1, d)],
    )
    return pl.pallas_call(
        functools.partial(_q_attn_kernel, num_heads=num_heads, eps=eps,
                          caps=caps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io, w_lns, w_lnb, w_qkv, w_sqkv, w_bqkv, w_o, w_so, w_bo],
        out_specs=io,
        interpret=interpret,
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), wqkv_q, sqkv,
      b_qkv.reshape(1, 3 * d), wo_q, so, b_out.reshape(1, d))


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12))
def quant_mlp_block(x, ln_scale, ln_bias, w1_q, s1, b1, w2_q, s2, b2,
                    eps: float = 1e-5, interpret: bool = False,
                    images_per_cell: int = 2, caps=None):
    """int8 x + MLP(LN(x)). Weight args from quantize_linear."""
    b, n, d = x.shape
    m = w1_q.shape[-1]
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    io, (w_lns, w_lnb, w_1, w_s1, w_b1, w_2, w_s2, w_b2) = _specs(
        mi, n, d,
        [(1, d), (1, d), (d, m), (1, m), (1, m), (m, d), (1, d), (1, d)],
    )
    return pl.pallas_call(
        functools.partial(_q_mlp_kernel, eps=eps, caps=caps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io, w_lns, w_lnb, w_1, w_s1, w_b1, w_2, w_s2, w_b2],
        out_specs=io,
        interpret=interpret,
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w1_q, s1,
      b1.reshape(1, m), w2_q, s2, b2.reshape(1, d))


def _q_masked_attn_kernel(x_ref, m_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref,
                          bqkv_ref, wo_ref, so_ref, bo_ref, o_ref,
                          *, num_heads: int, eps: float, caps=None):
    """int8 ResidualViT attention sublayer:
    out = x + mask * OutProj(MHSA(mask * LN(x)))."""
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    xf = x.astype(jnp.float32)

    ln = _ln_f32(x, lns_ref, lnb_ref, eps) * mask
    lq, ls = _quant_rows(ln, caps[0] if caps else None)
    qkv = _qmatmul(lq, ls, wqkv_ref, sqkv_ref) + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv.astype(jnp.bfloat16)

    attn_cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            outs.append(
                _attn_scores_pv(qj, kj, vj, scale).astype(jnp.bfloat16))
        attn_cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(attn_cols, axis=-1)

    aq, as_ = _quant_rows(attn, caps[1] if caps else None)
    proj = _qmatmul(aq, as_, wo_ref, so_ref) + bo_ref[0].astype(jnp.float32)
    out = proj * mask + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


def _q_masked_mlp_kernel(x_ref, m_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
                         b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *, eps: float,
                         caps=None):
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    ln = _ln_f32(x, lns_ref, lnb_ref, eps) * mask
    lq, ls = _quant_rows(ln, caps[0] if caps else None)
    h = _qmatmul(lq, ls, w1_ref, s1_ref) + b1_ref[0].astype(jnp.float32)
    h = jax.nn.gelu(h)
    hq, hs = _quant_rows(h, caps[1] if caps else None)
    out = _qmatmul(hq, hs, w2_ref, s2_ref) + b2_ref[0].astype(jnp.float32) + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13, 14))
def quant_masked_attention_block(x, mask, ln_scale, ln_bias, wqkv_q, sqkv,
                                 b_qkv, wo_q, so, b_out, num_heads: int,
                                 eps: float = 1e-6, interpret: bool = False,
                                 images_per_cell: int = 2, caps=None):
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    io, (w_lns, w_lnb, w_qkv, w_sqkv, w_bqkv, w_o, w_so, w_bo) = _specs(
        mi, n, d,
        [(1, d), (1, d), (d, 3 * d), (1, 3 * d), (1, 3 * d),
         (d, d), (1, d), (1, d)],
    )
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_q_masked_attn_kernel, num_heads=num_heads, eps=eps,
                          caps=caps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io, iom, w_lns, w_lnb, w_qkv, w_sqkv, w_bqkv, w_o, w_so,
                  w_bo],
        out_specs=io,
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, d), ln_bias.reshape(1, d), wqkv_q, sqkv,
      b_qkv.reshape(1, 3 * d), wo_q, so, b_out.reshape(1, d))


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13))
def quant_masked_mlp_block(x, mask, ln_scale, ln_bias, w1_q, s1, b1, w2_q,
                           s2, b2, eps: float = 1e-6,
                           interpret: bool = False, images_per_cell: int = 2,
                           caps=None):
    b, n, d = x.shape
    m = w1_q.shape[-1]
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    io, (w_lns, w_lnb, w_1, w_s1, w_b1, w_2, w_s2, w_b2) = _specs(
        mi, n, d,
        [(1, d), (1, d), (d, m), (1, m), (1, m), (m, d), (1, d), (1, d)],
    )
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_q_masked_mlp_kernel, eps=eps, caps=caps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io, iom, w_lns, w_lnb, w_1, w_s1, w_b1, w_2, w_s2, w_b2],
        out_specs=io,
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w1_q, s1,
      b1.reshape(1, m), w2_q, s2, b2.reshape(1, d))


# ------------------------------------------- merged per-layer int8 kernels
#
# Same round-3 treatment as the bf16 merged kernels
# (ops/pallas/fused_attention.py): one kernel per LAYER kills the (B, N, D)
# HBM round trip between the attn and MLP sublayers, the fp32 residual
# stays in VMEM, and all int8 weights (~7 MB at ViT-B) stay resident under
# the raised scoped-vmem limit.

_Q_MERGED_VMEM_LIMIT = 100 * 1024 * 1024


def _q_layer_kernel(x_ref, *refs, num_heads: int, eps: float, caps=None,
                    mode: str = "plain"):
    """Merged int8 layer. ``mode``: 'plain', 'masked' (ResidualViT mask*LN),
    or 'keymasked' (padded-RankViT key exclusion in attention)."""
    if mode != "plain":
        (m_ref, lns1, lnb1, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref,
         bo_ref, lns2, lnb2, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
         o_ref) = refs
    else:
        m_ref = None
        (lns1, lnb1, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
         lns2, lnb2, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
         o_ref) = refs
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    xf = x.astype(jnp.float32)
    mask = kmask = None
    if mode == "masked":
        mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    elif mode == "keymasked":
        kmask = m_ref[...].reshape(mi, n)
    acaps = caps[0] if caps else None
    mcaps = caps[1] if caps else None

    ln = _ln_f32(x, lns1, lnb1, eps)
    if mask is not None:
        ln = ln * mask
    lq, ls = _quant_rows(ln, acaps[0] if acaps else None)
    qkv = _qmatmul(lq, ls, wqkv_ref, sqkv_ref) + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv.astype(jnp.bfloat16)

    attn_cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            km = kmask[j] if kmask is not None else None
            outs.append(
                _attn_scores_pv(qj, kj, vj, scale, kmask=km).astype(
                    jnp.bfloat16))
        attn_cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(attn_cols, axis=-1)

    aq, as_ = _quant_rows(attn, acaps[1] if acaps else None)
    proj = _qmatmul(aq, as_, wo_ref, so_ref) + bo_ref[0].astype(jnp.float32)
    if mask is not None:
        proj = proj * mask
    y = proj + xf  # fp32 residual stays in VMEM

    ln2 = _ln_f32(y, lns2, lnb2, eps)
    if mask is not None:
        ln2 = ln2 * mask
    lq2, ls2 = _quant_rows(ln2, mcaps[0] if mcaps else None)
    h2 = _qmatmul(lq2, ls2, w1_ref, s1_ref) + b1_ref[0].astype(jnp.float32)
    h2 = jax.nn.gelu(h2)
    hq, hs = _quant_rows(h2, mcaps[1] if mcaps else None)
    out2 = _qmatmul(hq, hs, w2_ref, s2_ref) + b2_ref[0].astype(jnp.float32) + y
    o_ref[...] = out2.reshape(mi, n, d).astype(o_ref.dtype)


def _q_layer_call(x, extra, weights, num_heads, eps, caps, mode,
                  interpret, mi):
    b, n, d = x.shape
    m = weights[10].shape[-1]  # w1_q
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspecs = [full((1, d)), full((1, d)), full((d, 3 * d)), full((1, 3 * d)),
              full((1, 3 * d)), full((d, d)), full((1, d)), full((1, d)),
              full((1, d)), full((1, d)), full((d, m)), full((1, m)),
              full((1, m)), full((m, d)), full((1, d)), full((1, d))]
    extras = []
    if mode == "masked":
        extras = [pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
    elif mode == "keymasked":
        extras = [pl.BlockSpec((mi, 1, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
    args = (x,) + ((extra,) if mode != "plain" else ()) + tuple(weights)
    return pl.pallas_call(
        functools.partial(_q_layer_kernel, num_heads=num_heads, eps=eps,
                          caps=caps, mode=mode),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io] + extras + wspecs,
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_Q_MERGED_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def _q_pack(ln1s, ln1b, wqkv_q, sqkv, b_qkv, wo_q, so, b_out,
            ln2s, ln2b, w1_q, s1, b1, w2_q, s2, b2, d, m):
    return (ln1s.reshape(1, d), ln1b.reshape(1, d), wqkv_q, sqkv,
            b_qkv.reshape(1, 3 * d), wo_q, so, b_out.reshape(1, d),
            ln2s.reshape(1, d), ln2b.reshape(1, d), w1_q, s1,
            b1.reshape(1, m), w2_q, s2, b2.reshape(1, d))


@functools.partial(jax.jit, static_argnums=(17, 18, 19, 20, 21))
def quant_layer_block(x, ln1s, ln1b, wqkv_q, sqkv, b_qkv, wo_q, so, b_out,
                      ln2s, ln2b, w1_q, s1, b1, w2_q, s2, b2,
                      num_heads: int, eps: float = 1e-5,
                      interpret: bool = False, images_per_cell: int = 1,
                      caps=None):
    """Merged int8 transformer layer (attn + MLP in one kernel)."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    w = _q_pack(ln1s, ln1b, wqkv_q, sqkv, b_qkv, wo_q, so, b_out,
                ln2s, ln2b, w1_q, s1, b1, w2_q, s2, b2, d, w1_q.shape[-1])
    return _q_layer_call(x, None, w, num_heads, eps, caps, "plain",
                         interpret, mi)


@functools.partial(jax.jit, static_argnums=(18, 19, 20, 21, 22))
def quant_masked_layer_block(x, mask, ln1s, ln1b, wqkv_q, sqkv, b_qkv, wo_q,
                             so, b_out, ln2s, ln2b, w1_q, s1, b1, w2_q, s2,
                             b2, num_heads: int, eps: float = 1e-6,
                             interpret: bool = False,
                             images_per_cell: int = 1, caps=None):
    """Merged int8 ResidualViT layer (mask * LN on both sublayers, masked
    attention output). mask: (B, N, 1)."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    w = _q_pack(ln1s, ln1b, wqkv_q, sqkv, b_qkv, wo_q, so, b_out,
                ln2s, ln2b, w1_q, s1, b1, w2_q, s2, b2, d, w1_q.shape[-1])
    return _q_layer_call(x, mask, w, num_heads, eps, caps, "masked",
                         interpret, mi)


@functools.partial(jax.jit, static_argnums=(18, 19, 20, 21, 22))
def quant_keymasked_layer_block(x, key_mask, ln1s, ln1b, wqkv_q, sqkv,
                                b_qkv, wo_q, so, b_out, ln2s, ln2b, w1_q,
                                s1, b1, w2_q, s2, b2, num_heads: int,
                                eps: float = 1e-5, interpret: bool = False,
                                images_per_cell: int = 1, caps=None):
    """Merged int8 layer with TRUE key exclusion (padded-RankViT
    semantics). key_mask: (B, 1, N), 1 = attend, 0 = exclude."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    w = _q_pack(ln1s, ln1b, wqkv_q, sqkv, b_qkv, wo_q, so, b_out,
                ln2s, ln2b, w1_q, s1, b1, w2_q, s2, b2, d, w1_q.shape[-1])
    return _q_layer_call(x, key_mask, w, num_heads, eps, caps, "keymasked",
                         interpret, mi)
