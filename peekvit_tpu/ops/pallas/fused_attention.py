"""Fused multi-head attention Pallas kernel for ViT-scale sequences.

ViT sequences are short (197 at 224/16, 401 at 160/8 + specials), so the
whole (N, N) score matrix for one (batch, head) fits comfortably in VMEM —
the right kernel shape is NOT flash-attention's streaming softmax but a
single fused QK^T -> softmax -> PV per (batch, head) grid cell:

- zero HBM traffic for the score matrix (XLA materializes softmax inputs
  at fp32 between fusions; here scores never leave VMEM),
- both matmuls hit the MXU at (N_pad, head_dim) x (head_dim, N_pad) and
  (N_pad, N_pad) x (N_pad, head_dim) with lane-aligned padding,
- padded key positions are masked with -inf before the softmax, so numerics
  match ops.attention.attention_core exactly (parity-tested).

Grid: (B, H). Block: full (N_pad, head_dim) slices of q/k/v.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _safe_images_per_cell(mi: int, b: int, n: int, d: int) -> int:
    """Mosaic cannot retile the in-kernel (mi, n, d) -> (mi*n, d) reshape
    when n is not sublane-aligned AND d is lane-padded (measured: n%8 != 0
    and d%128 != 0 fails; either alignment alone is fine)."""
    if n % 8 and d % 128:
        mi = 1
    while b % mi:
        mi //= 2
    return max(mi, 1)


LOG2E = 1.4426950408889634  # exp(x) = exp2(x * LOG2E)


def _attn_scores_pv(qj, kj, vj, scale, kmask=None, kweight=None):
    """softmax(q k^T * scale) @ v with the inference-only fast softmax:

    - ``scale * LOG2E`` is folded into q, so the VPU never sweeps the (N, N)
      scores with a multiply and the transcendental is ``exp2`` (what the
      hardware computes anyway — folding removes exp's internal rescale);
    - ``e = exp2(...)`` runs in the INPUT dtype (bf16 on the serving path:
      2x VPU transcendental rate; fp32 when the caller computes in fp32);
    - normalization is DEFERRED past the PV matmul: (e @ v) * 1/rowsum(e)
      replaces the (N, N) divide with an (N, hd) multiply. Mathematically
      identical to softmax (no max-subtraction; clamp bounds as above,
      [-80, 115] in log2 units, lower bound keeps rowsum > 0).

    Measured on v5e at ViT-B shapes: 2.07 -> 1.87 ms/layer (bs 256).

    ``kmask`` (optional, (n_k,) in {0, 1}) excludes keys exactly like the
    additive -inf masking in ops.attention.attention_core: excluded keys'
    exp terms are zeroed before the rowsum and PV matmul.

    ``kweight`` (optional, (1, n_k)) multiplies each key's exp term —
    a key with weight M contributes exactly like M identical copies of
    itself (numerator AND denominator scale together through the
    ones-column fold). The token-compaction engine uses it to stand one
    PHANTOM zero-token in for the (N - capacity) dropped gated-off
    tokens: every mask-0 token's key/value is the pure qkv BIAS
    (mask*LN zeroes its projection input), identical across tokens, so
    count * one-term is exact (inference.residualvit_forward_fused).
    """
    qj = (qj.astype(jnp.float32) * (scale * LOG2E)).astype(qj.dtype)
    logits = jax.lax.dot_general(
        qj, kj, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e = jnp.exp2(jnp.clip(logits, -80.0, 115.0).astype(qj.dtype))
    if kmask is not None:
        # Excluded key rows may hold padded garbage (the padded RankViT
        # engines never re-zero dropped rows after the last rank layer): a
        # NaN/Inf anywhere in an excluded row's k or v would poison every
        # query through the ones column / PV matmul (0 * NaN = NaN), so
        # exclusion must SELECT — not multiply — e to zero (ADVICE r3;
        # x * 0 keeps NaN). The predicate computes in f32: Mosaic has no
        # bf16 cmpf on v5e ("Target does not support this comparison").
        keep = kmask[None, :].astype(jnp.float32) > 0.0
        e = jnp.where(keep, e, jnp.zeros((), e.dtype))
        # vj must also be scrubbed of non-finite values: even a selected
        # zero in e cannot save the PV accumulator from 0 * NaN. Scrubbing
        # is elementwise (x*0 == 0 iff x is finite) because the row-masked
        # form ``where(kmask[:, None] > 0, vj, 0)`` needs a lane->sublane
        # kmask reshape Mosaic cannot lower at unaligned n (measured:
        # "tpu.reshape (1,1,99) -> (99,1)" compile error on v5e).
        vz = (vj * jnp.zeros((), vj.dtype)).astype(jnp.float32)
        vj = jnp.where(vz == 0.0, vj, jnp.zeros((), vj.dtype))
    if kweight is not None:
        e = e * kweight.astype(e.dtype)
    # rowsum folded into the PV matmul as a ones-column on v: at head_dim
    # 64 the MXU tile is 128 lanes wide anyway, so the extra column is
    # free and the (N, N) VPU reduction disappears (accumulated in the
    # matmul's fp32 accumulator, same precision as the explicit sum).
    # The ones column derives from vj (vj*0+1) so it inherits vj's vector
    # layout — a fresh jnp.ones gets offset (0, _) and Mosaic rejects the
    # concat when vj is a row slice with a non-zero sublane offset
    # (mi > 1 image cells: "offset mismatch on non-concat dimension").
    ones = vj[:, :1] * jnp.zeros((), vj.dtype) + jnp.ones((), vj.dtype)
    pv_ext = jax.lax.dot_general(
        e, jnp.concatenate([vj, ones], axis=-1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = pv_ext[:, -1:]
    return pv_ext[:, :-1] * (1.0 / s)


def _mhsa_kernel(qkv_ref, o_ref, *, num_heads: int, scale: float):
    """All heads of one image per grid cell, sliced from packed qkv.

    qkv_ref: (1, N, 3D) VMEM block. Head h's q/k/v live at lane offsets
    [h*hd, D + h*hd, 2D + h*hd] — static slices, so no transpose ever
    touches HBM and the (N, N) score matrix lives only in VMEM/registers.
    """
    three_d = qkv_ref.shape[-1]
    d = three_d // 3
    hd = d // num_heads
    qkv = qkv_ref[0]
    for h in range(num_heads):  # static unroll
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        out = _attn_scores_pv(q, k, v, scale)
        o_ref[0, :, h * hd:(h + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fused_mhsa(qkv: jax.Array, num_heads: int, interpret: bool = False):
    """Fused attention over packed qkv (B, N, 3D) -> (B, N, D).

    Grid = (B,): one cell per image, all heads inside — few, fat grid cells
    (3072 tiny (b,h) cells cost ~3us each in grid overhead, dominating the
    85ns of per-cell compute; 256 one-per-image cells amortize it).
    """
    b, n, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    in_spec = pl.BlockSpec((1, n, three_d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mhsa_kernel, num_heads=num_heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        grid=(b,),
        in_specs=[in_spec],
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * n * n * hd,
            bytes_accessed=b * n * (three_d + d) * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=interpret,
    )(qkv)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0]  # (N_pad, hd)
    k = k_ref[0]
    v = v_ref[0]
    logits = (
        jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    n_pad = logits.shape[-1]
    if n_valid < n_pad:  # mask padded keys (static shapes -> constant mask)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
        logits = jnp.where(col < n_valid, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    num_heads: int, interpret: bool = False) -> jax.Array:
    """Drop-in for attention_core(q, k, v, num_heads) without masks/dropout.

    q/k/v: (B, N, D) with D = num_heads * head_dim. Returns (B, N, D).
    ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    b, n, d = q.shape
    head_dim = d // num_heads
    scale = 1.0 / (head_dim ** 0.5)

    # (B, N, D) -> (B*H, N_pad, hd_pad)
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = _round_up(n, max(sublane, 128))
    hd_pad = _round_up(head_dim, 128)

    def split_heads(x):
        x = x.reshape(b, n, num_heads, head_dim).transpose(0, 2, 1, 3)
        x = x.reshape(b * num_heads, n, head_dim)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, hd_pad - head_dim)))

    qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)

    grid = (b * num_heads,)
    spec = pl.BlockSpec((1, n_pad, hd_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=n),
        out_shape=jax.ShapeDtypeStruct((b * num_heads, n_pad, hd_pad), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * n_pad * n_pad * hd_pad,
            bytes_accessed=4 * b * num_heads * n_pad * hd_pad * 4,
            transcendentals=b * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qh, kh, vh)

    out = out[:, :n, :head_dim].reshape(b, num_heads, n, head_dim)
    return out.transpose(0, 2, 1, 3).reshape(b, n, d)


def _attn_block_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wo_ref,
                       bo_ref, o_ref, *, num_heads: int, eps: float):
    """Full pre-LN attention sublayer for ``mi`` images per grid cell:
    out = x + OutProj(MHSA(LN(x))). Weights use constant index maps, so the
    pipeline DMAs them into VMEM once and reuses them across the batch grid.

    LN / qkv / out-proj are token-wise, so the mi images' tokens are
    processed as one (mi*N, D) matmul (bigger MXU tiles + amortized grid
    overhead); only the per-head score matmuls loop per image.
    """
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)

    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    attn_cols = []
    for h in range(num_heads):  # static unroll
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):  # per-image scores (no cross-image attention)
            qj = q[j * n:(j + 1) * n]
            kj = k[j * n:(j + 1) * n]
            vj = v[j * n:(j + 1) * n]
            outs.append(_attn_scores_pv(qj, kj, vj, scale).astype(x.dtype))
        attn_cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(attn_cols, axis=-1)  # (mi*N, D)

    out = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    out = out + bo_ref[0].astype(jnp.float32) + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def fused_attention_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                          num_heads: int, eps: float = 1e-5,
                          interpret: bool = False, images_per_cell: int = 2):
    """x + OutProj(MHSA(LN(x))) fused end to end. x: (B, N, D)."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — weights: load once
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    row = lambda size: full((1, size))  # noqa: E731

    hd = d // num_heads
    return pl.pallas_call(
        functools.partial(_attn_block_kernel, num_heads=num_heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[
            pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row(d), row(d),
            full((d, 3 * d)), row(3 * d),
            full((d, d)), row(d),
        ],
        out_specs=pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (4 * d * d + 2 * n * d),
            bytes_accessed=(2 * b * n * d + 4 * d * d) * x.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=interpret,
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d))


def _mlp_block_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, *, eps: float):
    """Fused pre-LN MLP sublayer for one image: out = x + fc2(gelu(fc1(LN(x)))).
    The (N, mlp_dim) hidden activation never leaves VMEM (XLA writes it to
    HBM between the fc1 and fc2 fusions: ~0.5 GB/layer at ViT-B bs256).

    gelu here is the tanh approximation: Mosaic has no erf/erfc lowering,
    so the exact-erf form the linen MLP uses (ops/mlp.py) is unavailable
    in-kernel. Max relative deviation of tanh-gelu is ~1e-3 — inside every
    engine parity tolerance; documented rather than silent."""
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    h = jnp.dot(ln.astype(x.dtype), w1_ref[...],
                preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32) + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def fused_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2,
                    eps: float = 1e-5, interpret: bool = False,
                    images_per_cell: int = 2):
    """x + MLP(LN(x)) fused end to end. x: (B, N, D)."""
    b, n, d = x.shape
    m = w1.shape[-1]
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_block_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[
            pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, d)), full((1, d)),
            full((d, m)), full((1, m)),
            full((m, d)), full((1, d)),
        ],
        out_specs=pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * d * m,
            bytes_accessed=(2 * b * n * d + 2 * d * m) * x.dtype.itemsize,
            transcendentals=b * n * m,
        ),
        interpret=interpret,
    )(x, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w1,
      b1.reshape(1, m), w2, b2.reshape(1, d))


# ------------------------------------------- masked (gated) block variants


def _masked_attn_kernel(x_ref, m_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                        wo_ref, bo_ref, o_ref, *, num_heads: int, eps: float,
                        phantom_mult: float = 0.0, phantom_idx: int = -1):
    """ResidualViT attention sublayer:
    out = x + mask * OutProj(MHSA(mask * LN(x))) — the attention OUTPUT is
    masked too (reference residualvit.py:249-260 plain_forward).
    phantom_mult/idx: the compaction engine's phantom-slot key weight."""
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = (ln * mask).astype(x.dtype)

    kweight = None
    if phantom_mult > 0.0:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        kweight = jnp.where(lane == phantom_idx,
                            jnp.float32(phantom_mult), 1.0)

    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            outs.append(_attn_scores_pv(qj, kj, vj, scale,
                                        kweight=kweight).astype(x.dtype))
        cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(cols, axis=-1)
    out = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    out = (out + bo_ref[0].astype(jnp.float32)) * mask + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


def _masked_mlp_kernel(x_ref, m_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                       w2_ref, b2_ref, o_ref, *, eps: float):
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = ln * mask
    h = jnp.dot(ln.astype(x.dtype), w1_ref[...],
                preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32) + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13))
def masked_attention_block(x, mask, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                           b_out, num_heads: int, eps: float = 1e-6,
                           interpret: bool = False, images_per_cell: int = 2,
                           phantom_mult: float = 0.0, phantom_idx: int = -1):
    """x + OutProj(MHSA(mask * LN(x))); mask: (B, N, 1)."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_masked_attn_kernel, num_heads=num_heads, eps=eps,
                          phantom_mult=float(phantom_mult),
                          phantom_idx=int(phantom_idx)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io, iom, full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d)), full((1, d))],
        out_specs=io,
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d))


@functools.partial(jax.jit, static_argnums=(8, 9, 10))
def masked_mlp_block(x, mask, ln_scale, ln_bias, w1, b1, w2, b2,
                     eps: float = 1e-6, interpret: bool = False,
                     images_per_cell: int = 2):
    """x + MLP(mask * LN(x)); mask: (B, N, 1)."""
    b, n, d = x.shape
    m = w1.shape[-1]
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_masked_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io, iom, full((1, d)), full((1, d)), full((d, m)),
                  full((1, m)), full((m, d)), full((1, d))],
        out_specs=io,
        interpret=interpret,
    )(x, mask, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w1,
      b1.reshape(1, m), w2, b2.reshape(1, d))


# --------------------------------------- key-masked (padded RankViT) variant


def _keymasked_attn_kernel(x_ref, km_ref, lns_ref, lnb_ref, wqkv_ref,
                           bqkv_ref, wo_ref, bo_ref, o_ref,
                           *, num_heads: int, eps: float):
    """Attention sublayer with TRUE key exclusion (RankViT semantics,
    reference rankvit.py:24-101 via torch key_padding_mask): keys with
    km == 0 get zero softmax weight for every query. km_ref: (mi, 1, n)."""
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    km = km_ref[...].reshape(mi, n)

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)

    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    attn_cols = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            outs.append(
                _attn_scores_pv(qj, kj, vj, scale, kmask=km[j]).astype(x.dtype)
            )
        attn_cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(attn_cols, axis=-1)

    out = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    out = out + bo_ref[0].astype(jnp.float32) + xf
    o_ref[...] = out.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11))
def keymasked_attention_block(x, key_mask, ln_scale, ln_bias, w_qkv, b_qkv,
                              w_out, b_out, num_heads: int, eps: float = 1e-5,
                              interpret: bool = False,
                              images_per_cell: int = 2):
    """x + OutProj(MHSA(LN(x))) with key exclusion. key_mask: (B, 1, N),
    1 = attend, 0 = exclude (matches attention_core's additive -inf)."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iok = pl.BlockSpec((mi, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_keymasked_attn_kernel, num_heads=num_heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=[io, iok, full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d)), full((1, d))],
        out_specs=io,
        interpret=interpret,
    )(x, key_mask, ln_scale.reshape(1, d), ln_bias.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d))


# ------------------------------------------- merged per-layer kernels
#
# Round-3 perf finding: the two-kernel split (attention sublayer + MLP
# sublayer) pays a full (B, N, D) HBM round trip of tokens between the
# sublayers. One kernel per LAYER removes it, and the inter-sublayer
# residual stays in fp32 VMEM (the split path rounds it through bf16 HBM).
# All weights (4d^2 + 2dm) stay VMEM-resident: the round-2 "11 MB" budget
# was Mosaic's default scoped-vmem limit, not hardware — v5e has 128 MB of
# VMEM, unlocked via CompilerParams(vmem_limit_bytes). Measured v5e,
# ViT-B/16 bs256: 5.09 -> 4.41 ms/layer (same-process A/B, fori_loop
# timing). images_per_cell=1 and one layer per kernel are the measured
# optima (mi=2/4 and 2/4/6-layer fusion are flat or worse).

_MERGED_VMEM_LIMIT = 100 * 1024 * 1024
# one-call mi=2 clamp threshold (see encoder_layers_one_call)
_ONE_CALL_WORKSET_LIMIT = 64 * 1024 * 1024


def _ln_f32_rows(xf, s_ref, b_ref, eps):
    out = _norm_rows(xf, eps)
    return out * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)


def _norm_rows(xf, eps):
    """Row-normalize with ONE-PASS statistics: var = E[x^2] - mu^2 sweeps
    the row once instead of twice (measured ~0.05 ms/layer on v5e).
    Cancellation risk (large mu, tiny var) is negligible for transformer
    residual streams — outlier channels inflate var along with E[x^2], so
    the f32 relative error stays ~1e-5; parity vs the two-pass form is
    pinned at ViT-B scale incl. the outlier fixture
    (tests/test_full_scale.py)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(ms - mu * mu, 0.0)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def fold_ln_into_weights(ln_scale, ln_bias, w, b):
    """Fold a pre-matmul LayerNorm's affine into the matmul:
    (norm(x) * s + lb) @ W + b == norm(x) @ (s[:, None] * W) + (lb @ W + b).
    Saves a full FMA sweep over the activations per LN inside the kernel
    (the per-row mean/var normalization is not foldable). Computed in f32,
    cast back to the weights' dtype. Accepts (k,) or (1, k) vectors
    (prepare_engine_params pre-shapes vectors to (1, k)) and returns the
    bias as (1, out): a computed 1-D bias would need an in-graph
    (k,) -> (1, k) reshape before the Pallas call, which is a real TPU
    relayout kernel XLA does not hoist (measured 0.114 ms/layer at ViT-B
    bs256, benchmarks/ — the round-4 bias-relayout finding)."""
    sf = ln_scale.astype(jnp.float32).reshape(-1)
    bf = ln_bias.astype(jnp.float32).reshape(1, -1)
    wf = w.astype(jnp.float32)
    w2 = (sf[:, None] * wf).astype(w.dtype)
    b2 = (bf @ wf + b.astype(jnp.float32).reshape(1, -1)).astype(b.dtype)
    return w2, b2


def _layer_kernel(x_ref, *refs, num_heads: int, eps: float, mode: str,
                  folded: bool = False, phantom_mult: float = 0.0,
                  phantom_idx: int = -1):
    """Full pre-LN transformer layer (attn sublayer + MLP sublayer) for one
    image per grid cell. ``mode``:
    - 'plain':     x + Proj(MHSA(LN1(x)));            + MLP path
    - 'masked':    ResidualViT masked-LN semantics (mask * LN, masked attn
                   output; reference residualvit.py:249-260)
    - 'keymasked': padded-RankViT true key exclusion (additive -inf keys)
    - 'avit':      A-ViT semantics (reference adavit.py:21-80 via
                   models/adavit.py AViTBlock): LN of the MASKED input,
                   result masked — ``LN(x*a)*a`` — with UNMASKED residual
                   adds (unlike ResidualViT's ``mask*LN(x)``).
    ``folded``: the LN affines are pre-folded into wqkv/bqkv and w1/b1
    (fold_ln_into_weights) — no lns/lnb refs, normalization only (not
    available for 'masked'/'avit', whose row masks do not commute with the
    folded bias term).
    """
    m_ref = None
    if folded:
        if mode == "plain":
            (wqkv_ref, bqkv_ref, wo_ref, bo_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, o_ref) = refs
        else:
            (m_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, o_ref) = refs
        lns1 = lnb1 = lns2 = lnb2 = None
    elif mode == "plain":
        (lns1, lnb1, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
         lns2, lnb2, w1_ref, b1_ref, w2_ref, b2_ref, o_ref) = refs
    else:
        (m_ref, lns1, lnb1, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
         lns2, lnb2, w1_ref, b1_ref, w2_ref, b2_ref, o_ref) = refs
    mi, n, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[...].reshape(mi * n, d)
    xf = x.astype(jnp.float32)

    mask = kmask = kweight = None
    if mode in ("masked", "avit"):
        mask = m_ref[...].reshape(mi * n, 1).astype(jnp.float32)
    elif mode == "keymasked":
        kmask = m_ref[...].reshape(mi, n)
    if phantom_mult > 0.0:
        # compaction's phantom slot: its exp term stands in for the
        # (N - capacity) dropped zero-mask tokens (identical bias
        # keys/values — see _attn_scores_pv). Static position/count, so
        # the weight vector is a compile-time iota select, no operand.
        # the phantom is an EXTRA row standing in for exactly the
        # dropped tokens, so its weight is the dropped count itself
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        kweight = jnp.where(lane == phantom_idx,
                            jnp.float32(phantom_mult), 1.0)

    if mode == "avit":  # LN(x*a)*a, unmasked residuals
        ln = _ln_f32_rows(xf * mask, lns1, lnb1, eps) * mask
    else:
        ln = (_norm_rows(xf, eps) if folded
              else _ln_f32_rows(xf, lns1, lnb1, eps))
        if mask is not None:
            ln = ln * mask
    ln = ln.astype(x.dtype)

    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    attn_cols = []
    for h in range(num_heads):  # static unroll
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        outs = []
        for j in range(mi):  # per-image scores (no cross-image attention)
            qj, kj, vj = (t[j * n:(j + 1) * n] for t in (q, k, v))
            km = kmask[j] if kmask is not None else None
            outs.append(
                _attn_scores_pv(qj, kj, vj, scale, kmask=km,
                                kweight=kweight).astype(x.dtype))
        attn_cols.append(jnp.concatenate(outs, axis=0) if mi > 1 else outs[0])
    attn = jnp.concatenate(attn_cols, axis=-1)

    out = jnp.dot(attn, wo_ref[...], preferred_element_type=jnp.float32)
    out = out + bo_ref[0].astype(jnp.float32)
    if mask is not None and mode == "masked":
        out = out * mask
    y = out + xf  # fp32 residual — never rounds through bf16 HBM

    if mode == "avit":
        ln2 = _ln_f32_rows(y * mask, lns2, lnb2, eps) * mask
    else:
        ln2 = (_norm_rows(y, eps) if folded
               else _ln_f32_rows(y, lns2, lnb2, eps))
        if mask is not None:
            ln2 = ln2 * mask
    h2 = jnp.dot(ln2.astype(x.dtype), w1_ref[...],
                 preferred_element_type=jnp.float32)
    h2 = jax.nn.gelu(h2 + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
    out2 = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
    out2 = out2 + b2_ref[0].astype(jnp.float32) + y
    o_ref[...] = out2.reshape(mi, n, d).astype(o_ref.dtype)


def _merged_call(x, extra, extra_spec, weights, num_heads, eps, mode,
                 interpret, mi, folded=False, phantom=(0.0, -1)):
    b, n, d = x.shape
    m = weights[4 if folded else 8].shape[-1]  # w1
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — weights resident
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((mi, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if folded:
        wspecs = [full((d, 3 * d)), full((1, 3 * d)), full((d, d)),
                  full((1, d)), full((d, m)), full((1, m)), full((m, d)),
                  full((1, d))]
    else:
        wspecs = [full((1, d)), full((1, d)), full((d, 3 * d)),
                  full((1, 3 * d)), full((d, d)), full((1, d)), full((1, d)),
                  full((1, d)), full((d, m)), full((1, m)), full((m, d)),
                  full((1, d))]
    in_specs = [io] + ([extra_spec] if extra is not None else []) + wspecs
    args = (x,) + ((extra,) if extra is not None else ()) + tuple(weights)
    return pl.pallas_call(
        functools.partial(_layer_kernel, num_heads=num_heads, eps=eps,
                          mode=mode, folded=folded,
                          phantom_mult=float(phantom[0]),
                          phantom_idx=int(phantom[1])),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // mi,),
        in_specs=in_specs,
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MERGED_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (4 * d * d + 2 * n * d + 2 * d * m),
            bytes_accessed=(2 * b * n * d
                            + (4 * d * d + 2 * d * m)) * x.dtype.itemsize,
            transcendentals=b * num_heads * n * n + b * n * m,
        ),
        interpret=interpret,
    )(*args)


def _pack_layer_weights(ln1s, ln1b, w_qkv, b_qkv, w_out, b_out,
                        ln2s, ln2b, w1, b1, w2, b2, d, m):
    return (ln1s.reshape(1, d), ln1b.reshape(1, d), w_qkv,
            b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d),
            ln2s.reshape(1, d), ln2b.reshape(1, d), w1, b1.reshape(1, m),
            w2, b2.reshape(1, d))


@functools.partial(jax.jit, static_argnums=(14, 15, 16, 17, 18, 19))
def masked_layer_block(x, mask, ln1s, ln1b, w_qkv, b_qkv, w_out, b_out,
                       ln2s, ln2b, w1, b1, w2, b2, num_heads: int,
                       eps: float = 1e-6, interpret: bool = False,
                       images_per_cell: int = 1,
                       phantom_mult: float = 0.0, phantom_idx: int = -1):
    """Merged ResidualViT layer (mask * LN trick on both sublayers, masked
    attention output — reference residualvit.py:249-260). mask: (B, N, 1).

    ``phantom_mult``/``phantom_idx``: the token-compaction engine's
    phantom-slot key weight (see _attn_scores_pv) — static, zero-cost
    when unused."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w = _pack_layer_weights(ln1s, ln1b, w_qkv, b_qkv, w_out, b_out,
                            ln2s, ln2b, w1, b1, w2, b2, d, w1.shape[-1])
    return _merged_call(x, mask, iom, w, num_heads, eps, "masked",
                        interpret, mi, phantom=(phantom_mult, phantom_idx))


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12))
def fused_layer_block_folded(x, w_qkv, b_qkv, w_out, b_out, w1, b1, w2, b2,
                             num_heads: int, eps: float = 1e-5,
                             interpret: bool = False,
                             images_per_cell: int = 1):
    """Merged layer with the LN affines pre-folded into wqkv/bqkv and w1/b1
    (fold_ln_into_weights): two FMA sweeps fewer per layer."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    m = w1.shape[-1]
    w = (w_qkv, b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d),
         w1, b1.reshape(1, m), w2, b2.reshape(1, d))
    return _merged_call(x, None, None, w, num_heads, eps, "plain",
                        interpret, mi, folded=True)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def encoder_layers_one_call(x, stacked, num_heads: int, eps: float = 1e-5,
                            interpret: bool = False,
                            images_per_cell: int = 2):
    """The WHOLE folded encoder stack in ONE pallas_call (round-4 A/B:
    benchmarks/encoder_one_call.py — bitwise-identical to the per-layer
    calls, 0.38 ms faster per ViT-B bs256 forward by dropping 11 dispatch/
    Mosaic-prologue rounds).

    Grid (L, B): io blocks are indexed (l, b) -> (b, 0, 0) with
    ``input_output_aliases={0: 0}``, so layer l's cell reads what layer
    l-1 wrote B grid steps earlier — far outside the pipeline's prefetch
    lookahead, no RAW hazard. Weights arrive stacked with a leading layer
    axis ((L, d, 3d), ...) and block index (l, b) -> (l, 0, 0): resident
    during each b sweep, re-fetched once per layer transition (~17 us,
    hidden under the ~4.3 ms sweep). ``stacked``: dict with keys
    wqkv/bqkv/wo/bo/w1/b1/w2/b2 (prepare_engine_params fold_ln=True builds
    it as encoder['_stacked_layers']). NOTE: donates/aliases ``x``.

    Caveats (the engine's call site guards both): needs B >= 3 so aliased
    reads trail the one-step-delayed write-back (B >= 8 enforced for
    margin; with images_per_cell=2 the one-call grid runs ~0.5 ms faster
    than mi=1 at ViT-B bs256 — unlike the per-layer calls, where mi=2 was
    a measured negative), and COMPILED mode only — the interpreter applies input/output
    aliasing once at the end, not per grid step, so layer l+1 would read
    the original input (verified: L=1 exact, L>=2 wrong under interpret).

    A further fold of the patch-embed matmul into the l=0 cells (XLA
    keeping only the padded patchify relayout) is a measured NEGATIVE:
    4800 -> 4739 img/s — the jnp.pad materialization plus the per-cell
    @pl.when(l==0) branch cost more than the concat+epilogue writes they
    replace (round-4 session 2 A/B via bench.py).
    """
    layers, d = stacked["wqkv"].shape[0], stacked["wqkv"].shape[1]
    b, n, _ = x.shape
    m = stacked["w1"].shape[-1]
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    # working-set clamp: mi=2 wins at ViT-B (-0.5 ms) but LOSES at ViT-L
    # (88.5 -> 103.8 ms for the 24-layer stack, measured) — the doubled
    # per-cell fp32 intermediates spill once weights + scratch crowd
    # VMEM. Estimate double-buffered weights + per-image fp32 scratch
    # (qkv + gelu input + attn/out rows) and fall back to mi=1 past
    # ~64 MB (ViT-B 42 MB -> mi=2; ViT-L 68 MB / ViT-H 79 MB -> mi=1).
    while mi > 1:
        weights_b = (4 * d * d + 2 * d * m) * x.dtype.itemsize * 2
        scratch_b = mi * n * (3 * d + m + 4 * d) * 4
        if weights_b + scratch_b <= _ONE_CALL_WORKSET_LIMIT:
            break
        mi //= 2
    io = pl.BlockSpec((mi, n, d), lambda l, bi: (bi, 0, 0),
                      memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda l, bi: (l,) + tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    def kernel(x_ref, wqkv, bqkv, wo, bo, w1, b1, w2, b2, o_ref):
        _layer_kernel(x_ref, wqkv[0], bqkv[0], wo[0], bo[0], w1[0], b1[0],
                      w2[0], b2[0], o_ref, num_heads=num_heads, eps=eps,
                      mode="plain", folded=True)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(layers, b // mi),
        in_specs=[io, wspec((d, 3 * d)), wspec((1, 3 * d)), wspec((d, d)),
                  wspec((1, d)), wspec((d, m)), wspec((1, m)),
                  wspec((m, d)), wspec((1, d))],
        out_specs=io,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_MERGED_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * layers * b * n * (4 * d * d + 2 * n * d + 2 * d * m),
            bytes_accessed=(2 * layers * b * n * d
                            + layers * (4 * d * d + 2 * d * m))
            * x.dtype.itemsize,
            transcendentals=layers * (b * num_heads * n * n + b * n * m),
        ),
        interpret=interpret,
    )(x, stacked["wqkv"], stacked["bqkv"], stacked["wo"], stacked["bo"],
      stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"])


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13))
def keymasked_layer_block_folded(x, key_mask, w_qkv, b_qkv, w_out, b_out,
                                 w1, b1, w2, b2, num_heads: int,
                                 eps: float = 1e-5, interpret: bool = False,
                                 images_per_cell: int = 1):
    """Key-exclusion merged layer with pre-folded LN affines (the key mask
    only gates attention scores, so folding stays exact)."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    m = w1.shape[-1]
    iok = pl.BlockSpec((mi, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w = (w_qkv, b_qkv.reshape(1, 3 * d), w_out, b_out.reshape(1, d),
         w1, b1.reshape(1, m), w2, b2.reshape(1, d))
    return _merged_call(x, key_mask, iok, w, num_heads, eps, "keymasked",
                        interpret, mi, folded=True)


@functools.partial(jax.jit, static_argnums=(14, 15, 16, 17))
def avit_layer_block(x, active, ln1s, ln1b, w_qkv, b_qkv, w_out, b_out,
                     ln2s, ln2b, w1, b1, w2, b2, num_heads: int,
                     eps: float = 1e-5, interpret: bool = False,
                     images_per_cell: int = 1):
    """Merged A-ViT layer: LN(x*a)*a masking on both sublayers, unmasked
    residual adds (reference adavit.py:21-80). active: (B, N, 1)."""
    b, n, d = x.shape
    mi = _safe_images_per_cell(images_per_cell, b, n, d)
    iom = pl.BlockSpec((mi, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w = _pack_layer_weights(ln1s, ln1b, w_qkv, b_qkv, w_out, b_out,
                            ln2s, ln2b, w1, b1, w2, b2, d, w1.shape[-1])
    return _merged_call(x, active, iom, w, num_heads, eps, "avit",
                        interpret, mi)
