"""Gather-free ARPE embedding kernel for the PCT engine.

The reference ARPE (reference models/pct.py:60-90) is, per point i:

    max-pool_{j in kNN(i)} elu(BN(lin1([x_i, x_i - x_j])))  -> lin2 -> BN
    -> elu

On TPU the literal form is hostile: exact kNN needs a top-k (36.8 ms at
ModelNet40 bs128 on v5e) and the (B, N, K, 3) neighbor gather costs
another 56 ms — while the WHOLE 4-layer PCT encoder runs in 7 ms on the
merged kernels. This kernel removes both:

- lin1 is linear over the [point | diff] concat, so with BN1's
  running-stats affine pre-folded (prepare_pct_engine_params):
      elu(aff_ik) = elu(c_i + g_j),  c_i = x_i @ (Wa'+Wb') + b',
      g_j = -x_j @ Wb'
  and the neighbor max-pool becomes a per-channel max of g_j over the
  kNN set — no gather, just a masked reduction.
- the kNN set itself only needs the k-th smallest distance per row:
  d2 stays in VMEM ((N, N) fp32, 4 MB per cloud) and a fixed-iteration
  BISECTION on [0, rowmax] finds the threshold — no top_k, no sort, no
  indices. Ties at the k-th distance include every tied point (the
  reference's top-k keeps an arbitrary k of them); for real clouds ties
  are measure-zero and the masked max only differs if a tied point is a
  channel argmax.

One grid cell per cloud. Inputs are lane-padded once at engine build:
points (N, 8) (xyz + 5 zero lanes), the tiny ARPE weights zero-padded to
128 lanes (padded channels produce elu(0)=0 and hit zero rows of lin2',
so they contribute nothing). The kernel emits the final encoder tokens
(N, d) directly — d2, the mask, and every intermediate live only in VMEM.

Cited reference semantics: models/pct.py:60-90 (ARPE), the kNN itself
reference-dead (pytorch3d import commented out) and rebuilt natively per
SURVEY.md §7.18.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BISECT_ITERS = 30  # |hi - lo| shrinks 2^30: below fp32 tie resolution


def _elu(x):
    """elu via exp (Mosaic has no expm1 lowering)."""
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _arpe_kernel(pts_ref, wc_ref, wb_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                 k: int, n_channels: int):
    n = pts_ref.shape[1]
    pts = pts_ref[0].astype(jnp.float32)            # (N, 8), xyz in [:3]
    sq = jnp.sum(pts * pts, axis=-1, keepdims=True)  # (N, 1)
    d2 = sq + sq.reshape(1, n) - 2.0 * jax.lax.dot_general(
        pts, pts, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (N, N)

    # bisect the k-th smallest distance per row: count(d2 <= mid) >= k
    lo = jnp.zeros((n, 1), jnp.float32)
    hi = jnp.max(d2, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d2 <= mid).astype(jnp.float32), axis=-1,
                      keepdims=True)
        ge = cnt >= float(k)
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    mask = d2 <= hi                                  # (N, N), self included

    ci = jax.lax.dot_general(                        # (N, 128-padded)
        pts, wc_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    # g TRANSPOSED — (128-padded, N), keys in lanes — so each channel's
    # neighbor row broadcasts over the mask without a lane->sublane
    # relayout: gT[ch, j] = -(x_j @ Wb')[ch]
    gT = -jax.lax.dot_general(
        wb_ref[...], pts, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    neg = jnp.float32(-3.4e38)
    cols = []
    for ch in range(n_channels):                     # static unroll (2c=6)
        masked = jnp.where(mask, gT[ch:ch + 1, :], neg)
        cols.append(jnp.max(masked, axis=-1, keepdims=True))
    pad = ci.shape[-1] - n_channels
    neigh = jnp.concatenate(
        cols + [jnp.zeros((n, pad), jnp.float32)], axis=-1)  # (N, padded)
    # padded channels: ci pad = 0 (zero wc cols, zero b1 pad) + neigh pad
    # = 0 -> elu(0) = 0, and w2's zero rows kill them anyway
    h = _elu(ci + neigh)
    # lin2 with BN2 pre-folded; elu -> final encoder tokens
    tok = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    o_ref[...] = _elu(tok).reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def arpe_tokens(pts_padded, wc, wb, b1, w2, b2, k: int, n_channels: int,
                interpret: bool = False):
    """(B, N, 8) lane-padded points -> (B, N, d) encoder tokens.

    ``wc`` = (8, 128-padded) BN1-folded (Wa' + Wb'), ``wb`` = Wb',
    ``b1`` = folded bias (1, 128-padded), ``w2``/``b2`` = lin2 with BN2
    folded ((128-padded, d) / (1, d)). See prepare_pct_engine_params.
    """
    b, n, _ = pts_padded.shape
    d = w2.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_arpe_kernel, k=k, n_channels=n_channels),
        out_shape=jax.ShapeDtypeStruct((b, n, d), pts_padded.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(wc.shape), full(wb.shape), full(b1.shape),
                  full(w2.shape), full(b2.shape)],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pts_padded, wc, wb, b1, w2, b2)
