"""Norm-based token ranking ops (RankViT / RankPCT).

Contract from reference models/rankvit.py:55-77 (sort_and_drop): sort
non-class tokens by L2 norm descending and keep ``ceil(n * budget)``.

TPU-first design: the reference *physically drops* tokens (dynamic shapes —
one CUDA kernel launch per shape). Under XLA we provide two jit-stable forms:

1. :func:`token_rank_mask` — budget is a traced scalar; returns a {0,1} keep
   mask over tokens (rank < n_keep). Attention then excludes dropped tokens
   via key masking. Mathematically identical to physical dropping (attention
   is permutation-equivariant and dropped tokens neither attend nor are
   attended to). ONE compilation serves the whole budget sweep.
2. :func:`gather_topk_tokens` — static ``n_keep``; packs the kept tokens into
   a smaller (B, n_keep, D) array for real FLOP savings (one compile per
   distinct n_keep). Used by the eval perf path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def token_norm_ranks(tokens: jax.Array) -> jax.Array:
    """(B, N, D) -> (B, N) integer rank by descending L2 norm (0 = largest)."""
    norms = jnp.linalg.norm(tokens.astype(jnp.float32), axis=-1)
    # rank = position in the descending sort: argsort of argsort.
    order = jnp.argsort(-norms, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1)
    return ranks


def token_rank_mask(tokens: jax.Array, budget: jax.Array) -> jax.Array:
    """Keep-mask (B, N): 1 for the ceil(N * budget) largest-norm tokens."""
    n = tokens.shape[1]
    n_keep = jnp.ceil(jnp.asarray(budget, jnp.float32) * n).astype(jnp.int32)
    ranks = token_norm_ranks(tokens)
    return (ranks < n_keep).astype(tokens.dtype)


def gather_topk_tokens(tokens: jax.Array, n_keep: int) -> jax.Array:
    """Pack the n_keep largest-norm tokens, in descending-norm order.

    Matches the reference's sorted output order (rankvit.py:67-75) so the
    packed path is bit-comparable with torch's gather.
    """
    norms = jnp.linalg.norm(tokens.astype(jnp.float32), axis=-1)
    order = jnp.argsort(-norms, axis=-1, stable=True)[:, :n_keep]
    return jnp.take_along_axis(tokens, order[..., None], axis=1)
