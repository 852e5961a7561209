"""Rank-PCT: PCT with norm-based token ranking (reference models/rankpct.py).

Contracts (quirks preserved, rankpct.py:48-146):
- position 0 is protected from ranking (the reference treats it as a class
  token even though PCT never prepends one);
- TRAIN: tokens are sorted and the tail ``N-1 - ceil((N-1)*budget)`` is
  ZEROED (mask_tokens) — the zeroing also re-applies to ln_1/ln_2 outputs;
  the classifier mean still divides by the full token count;
- EVAL: tokens are sorted and physically DROPPED, keeping
  ``ceil(N_alive * budget)`` of the full sequence (position 0 counts toward
  the kept budget) — here realised as a compounding keep mask + attention
  key-masking + masked mean pooling (mathematically identical: PCT has no
  positional embedding, so order never matters);
- ``enable_ranking(bool | list)`` toggles per block (":330-345");
  ``set_budget`` fans out to all blocks (":348-352").

aux['masks'][layer_i] = (B, N, 1) keep/zero mask of each ranking block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.models.pct import ARPE, ClassfHead
from peekvit_tpu.ops.attention import SelfAttention
from peekvit_tpu.ops.mlp import MLP

Aux = dict


def _ranks_desc(tokens: jax.Array, alive: jax.Array) -> jax.Array:
    """Rank of each token by descending norm among alive tokens (0=largest)."""
    norms = jnp.linalg.norm(tokens.astype(jnp.float32), axis=-1)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    norms = jnp.where(alive > 0, norms, neg)
    order = jnp.argsort(-norms, axis=-1, stable=True)
    return jnp.argsort(order, axis=-1)


class RankingPCTBlock(nn.Module):
    """PCT block with optional ranking (reference rankpct.py:19-146)."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    attention_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        alive: jax.Array,
        budget: Optional[jax.Array],
        rank: bool,
        *,
        train: bool = False,
    ):
        b, n, _ = tokens.shape
        mask = None
        key_mask = None
        if rank and budget is not None:
            first = tokens[:, :1]
            rest = tokens[:, 1:]
            if train:
                # ceil((N-1) * budget) of the non-protected tokens, zeroed
                ranks = _ranks_desc(rest, jnp.ones((b, n - 1), tokens.dtype))
                n_keep = jnp.ceil((n - 1) * jnp.asarray(budget, jnp.float32))
                keep_rest = (ranks < n_keep).astype(tokens.dtype)
                mask = jnp.concatenate(
                    [jnp.ones((b, 1), tokens.dtype), keep_rest], axis=1
                )
                tokens = tokens * mask[..., None]
            else:
                # ceil(N_alive * budget) of the FULL sequence; pos 0 is first
                # in the sort so it always survives (reference :103-113)
                ranks = _ranks_desc(rest, alive[:, 1:])
                alive_count = jnp.sum(alive, axis=-1, keepdims=True)
                n_keep = jnp.ceil(alive_count * jnp.asarray(budget, jnp.float32))
                keep_rest = ((ranks < (n_keep - 1)) & (alive[:, 1:] > 0)).astype(tokens.dtype)
                mask = jnp.concatenate([alive[:, :1], keep_rest], axis=1)
                alive = mask
                key_mask = mask
        m = 1.0 if mask is None else mask[..., None]

        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(tokens)
        if train and mask is not None:
            y = y * m  # mask_tokens re-applied to LN output (reference :135)
        x = SelfAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout, name="self_attention"
        )(y, key_mask=key_mask, deterministic=not train) + tokens
        z = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        if train and mask is not None:
            z = z * m
        x = MLP(self.hidden_dim, self.mlp_dim, name="mlp")(z) + x
        return x, alive, (mask[..., None] if mask is not None else None)


class RankPointCloudTransformer(nn.Module):
    """Rank-PCT classifier. Returns (logits, aux['masks'])."""

    num_points: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 40
    representation_size: Optional[int] = None
    num_registers: int = 0
    num_class_tokens: int = 1
    ranking_enabled: Tuple[bool, ...] = ()

    accepts_budget: bool = True

    def setup(self):
        self.embedder = ARPE(self.hidden_dim, self.num_points, name="embedder")
        self.class_tokens = self.param(
            "class_tokens", nn.initializers.zeros,
            (1, self.num_class_tokens, self.hidden_dim),
        )
        if self.num_registers > 0:
            self.registers = self.param(
                "registers", nn.initializers.zeros,
                (1, self.num_registers, self.hidden_dim),
            )
        self.blocks = [
            RankingPCTBlock(
                self.num_heads, self.hidden_dim, self.mlp_dim,
                self.attention_dropout, name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.encoder_dropout = nn.Dropout(self.dropout)
        self.head = ClassfHead(self.hidden_dim, self.num_classes, name="head")

    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        budget: Optional[jax.Array] = None,
        noise_value: Optional[jax.Array] = None,
    ):
        del noise_value
        tokens = self.embedder(x, train=train)
        if self.num_registers > 0:
            tokens = jnp.concatenate(
                [jnp.broadcast_to(self.registers, (x.shape[0], self.num_registers, self.hidden_dim)), tokens],
                axis=1,
            )
        tokens = self.encoder_dropout(tokens, deterministic=not train)
        b, n, _ = tokens.shape
        ranking = self.ranking_enabled or (False,) * self.num_layers
        alive = jnp.ones((b, n), tokens.dtype)
        masks = {}
        any_eval_drop = False
        for i, blk in enumerate(self.blocks):
            tokens, alive, mask = blk(
                tokens, alive, budget, ranking[i], train=train
            )
            if mask is not None:
                masks[f"layer_{i}"] = mask
                if not train:
                    any_eval_drop = True
        if any_eval_drop:
            # physical-drop semantics: mean over surviving tokens only
            w = alive[..., None]
            pooled = jnp.sum(tokens * w, axis=1) / jnp.maximum(
                jnp.sum(w, axis=1), 1.0
            )
        else:
            pooled = jnp.mean(tokens, axis=1)
        return self.head(pooled, train=train), {"masks": masks}
