"""Point Cloud Transformer (reference models/pct.py).

Contract:
- ARPE embedding (pct.py:60-90): kNN among the points themselves (self
  included, k = 32*npoints/512), relative diffs, [point, diff] concat,
  Linear->BN->ELU, max-pool over neighbors, Linear->BN->ELU. The reference's
  ``knn_points`` import is commented out (dead without pytorch3d,
  SURVEY.md §7.18) — here kNN is implemented natively as a pairwise-distance
  top-k, which is a single (N, N) matmul on the MXU.
- PCTBlock (":20-57"): pre-LN, residuals after attention and MLP (note: no
  dropout applied, matching the reference's commented-out path).
- Classifier (":128-143,225-233"): MEAN-pool over all tokens (class tokens
  exist as params but are NOT prepended — reference quirk preserved), then
  Linear->BN->GELU->Dropout(0.5)->Linear.

BatchNorm runs through flax's batch_stats collection (momentum 0.9 == torch
0.1, eps 1e-5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.ops.attention import SelfAttention
from peekvit_tpu.ops.mlp import MLP

Aux = dict


def knn_indices(x: jax.Array, k: int) -> jax.Array:
    """(B, N, C) -> (B, N, K) nearest-neighbor indices (self included).

    Pairwise sq-distances via the |a-b|^2 = |a|^2+|b|^2-2ab expansion — one
    batched matmul instead of a gather-heavy loop.
    """
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum("bnc,bmc->bnm", x, x)
    _, idx = jax.lax.top_k(-d2, k)
    return idx


class ARPE(nn.Module):
    """Absolute-Relative Position Encoding (reference pct.py:60-90)."""

    out_channels: int
    num_points: int
    in_channels: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b, n, c = x.shape
        k = int(32 * self.num_points / 512)
        idx = knn_indices(x, k)  # (B, N, K)
        knn = jnp.take_along_axis(x[:, None, :, :], idx[..., None], axis=2)
        knn = knn.reshape(b, n, k, c)
        diffs = x[:, :, None, :] - knn
        feats = jnp.concatenate(
            [jnp.broadcast_to(x[:, :, None, :], (b, n, k, c)), diffs], axis=-1
        )  # (B, N, K, 2C)
        h = nn.Dense(2 * c, name="lin1")(feats)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn1"
        )(h.reshape(b * n, k, 2 * c))
        h = nn.elu(h)
        h = jnp.max(h, axis=1)  # max-pool over neighbors
        h = nn.Dense(self.out_channels, name="lin2")(h.reshape(b, n, 2 * c))
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn2"
        )(h)
        return nn.elu(h)


class PCTBlock(nn.Module):
    """Pre-LN block, no dropout (reference pct.py:20-57)."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    attention_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = SelfAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout, name="self_attention"
        )(y, deterministic=not train) + x
        z = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        return MLP(self.hidden_dim, self.mlp_dim, name="mlp")(z) + x


class ClassfHead(nn.Module):
    """Linear->BN->GELU->Dropout(0.5)->Linear (reference pct.py:128-143)."""

    in_channels: int
    n_classes: int

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        h = nn.Dense(self.in_channels // 2, name="lin1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.n_classes, name="lin2")(h)


class PointCloudTransformer(nn.Module):
    """PCT classifier over (B, num_points, 3) clouds. Returns (logits, {})."""

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

    accepts_budget: bool = False

    def setup(self):
        self.embedder = ARPE(self.hidden_dim, self.num_points, name="embedder")
        # exists-but-unused, kept for checkpoint parity (reference pct.py:181,218)
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
            PCTBlock(
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
        del budget, noise_value
        tokens = self.embedder(x, train=train)
        if self.num_registers > 0:
            tokens = jnp.concatenate(
                [jnp.broadcast_to(self.registers, (x.shape[0], self.num_registers, self.hidden_dim)), tokens],
                axis=1,
            )
        tokens = self.encoder_dropout(tokens, deterministic=not train)
        for blk in self.blocks:
            tokens = blk(tokens, train=train)
        pooled = jnp.mean(tokens, axis=1)  # mean-pool (reference pct.py:229)
        return self.head(pooled, train=train), {}
