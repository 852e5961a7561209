"""RankViT: train-free norm-based token pruning (reference models/rankvit.py).

Contract: at each layer in ``rankvit_layers``, sort non-class tokens by L2
norm descending and keep ``ceil(n_alive * budget)`` (rankvit.py:55-77);
ranking is a no-op at budget == 1 (":85-88"); ``set_budget`` fans out to the
ranked layers, optionally as a per-layer list indexed by layer id
(":283-288", SURVEY.md §7.8); registers unsupported (":202-205").

TPU-first design: the reference physically drops tokens (dynamic shapes).
Here a running *keep mask* flows through the encoder; dropped tokens are
excluded from attention via key masking, which is mathematically identical
(see ops/ranking.py and tests/test_ops.py::test_mha_key_mask_equals_physical_drop).
Budget is a traced scalar (or per-layer vector) -> ONE compilation serves
the whole budget sweep. ``ceil(alive * budget)`` compounds across ranked
layers exactly like the reference's shrinking shapes.

Deliberate fix: all class tokens are protected from ranking (the reference
protects only token 0 and scrambles multi-class-token models, SURVEY.md §7.9).

aux['masks'][layer_i] carries the (B, N_img, 1) keep mask of each ranked
layer for FLOPs accounting and visualization.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.models.vit import ViTBlock
from peekvit_tpu.ops.noise import apply_noise
from peekvit_tpu.ops.patch_embed import PatchEmbed

Aux = dict


def _rank_update(img_tokens, alive, budget):
    """New keep mask: top-ceil(alive_count*budget) of alive tokens by norm."""
    norms = jnp.linalg.norm(img_tokens.astype(jnp.float32), axis=-1)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    norms = jnp.where(alive > 0, norms, neg)
    order = jnp.argsort(-norms, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1)
    alive_count = jnp.sum(alive, axis=-1, keepdims=True)
    n_keep = jnp.ceil(alive_count * jnp.asarray(budget, jnp.float32))
    return ((ranks < n_keep) & (alive > 0)).astype(img_tokens.dtype)


class RankViTBlock(nn.Module):
    """ViT block that re-ranks alive tokens before attending (rankvit.py:24-101)."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_class_tokens: int = 1
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, tokens, alive, budget, *, train: bool = False):
        c = self.num_class_tokens
        img = tokens[:, c:]
        alive = _rank_update(img, alive, budget)
        key_mask = jnp.concatenate(
            [jnp.ones((tokens.shape[0], c), alive.dtype), alive], axis=1
        )
        from peekvit_tpu.ops.attention import SelfAttention
        from peekvit_tpu.ops.mlp import MLP

        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_1")(tokens)
        y = SelfAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout, name="self_attention"
        )(y, key_mask=key_mask, deterministic=not train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = tokens + y
        z = nn.LayerNorm(epsilon=self.ln_eps, name="ln_2")(x)
        z = MLP(self.hidden_dim, self.mlp_dim, name="mlp")(z)
        return x + z, alive


class RankViTEncoder(nn.Module):
    """Mixed stack of plain / ranking blocks (reference rankvit.py:105-152)."""

    seq_length: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    rankvit_layers: tuple = ()
    num_class_tokens: int = 1
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    @nn.compact
    def __call__(
        self,
        tokens,
        budget: Optional[jax.Array] = None,
        *,
        train: bool = False,
        noise_value: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
    ):
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, self.seq_length, self.hidden_dim),
        )
        tokens = tokens + pos
        tokens = nn.Dropout(self.dropout, deterministic=not train)(tokens)

        n_img = self.seq_length - self.num_class_tokens
        alive = jnp.ones((tokens.shape[0], n_img), tokens.dtype)
        masks = {}
        budget_vec = None
        if budget is not None:
            budget_vec = jnp.asarray(budget, jnp.float32)
        for i in range(self.num_layers):
            if self.noise_layer is not None and i == self.noise_layer:
                tokens = apply_noise(
                    tokens,
                    self.noise_type,
                    0.0 if noise_value is None else noise_value,
                    noise_rng if noise_rng is not None
                    else self.make_rng("noise"),
                )
            if i in self.rankvit_layers and budget_vec is not None:
                # per-layer budgets are indexed by layer id (SURVEY.md §7.8)
                b_i = budget_vec[i] if budget_vec.ndim == 1 else budget_vec
                tokens, alive = RankViTBlock(
                    self.num_heads,
                    self.hidden_dim,
                    self.mlp_dim,
                    self.dropout,
                    self.attention_dropout,
                    num_class_tokens=self.num_class_tokens,
                    name=f"layers_{i}",
                )(tokens, alive, b_i, train=train)
                masks[f"layer_{i}"] = alive[..., None]
            else:
                # dropped tokens were physically removed in the reference, so
                # even non-ranking layers must not attend to them
                key_mask = None
                if budget_vec is not None and self.rankvit_layers:
                    key_mask = jnp.concatenate(
                        [
                            jnp.ones(
                                (tokens.shape[0], self.num_class_tokens), alive.dtype
                            ),
                            alive,
                        ],
                        axis=1,
                    )
                tokens = ViTBlock(
                    self.num_heads,
                    self.hidden_dim,
                    self.mlp_dim,
                    self.dropout,
                    self.attention_dropout,
                    name=f"layers_{i}",
                )(tokens, train=train, key_mask=key_mask)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(tokens), masks


class RankVisionTransformer(nn.Module):
    """RankViT classifier. Returns (logits, aux['masks'])."""

    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    representation_size: Optional[int] = None
    num_registers: int = 0
    num_class_tokens: int = 1
    rankvit_layers: Optional[Sequence[int]] = None
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    accepts_budget: bool = True

    def setup(self):
        if self.image_size % self.patch_size != 0:
            raise ValueError("Input shape indivisible by patch size!")
        if self.num_registers > 0:
            raise ValueError("Registers are not supported yet for this model.")
        self.conv_proj = PatchEmbed(self.hidden_dim, self.patch_size)
        self.class_tokens = self.param(
            "class_tokens", nn.initializers.zeros,
            (1, self.num_class_tokens, self.hidden_dim),
        )
        seq_length = (self.image_size // self.patch_size) ** 2 + self.num_class_tokens
        self.encoder = RankViTEncoder(
            seq_length,
            self.num_layers,
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            rankvit_layers=tuple(self.rankvit_layers or ()),
            num_class_tokens=self.num_class_tokens,
            noise_layer=self.noise_layer,
            noise_type=self.noise_type,
        )
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )

    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        budget: Optional[jax.Array] = None,
        noise_value: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
    ):
        n = x.shape[0]
        tokens = self.conv_proj(x)
        cls = jnp.broadcast_to(
            self.class_tokens, (n, self.num_class_tokens, self.hidden_dim)
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens, masks = self.encoder(
            tokens, budget, train=train, noise_value=noise_value,
            noise_rng=noise_rng,
        )
        logits = self.head(jnp.sum(tokens[:, : self.num_class_tokens], axis=1))
        return logits, {"masks": masks}
