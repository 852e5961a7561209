"""ViT with per-token top-1 Mixture-of-Experts on MLP and/or attention.

Behavioral contract from reference models/moevit.py:

- TopKGate = Linear -> hard GumbelSoftmax (train) / one-hot argmax (eval)
  (moevit.py:23-32);
- experts run DENSELY and are combined with the one-hot gating einsum
  ``'ebsd,bse->bsd'`` (":49-61,84-96") — dense execution is also the right
  first TPU mapping (big batched matmuls on the MXU; real routed expert
  parallelism is an optional mesh-axis extension, see parallel/);
- per-layer expert counts ``mlp_moes`` / ``attn_moes`` (":157-177");
- single class token; classifier reads token 0 (":300-311" — note: no
  class-token sum here, unlike the other models);
- gating probabilities surface in ``aux['gating_probs']`` (replacing the
  ``module.gating_probs`` side channel read by utils/utils.py:76-94).

Experts are stacked on a leading axis via ``nn.vmap`` so XLA sees one
(E, ...) batched matmul instead of a Python loop of small ones.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.ops.attention import SelfAttention
from peekvit_tpu.ops.gates import GumbelSoftmax
from peekvit_tpu.ops.mlp import MLP
from peekvit_tpu.ops.noise import apply_noise
from peekvit_tpu.ops.patch_embed import PatchEmbed

Aux = dict


class TopKGate(nn.Module):
    num_experts: int

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        scores = nn.Dense(self.num_experts, name="gate")(x)
        return GumbelSoftmax(hard=True)(scores, train=train)


class MLPMoE(nn.Module):
    hidden_dim: int
    mlp_dim: int
    num_experts: int

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        if self.num_experts == 1:
            return MLP(self.hidden_dim, self.mlp_dim, name="experts_0")(x), None
        probs = TopKGate(self.num_experts, name="gating_network")(x, train=train)
        Experts = nn.vmap(
            MLP,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.num_experts,
        )
        outs = Experts(self.hidden_dim, self.mlp_dim, name="experts")(x)  # (E,B,N,D)
        return jnp.einsum("ebsd,bse->bsd", outs, probs), probs


class AttentionMoE(nn.Module):
    hidden_dim: int
    num_heads: int
    num_experts: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        if self.num_experts == 1:
            return (
                SelfAttention(self.hidden_dim, self.num_heads, self.dropout, name="experts_0")(
                    x, deterministic=not train
                ),
                None,
            )
        probs = TopKGate(self.num_experts, name="gating_network")(x, train=train)
        Experts = nn.vmap(
            SelfAttention,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=None,
            out_axes=0,
            axis_size=self.num_experts,
        )
        outs = Experts(self.hidden_dim, self.num_heads, self.dropout, name="experts")(
            x, deterministic=not train
        )
        return jnp.einsum("ebsd,bse->bsd", outs, probs), probs


class ViTBlockMoE(nn.Module):
    """MoE transformer block (reference moevit.py:106-141)."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    mlp_num_experts: int = 1
    attn_num_experts: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        y, attn_probs = AttentionMoE(
            self.hidden_dim, self.num_heads, self.attn_num_experts,
            self.attention_dropout, name="self_attention",
        )(y, train=train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = x + y
        z = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        z, mlp_probs = MLPMoE(
            self.hidden_dim, self.mlp_dim, self.mlp_num_experts, name="mlp"
        )(z, train=train)
        return x + z, {"attn": attn_probs, "mlp": mlp_probs}


class ViTEncoderMoE(nn.Module):
    seq_length: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    mlp_moes: Optional[tuple] = None
    attn_moes: Optional[tuple] = None
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        noise_value: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
    ):
        mlp_moes = self.mlp_moes or (1,) * self.num_layers
        attn_moes = self.attn_moes or (1,) * self.num_layers
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, self.seq_length, self.hidden_dim),
        )
        x = x + pos
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        gating = {}
        for i in range(self.num_layers):
            if self.noise_layer is not None and i == self.noise_layer:
                x = apply_noise(
                    x,
                    self.noise_type,
                    0.0 if noise_value is None else noise_value,
                    noise_rng if noise_rng is not None
                    else self.make_rng("noise"),
                )
            x, probs = ViTBlockMoE(
                self.num_heads,
                self.hidden_dim,
                self.mlp_dim,
                self.dropout,
                self.attention_dropout,
                mlp_num_experts=mlp_moes[i],
                attn_num_experts=attn_moes[i],
                name=f"layers_{i}",
            )(x, train=train)
            if probs["attn"] is not None or probs["mlp"] is not None:
                gating[f"layer_{i}"] = {
                    k: v for k, v in probs.items() if v is not None
                }
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x), gating


class VisionTransformerMoE(nn.Module):
    """MoE ViT classifier. Returns (logits, aux['gating_probs'])."""

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
    mlp_moes: Optional[Sequence[int]] = None
    attn_moes: Optional[Sequence[int]] = None
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    accepts_budget: bool = False

    def setup(self):
        if self.image_size % self.patch_size != 0:
            raise ValueError("Input shape indivisible by patch size!")
        self.conv_proj = PatchEmbed(self.hidden_dim, self.patch_size)
        # single class token only (reference moevit.py:244-246)
        self.class_token = self.param(
            "class_token", nn.initializers.zeros, (1, 1, self.hidden_dim)
        )
        seq_length = (self.image_size // self.patch_size) ** 2 + 1
        self.encoder = ViTEncoderMoE(
            seq_length,
            self.num_layers,
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            mlp_moes=tuple(self.mlp_moes) if self.mlp_moes else None,
            attn_moes=tuple(self.attn_moes) if self.attn_moes else None,
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
        del budget
        n = x.shape[0]
        tokens = self.conv_proj(x)
        cls = jnp.broadcast_to(self.class_token, (n, 1, self.hidden_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens, gating = self.encoder(tokens, train=train,
                                      noise_value=noise_value,
                                      noise_rng=noise_rng)
        # classifier reads token 0 directly (moevit.py:307-311)
        logits = self.head(tokens[:, 0])
        return logits, {"gating_probs": gating}
