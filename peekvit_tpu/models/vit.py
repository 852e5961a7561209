"""Plain Vision Transformer (reference: models/vit.py).

Behavioral contract preserved:
- conv patch-embed (expressed as a matmul, see ops/patch_embed.py);
- [registers] + [class tokens] prepended (registers first, then class tokens
  at positions 0..C-1 after the final cat — reference vit.py:229-236);
- learned pos-emb added inside the encoder (vit.py:92);
- pre-LN blocks with LayerNorm eps=1e-5 (torch default — SURVEY.md §7.12);
- classifier = SUM of class tokens -> zero-init linear head (vit.py:242-247,
  §7.10: sum, not average, despite reference docstrings).

TPU-first deltas: images are NHWC; forward returns ``(logits, aux)`` where
aux is an explicit pytree (empty for plain ViT, populated by variants);
all dropout takes explicit PRNG keys.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.ops.attention import SelfAttention
from peekvit_tpu.ops.mlp import MLP
from peekvit_tpu.ops.noise import apply_noise
from peekvit_tpu.ops.patch_embed import PatchEmbed

Aux = dict


class ViTBlock(nn.Module):
    """Pre-LN transformer encoder block (reference vit.py:19-55)."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False, key_mask=None
    ) -> jax.Array:
        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_1")(x)
        y = SelfAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout, name="self_attention"
        )(y, key_mask=key_mask, deterministic=not train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = x + y
        z = nn.LayerNorm(epsilon=self.ln_eps, name="ln_2")(x)
        z = MLP(self.hidden_dim, self.mlp_dim, name="mlp")(z)
        return x + z


class ViTEncoder(nn.Module):
    """Pos-emb + dropout + block stack + final LN (reference vit.py:59-95).

    ``noise_layer`` optionally inserts a channel-noise op before block i
    (the TPU equivalent of utils/utils.py:162-191 add_noise surgery);
    the noise magnitude arrives as the traced ``noise_value`` operand so
    eval sweeps never recompile.
    """

    seq_length: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
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
    ) -> jax.Array:
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, self.seq_length, self.hidden_dim),
        )
        x = x + pos
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.num_layers):
            if self.noise_layer is not None and i == self.noise_layer:
                x = apply_noise(
                    x,
                    self.noise_type,
                    0.0 if noise_value is None else noise_value,
                    noise_rng if noise_rng is not None
                    else self.make_rng("noise"),
                )
            x = ViTBlock(
                self.num_heads,
                self.hidden_dim,
                self.mlp_dim,
                self.dropout,
                self.attention_dropout,
                name=f"layers_{i}",
            )(x, train=train)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x)


class VisionTransformer(nn.Module):
    """Plain ViT classifier. Returns (logits, aux)."""

    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    representation_size: Optional[int] = None  # kept for ctor parity; unused
    num_registers: int = 0
    num_class_tokens: int = 1
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    # capability flags used by the harness instead of hasattr duck-typing
    accepts_budget: bool = False

    def setup(self):
        if self.image_size % self.patch_size != 0:
            raise ValueError("Input shape indivisible by patch size!")
        self.conv_proj = PatchEmbed(self.hidden_dim, self.patch_size)
        self.class_tokens = self.param(
            "class_tokens",
            nn.initializers.zeros,
            (1, self.num_class_tokens, self.hidden_dim),
        )
        if self.num_registers > 0:
            self.register_tokens = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, self.num_registers, self.hidden_dim),
            )
        seq_length = (self.image_size // self.patch_size) ** 2
        seq_length += self.num_class_tokens + self.num_registers
        self.encoder = ViTEncoder(
            seq_length,
            self.num_layers,
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            noise_layer=self.noise_layer,
            noise_type=self.noise_type,
        )
        # zero-init head (reference vit.py:186-188)
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )

    def embed(self, x: jax.Array) -> jax.Array:
        """NHWC image -> token sequence with registers + class tokens."""
        n = x.shape[0]
        x = self.conv_proj(x)
        if self.num_registers > 0:
            regs = jnp.broadcast_to(
                self.register_tokens, (n, self.num_registers, self.hidden_dim)
            )
            x = jnp.concatenate([regs, x], axis=1)
        cls = jnp.broadcast_to(
            self.class_tokens, (n, self.num_class_tokens, self.hidden_dim)
        )
        return jnp.concatenate([cls, x], axis=1)

    def classify(self, x: jax.Array) -> jax.Array:
        """Sum class tokens -> head (reference vit.py:242-247)."""
        return self.head(jnp.sum(x[:, : self.num_class_tokens], axis=1))

    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        budget: Optional[jax.Array] = None,
        noise_value: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, Aux]:
        del budget  # plain ViT has no budget control surface
        tokens = self.embed(x)
        tokens = self.encoder(tokens, train=train, noise_value=noise_value,
                              noise_rng=noise_rng)
        return self.classify(tokens), {}
