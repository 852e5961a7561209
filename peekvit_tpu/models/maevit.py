"""Masked-Autoencoder ViT (reference models/maevit.py).

Contract:
- TokenShuffle drops ``int(mask_ratio * seq)`` tokens by ONE random
  permutation shared across the batch (maevit.py:15-58); shuffling happens
  only in training (":221") and AFTER pos-emb, BEFORE class tokens;
- the encoder stack has no internal pos-emb (":62-96");
- decoder appends mask tokens, un-shuffles via the backward permutation,
  adds decoder pos-emb, reconstructs the image (":278-325");
- forward returns ``(logits, reconstructed_image)`` (":386-390").

Fix vs reference (documented): ``self.mask_ratio`` is read in the reference
forward but never assigned (AttributeError); stored properly here. A Dense
projection bridges encoder->decoder when the hidden dims differ (the
reference would shape-error).

jit notes: the kept-token count is static (mask_ratio is module config);
the permutation uses the explicit 'shuffle' PRNG stream.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from einops import rearrange

from peekvit_tpu.models.vit import ViTBlock
from peekvit_tpu.ops.patch_embed import PatchEmbed

Aux = dict


class MAEViTEncoder(nn.Module):
    """Block stack + LN, no pos-emb (reference maevit.py:62-96)."""

    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.num_layers):
            x = ViTBlock(
                self.num_heads, self.hidden_dim, self.mlp_dim,
                self.dropout, self.attention_dropout, name=f"layers_{i}",
            )(x, train=train)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x)


class MAEVisionTransformer(nn.Module):
    """MAE: shuffle-drop -> encode kept tokens -> decode full image.

    Primary output = (logits, reconstructed_image NHWC).
    aux = {'forward_perm', 'backward_perm', 'kept_tokens'} when shuffled.
    """

    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    mask_ratio: float
    decoder_hidden_dim: int
    decoder_mlp_dim: int
    num_decoder_layers: int
    num_decoder_heads: int
    decoder_dropout: float = 0.0
    decoder_attention_dropout: float = 0.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    representation_size: Optional[int] = None
    num_registers: int = 0
    num_class_tokens: int = 1

    accepts_budget: bool = False
    output_format: str = "logits_recon"

    def setup(self):
        if self.image_size % self.patch_size != 0:
            raise ValueError("Input shape indivisible by patch size!")
        self.conv_proj = PatchEmbed(self.hidden_dim, self.patch_size)
        n_patches = (self.image_size // self.patch_size) ** 2
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(stddev=0.02),
            (1, n_patches, self.hidden_dim),
        )
        self.class_tokens = self.param(
            "class_tokens", nn.initializers.zeros,
            (1, self.num_class_tokens, self.hidden_dim),
        )
        if self.num_registers > 0:
            self.register_tokens = self.param(
                "register_tokens", nn.initializers.zeros,
                (1, self.num_registers, self.hidden_dim),
            )
        self.encoder = MAEViTEncoder(
            self.num_layers, self.num_heads, self.hidden_dim, self.mlp_dim,
            self.dropout, self.attention_dropout, name="encoder",
        )
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )
        # ---- decoder ----
        self.mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, self.decoder_hidden_dim)
        )
        self.decoder_pos_embedding = self.param(
            "decoder_pos_embedding", nn.initializers.normal(stddev=0.02),
            (1, n_patches, self.decoder_hidden_dim),
        )
        if self.decoder_hidden_dim != self.hidden_dim:
            self.decoder_embed = nn.Dense(self.decoder_hidden_dim)
        self.decoder_encoder = MAEViTEncoder(
            self.num_decoder_layers, self.num_decoder_heads,
            self.decoder_hidden_dim, self.decoder_mlp_dim,
            self.decoder_dropout, self.decoder_attention_dropout,
            name="decoder_blocks",
        )
        self.decoder_head = nn.Dense(3 * self.patch_size**2, name="decoder_head")

    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        budget: Optional[jax.Array] = None,
        noise_value: Optional[jax.Array] = None,
    ):
        del budget, noise_value
        n = x.shape[0]
        tokens = self.conv_proj(x) + self.pos_embedding
        n_patches = tokens.shape[1]

        forward_perm = backward_perm = None
        if self.mask_ratio > 0.0 and train:
            num_mask = int(self.mask_ratio * n_patches)
            forward_perm = jax.random.permutation(self.make_rng("shuffle"), n_patches)
            backward_perm = jnp.argsort(forward_perm)
            tokens = tokens[:, forward_perm][:, : n_patches - num_mask]

        if self.num_registers > 0:
            tokens = jnp.concatenate(
                [jnp.broadcast_to(self.register_tokens, (n, self.num_registers, self.hidden_dim)), tokens],
                axis=1,
            )
        cls = jnp.broadcast_to(self.class_tokens, (n, self.num_class_tokens, self.hidden_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)

        tokens = self.encoder(tokens, train=train)
        logits = self.head(jnp.sum(tokens[:, : self.num_class_tokens], axis=1))
        img_tokens = tokens[:, self.num_class_tokens + self.num_registers :]

        # ---- decode ----
        if self.decoder_hidden_dim != self.hidden_dim:
            img_tokens = self.decoder_embed(img_tokens)
        if backward_perm is not None:
            missing = n_patches - img_tokens.shape[1]
            mask_tokens = jnp.broadcast_to(
                self.mask_token, (n, missing, self.decoder_hidden_dim)
            )
            img_tokens = jnp.concatenate([img_tokens, mask_tokens], axis=1)
            img_tokens = img_tokens[:, backward_perm]
        dec = img_tokens + self.decoder_pos_embedding
        dec = self.decoder_encoder(dec, train=train)
        dec = self.decoder_head(dec)
        p = self.patch_size
        img = rearrange(
            dec, "b (h w) (c p1 p2) -> b (h p1) (w p2) c",
            p1=p, p2=p, h=self.image_size // p,
        )
        aux: Aux = {}
        if forward_perm is not None:
            aux = {"forward_perm": forward_perm, "backward_perm": backward_perm}
        return (logits, img), aux
