"""Token->image ViT decoder (reference models/vitdecoder.py).

Contract: replace masked tokens with a learned mask token via the soft
binarization ``sigmoid(mask*100)`` (vitdecoder.py:98-103); add pos-emb
(sized seq_length-1 — the img-token count for the 1-class-token layout,
":76"); run plain ViT blocks WITHOUT pos-emb inside (":21-58"); linear head
to ``3*p^2`` with (c, p1, p2) element order; fold patches back to an image.
Also returns the mask upscaled to image resolution for visualization.

Images are NHWC here; the head's (c p1 p2) element order is preserved for
checkpoint parity with the reference's einops Rearrange.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from einops import rearrange

from peekvit_tpu.models.vit import ViTBlock


class ViTDecoderEncoder(nn.Module):
    """Block stack + LN, no pos-emb (reference vitdecoder.py:21-58)."""

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
                self.num_heads,
                self.hidden_dim,
                self.mlp_dim,
                self.dropout,
                self.attention_dropout,
                name=f"layers_{i}",
            )(x, train=train)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x)


class VisionTransformerDecoder(nn.Module):
    """tokens (B, N_img, D) + gate mask -> (image NHWC, mask image)."""

    image_size: int
    patch_size: int
    hidden_dim: int
    mlp_dim: int
    seq_length: int  # encoder seq length INCLUDING class token (reference API)
    num_layers: int
    num_heads: int
    dropout: float = 0.0
    attention_dropout: float = 0.0

    @nn.compact
    def __call__(self, tokens: jax.Array, mask: jax.Array, *, train: bool = False):
        mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, self.hidden_dim)
        )
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, self.seq_length - 1, self.hidden_dim),
        )
        # soft binarization of the gate mask (vitdecoder.py:98-100)
        m = jax.nn.sigmoid(mask * 100.0)
        m = jnp.broadcast_to(m, tokens.shape)
        tokens = tokens * m + mask_token * (1.0 - m)
        tokens = tokens + pos
        tokens = ViTDecoderEncoder(
            self.num_layers,
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            name="encoder",
        )(tokens, train=train)
        tokens = nn.Dense(3 * self.patch_size**2, name="head")(tokens)
        p = self.patch_size
        h = self.image_size // p
        img = rearrange(
            tokens, "b (h w) (c p1 p2) -> b (h p1) (w p2) c", p1=p, p2=p, h=h
        )
        # mask upscaled to image resolution (1 channel) for viz (":113-121").
        # The reference slices the hidden-dim-expanded mask to p*p features,
        # which crashes when hidden_dim < p^2 — the mask is constant across
        # features, so broadcast the first channel instead (quirk fixed).
        mask_patch = jnp.broadcast_to(
            m[:, :, :1], (m.shape[0], m.shape[1], p * p)
        )
        mask_img = rearrange(
            mask_patch, "b (h w) (p1 p2) -> b (h p1) (w p2)", p1=p, p2=p, h=h
        )[..., None]
        return img, mask_img
