"""A-ViT: token-level Adaptive Computation Time (arXiv 2112.07658).

Behavioral contract from reference models/adavit.py:

- per-token halting score ``sigmoid(x[:,:,0]*gate_scale - gate_center)``
  (adavit.py:73-77);
- the encoder loop accumulates ``c_token`` (cumulative halting), remainder
  ``R_token``, active ``mask_token``, ponder cost ``rho_token`` and
  ``counter_token``; the output is the per-layer weighted sum
  delta1 (tokens reaching the 1-eps threshold, weighted by remainder) +
  delta2 (still-active tokens, weighted by halting score) (":140-219");
- blocks mask both attention and MLP inputs by the active mask (":65-70");
- the final layer forces h = 1 so every token halts (":186-187").

TPU-first: the reference mutates five state tensors in a Python loop with
hardcoded ``.cuda()`` (SURVEY.md §7.4). Here ACT is a single ``lax.scan``
over a stacked block (``nn.scan``): state is the scan carry, block params
get a leading layer axis, and ``aux`` carries ``rho_token`` +
``halting_score_layer`` for the two A-ViT losses (utils/losses.py:144-184).
NoiseBlock insertion at an ARBITRARY encoder index (reference
utils/utils.py:162-191) happens inside the scan body: the noised input is
computed every layer (identity at value 0) and selected with
``layer_idx == noise_layer`` — static shapes, no recompilation across the
noise sweep.

Divergence (documented): per-layer mean halting score excludes the class
token, i.e. ``mean(h[:, 1:])`` — the reference's ``mean(h[1:])``
(adavit.py:176) slices the *batch*, which is an indexing bug.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.ops.attention import SelfAttention
from peekvit_tpu.ops.mlp import MLP
from peekvit_tpu.ops.noise import apply_noise
from peekvit_tpu.ops.patch_embed import PatchEmbed

Aux = dict


class AViTBlock(nn.Module):
    """Block with active-mask-gated attention+MLP and a halting head
    (reference adavit.py:21-80). Note: no dropout on the residual adds."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    gate_scale: float = 10.0
    gate_center: float = 30.0

    @nn.compact
    def __call__(self, x: jax.Array, active: jax.Array, *, train: bool = False):
        """active: (B, N) 1 = still computing. Returns (x, halting_score)."""
        a = active[..., None]
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x * a) * a
        x = x + SelfAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout, name="self_attention"
        )(y, deterministic=not train)
        z = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x * a) * a
        x = x + MLP(self.hidden_dim, self.mlp_dim, name="mlp")(z)
        h = jax.nn.sigmoid(x[:, :, 0] * self.gate_scale - self.gate_center)
        return x, h


class _ACTStep(nn.Module):
    """One ACT layer step: scan body. carry = (out, c, R, rho, counter,
    active, output); ys = mean halting score of the layer."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float
    attention_dropout: float
    gate_scale: float
    gate_center: float
    eps: float
    num_layers: int
    train: bool
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    @nn.compact
    def __call__(self, carry, layer_idx):
        out, c, R, rho, counter, active, output, noise_value = carry
        if self.noise_layer is not None:
            # NoiseBlock before an ARBITRARY encoder index under scan
            # (reference utils/utils.py:162-191): compute the noised input
            # unconditionally (both ops are identity at value 0) and select
            # it only on the matching layer — compiler-friendly lax.select,
            # no data-dependent control flow.
            noisy = apply_noise(
                out, self.noise_type, noise_value, self.make_rng("noise")
            )
            out = jnp.where(layer_idx == self.noise_layer, noisy, out)
        block = AViTBlock(
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            self.gate_scale,
            self.gate_center,
            name="block",
        )
        out = out * active[..., None]
        block_out, h = block(out, active, train=self.train)
        mean_h = jnp.mean(h[:, 1:])  # class token excluded (see module docstring)
        out_next = block_out
        block_out = block_out * active[..., None]
        # last layer: every remaining token halts (adavit.py:186-187)
        h = jnp.where(layer_idx == self.num_layers - 1, jnp.ones_like(h), h)
        c = c + h
        rho = rho + active
        reached = (c > 1.0 - self.eps).astype(out.dtype) * active
        delta1 = block_out * (R * reached)[..., None]
        rho = rho + R * reached
        not_reached = (c < 1.0 - self.eps).astype(out.dtype)
        R = R - not_reached * h
        delta2 = block_out * (h * not_reached)[..., None]
        counter = counter + not_reached
        active = (c < 1.0 - self.eps).astype(out.dtype)
        output = output + delta1 + delta2
        return (
            out_next, c, R, rho, counter, active, output, noise_value
        ), mean_h


class AViTEncoder(nn.Module):
    """ACT over a scanned block stack (reference adavit.py:84-219)."""

    seq_length: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    eps: float = 0.01
    gate_scale: float = 10.0
    gate_center: float = 30.0
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        noise_value: Optional[jax.Array] = None,
    ):
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, self.seq_length, self.hidden_dim),
        )
        x = x + pos
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        bs, n = x.shape[0], self.seq_length

        ScannedBody = nn.scan(
            _ACTStep,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "noise": True},
            in_axes=0,
            out_axes=0,
            length=self.num_layers,
        )
        carry0 = (
            x,
            jnp.zeros((bs, n), x.dtype),
            jnp.ones((bs, n), x.dtype),
            jnp.zeros((bs, n), x.dtype),
            jnp.ones((bs, n), x.dtype),
            jnp.ones((bs, n), x.dtype),
            jnp.zeros_like(x),
            jnp.asarray(
                0.0 if noise_value is None else noise_value, jnp.float32
            ),
        )
        (out, c, R, rho, counter, active, output, _), mean_h = ScannedBody(
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            self.gate_scale,
            self.gate_center,
            self.eps,
            self.num_layers,
            train,
            self.noise_layer,
            self.noise_type,
            name="blocks",
        )(carry0, jnp.arange(self.num_layers))
        aux = {
            "rho_token": rho,
            "counter_token": counter,
            "halting_score_layer": mean_h,  # (num_layers,)
        }
        return nn.LayerNorm(epsilon=1e-5, name="ln")(output), aux


class AdaptiveVisionTransformer(nn.Module):
    """A-ViT classifier. Returns (logits, aux) with ACT state in aux."""

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
    eps: float = 0.01
    gate_scale: float = 10.0
    gate_center: float = 30.0
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    accepts_budget: bool = False  # depth emerges from the losses (§7.16)

    def setup(self):
        if self.image_size % self.patch_size != 0:
            raise ValueError("Input shape indivisible by patch size!")
        self.conv_proj = PatchEmbed(self.hidden_dim, self.patch_size)
        self.class_tokens = self.param(
            "class_tokens", nn.initializers.zeros,
            (1, self.num_class_tokens, self.hidden_dim),
        )
        if self.num_registers > 0:
            self.register_tokens = self.param(
                "register_tokens", nn.initializers.zeros,
                (1, self.num_registers, self.hidden_dim),
            )
        seq_length = (self.image_size // self.patch_size) ** 2
        seq_length += self.num_class_tokens + self.num_registers
        self.encoder = AViTEncoder(
            seq_length,
            self.num_layers,
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            eps=self.eps,
            gate_scale=self.gate_scale,
            gate_center=self.gate_center,
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
    ):
        del budget
        n = x.shape[0]
        tokens = self.conv_proj(x)
        if self.num_registers > 0:
            tokens = jnp.concatenate(
                [jnp.broadcast_to(self.register_tokens, (n, self.num_registers, self.hidden_dim)), tokens],
                axis=1,
            )
        cls = jnp.broadcast_to(self.class_tokens, (n, self.num_class_tokens, self.hidden_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens, aux = self.encoder(tokens, train=train, noise_value=noise_value)
        logits = self.head(jnp.sum(tokens[:, : self.num_class_tokens], axis=1))
        return logits, aux
