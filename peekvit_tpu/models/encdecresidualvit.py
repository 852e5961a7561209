"""ResidualViT encoder + ViT decoder reconstructing the input image from the
gated tokens (reference models/encdecresidualvit.py).

Contract: classification logits from summed class tokens; the decoder sees
the image tokens (class/register/budget tokens stripped, ":329-333") with the
LAST residual block's gate mask (":336") and returns
``(logits, reconstructed_images, reconstruction_mask)`` (":329-339").

Spec note (SURVEY.md §7.7): the token slicing only makes sense with a budget
token present, so ``add_budget_token`` must be truthy — enforced at
construction here instead of failing mid-forward.

Budget handling mirrors the EncDec variant: ONE budget per batch
(":245-301"), not per-sample.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.models.residualvit import ResidualViTEncoder
from peekvit_tpu.models.vitdecoder import VisionTransformerDecoder
from peekvit_tpu.ops.patch_embed import PatchEmbed

Aux = dict


class ResidualVisionTransformerWithDecoder(nn.Module):
    """Primary output = (logits, reconstructed_images, reconstruction_mask)."""

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
    residual_layers: Optional[tuple] = None
    add_input: bool = False
    num_class_tokens: int = 1
    gate_type: str = "gumbel"
    gate_temp: float = 1.0
    gate_bias: float = 10.0
    gate_threshold: Union[float, str] = 0.5
    sample_budget: Any = False  # ctor parity with reference (unused there too)
    add_budget_token: Any = True
    decoder_hidden_dim: Optional[int] = None
    decoder_num_layers: Optional[int] = None
    decoder_num_heads: Optional[int] = None
    decoder_mlp_dim: Optional[int] = None
    decoder_dropout: float = 0.0
    decoder_attention_dropout: float = 0.0
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    accepts_budget: bool = True
    output_format: str = "logits_recon_mask"

    def setup(self):
        if self.image_size % self.patch_size != 0:
            raise ValueError("Input shape indivisible by patch size!")
        if not self.add_budget_token:
            raise ValueError(
                "ResidualVisionTransformerWithDecoder requires add_budget_token "
                "(SURVEY.md §7.7: the reference's token slicing is broken without it)."
            )
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
        self.encoder = ResidualViTEncoder(
            seq_length,
            self.num_layers,
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            residual_layers=tuple(self.residual_layers) if self.residual_layers else None,
            add_input=self.add_input,
            num_class_tokens=self.num_class_tokens,
            num_registers=self.num_registers,
            gate_type=self.gate_type,
            gate_temp=self.gate_temp,
            gate_bias=self.gate_bias,
            gate_threshold=self.gate_threshold,
            budget_token=self.add_budget_token,
            noise_layer=self.noise_layer,
            noise_type=self.noise_type,
        )
        if self.add_budget_token in ("learnable", "learnable_interpolate"):
            self.learnable_budget_token_1 = self.param(
                "learnable_budget_token_1", nn.initializers.normal(stddev=1.0),
                (1, 1, self.hidden_dim),
            )
            self.learnable_budget_token_2 = self.param(
                "learnable_budget_token_2", nn.initializers.normal(stddev=1.0),
                (1, 1, self.hidden_dim),
            )
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )
        self.decoder = VisionTransformerDecoder(
            image_size=self.image_size,
            patch_size=self.patch_size,
            hidden_dim=self.decoder_hidden_dim or self.hidden_dim,
            mlp_dim=self.decoder_mlp_dim or self.mlp_dim,
            seq_length=seq_length,
            num_layers=self.decoder_num_layers or self.num_layers,
            num_heads=self.decoder_num_heads or self.num_heads,
            dropout=self.decoder_dropout,
            attention_dropout=self.decoder_attention_dropout,
        )

    def _sample_budget(self) -> jax.Array:
        if isinstance(self.add_budget_token, float):
            return jnp.float32(self.add_budget_token)
        rng = self.make_rng("budget")
        if isinstance(self.add_budget_token, (list, tuple)):
            return jax.random.choice(rng, jnp.asarray(self.add_budget_token, jnp.float32))
        return jax.random.uniform(rng, (), jnp.float32)

    def _budget_token(self, b: jax.Array, n: int) -> jax.Array:
        if self.add_budget_token == "learnable":
            return jnp.broadcast_to(self.learnable_budget_token_1, (n, 1, self.hidden_dim)) * b
        if self.add_budget_token == "learnable_interpolate":
            tok = self.learnable_budget_token_1 * b + self.learnable_budget_token_2 * (1.0 - b)
            return jnp.broadcast_to(tok, (n, 1, self.hidden_dim))
        return jnp.full((n, 1, self.hidden_dim), b, jnp.float32)

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
        if self.num_registers > 0:
            tokens = jnp.concatenate(
                [jnp.broadcast_to(self.register_tokens, (n, self.num_registers, self.hidden_dim)), tokens],
                axis=1,
            )
        cls = jnp.broadcast_to(self.class_tokens, (n, self.num_class_tokens, self.hidden_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        if train:
            current_budget = self._sample_budget()
        else:
            if budget is None:
                raise ValueError("Budget not set. Call set_budget() before evaluating.")
            current_budget = jnp.asarray(budget, jnp.float32)
        tokens = jnp.concatenate([tokens, self._budget_token(current_budget, n)], axis=1)

        tokens, masks = self.encoder(tokens, train=train,
                                     noise_value=noise_value,
                                     noise_rng=noise_rng)
        logits = self.head(jnp.sum(tokens[:, : self.num_class_tokens], axis=1))

        # image tokens only: strip class/register tokens and the budget token
        img_tokens = tokens[:, self.num_class_tokens + self.num_registers : -1]
        last_mask = masks[f"layer_{self.num_layers - 1}"]
        recon, recon_mask = self.decoder(img_tokens, last_mask, train=train)

        aux: Aux = {"masks": masks, "current_budget": current_budget}
        return (logits, recon, recon_mask), aux
