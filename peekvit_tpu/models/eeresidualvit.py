"""ResidualViT with per-layer early-exit heads (reference models/eeresidualvit.py).

Contract: each layer gets an LN->Linear exit head over the class tokens
(eeresidualvit.py:75-76); forward returns ``[exit_0 .. exit_{L-1}, final]``
(":91-96,356-358"). Budget token logic mirrors the EncDec/EE variant:
ONE budget per batch sampled via randint/rand (":254-327") — not per-sample
like ResidualVisionTransformer.

Output format: primary output is the tuple of logits (exits + final); the
harness reads ``module.output_format == 'early_exits'``. Per-layer masks in
``aux['masks']``.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.models.residualvit import ResidualViTBlock
from peekvit_tpu.ops.noise import apply_noise
from peekvit_tpu.ops.patch_embed import PatchEmbed

Aux = dict


class EEResidualViTEncoder(nn.Module):
    """Gated blocks + per-layer early-exit heads (reference :17-96)."""

    seq_length: int  # without budget token
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    residual_layers: Optional[tuple] = None
    add_input: bool = False
    num_class_tokens: int = 1
    num_registers: int = 0
    gate_type: str = "gumbel"
    gate_temp: float = 1.0
    gate_bias: float = 10.0
    gate_threshold: Union[float, str] = 0.5
    budget_token: Any = False
    num_classes: int = 10
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
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
        if self.budget_token:
            budget_tokens = tokens[:, -1:]
            tokens = jnp.concatenate([tokens[:, :-1] + pos, budget_tokens], axis=1)
        else:
            tokens = tokens + pos
        tokens = nn.Dropout(self.dropout, deterministic=not train)(tokens)

        residual_layers = self.residual_layers or ("attention+mlp",) * self.num_layers
        masks, early_exits = {}, []
        for i in range(self.num_layers):
            if self.noise_layer is not None and i == self.noise_layer:
                tokens = apply_noise(
                    tokens,
                    self.noise_type,
                    0.0 if noise_value is None else noise_value,
                    noise_rng if noise_rng is not None
                    else self.make_rng("noise"),
                )
            tokens, mask = ResidualViTBlock(
                self.num_heads,
                self.hidden_dim,
                self.mlp_dim,
                self.dropout,
                self.attention_dropout,
                temp=self.gate_temp,
                add_input=self.add_input,
                num_class_tokens=self.num_class_tokens,
                num_registers=self.num_registers,
                skip=residual_layers[i],
                gate_type=self.gate_type,
                gate_bias=self.gate_bias,
                gate_threshold=self.gate_threshold,
                budget_token=self.budget_token,
                name=f"layers_{i}",
            )(tokens, train=train)
            if mask is not None:
                masks[f"layer_{i}"] = mask
            # LN -> Linear exit head on the class tokens (reference :75-76,94).
            # Explicit child names: nn.Sequential of inline modules does NOT
            # scope its children (they auto-number under the ENCODER as
            # LayerNorm_i/Dense_i), which breaks engine/adapters addressing.
            cls = tokens[:, : self.num_class_tokens]
            cls = nn.LayerNorm(epsilon=1e-5,
                               name=f"early_exit_heads_{i}_ln")(cls)
            cls = nn.Dense(self.num_classes,
                           name=f"early_exit_heads_{i}_head")(cls)
            early_exits.append(jnp.squeeze(cls, axis=1))
        return nn.LayerNorm(epsilon=1e-5, name="ln")(tokens), early_exits, masks


class EEResidualVisionTransformer(nn.Module):
    """Early-exit ResidualViT. Primary output = tuple(exits..., final)."""

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
    add_budget_token: Any = False
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    accepts_budget: bool = True
    output_format: str = "early_exits"

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
        self.encoder = EEResidualViTEncoder(
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
            num_classes=self.num_classes,
            noise_layer=self.noise_layer,
            noise_type=self.noise_type,
        )
        if self.add_budget_token in ("learnable", "learnable_interpolate"):
            self.learnable_budget_token_1 = self.param(
                "learnable_budget_token_1", nn.initializers.normal(stddev=1.0),
                (1, 1, self.hidden_dim),
            )
            # reference allocates token_2 for both learnable modes (:217-219)
            self.learnable_budget_token_2 = self.param(
                "learnable_budget_token_2", nn.initializers.normal(stddev=1.0),
                (1, 1, self.hidden_dim),
            )
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )

    def _sample_budget(self) -> jax.Array:
        """ONE budget per batch (reference eeresidualvit.py:271-289)."""
        if isinstance(self.add_budget_token, float):
            return jnp.float32(self.add_budget_token)
        rng = self.make_rng("budget")
        if isinstance(self.add_budget_token, (list, tuple)):
            opts = jnp.asarray(self.add_budget_token, jnp.float32)
            return jax.random.choice(rng, opts)
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
        current_budget = None
        if self.add_budget_token:
            if train:
                current_budget = self._sample_budget()
            else:
                if budget is None:
                    raise ValueError(
                        "Budget not set. Call set_budget() before evaluating."
                    )
                current_budget = jnp.asarray(budget, jnp.float32)
            tokens = jnp.concatenate(
                [tokens, self._budget_token(current_budget, n)], axis=1
            )
        tokens, early_exits, masks = self.encoder(
            tokens, train=train, noise_value=noise_value, noise_rng=noise_rng
        )
        final = self.head(jnp.sum(tokens[:, : self.num_class_tokens], axis=1))
        outs = tuple(early_exits) + (final,)
        aux: Aux = {"masks": masks}
        if current_budget is not None:
            aux["current_budget"] = current_budget
        return outs, aux
