"""Residual Vision Transformer: per-layer token gating with a budget token.

Behavioral contracts from reference models/residualvit.py:

- ResidualGate (residualvit.py:21-74): per-token scalar projection -> gate.
  gumbel: ST gumbel-sigmoid at train, round(sigmoid) at eval; never takes a
  budget. sigmoid: soft mask pushed toward {0,1} by ``relu(mask-(1-budget))``
  (":60-62"), or ``relu(mask-threshold)`` for fixed/learnable thresholds.
- Block skip modes (residualvit.py:130-244): 'attention', 'mlp',
  'attention+mlp' (the spec mode every shipped config uses) and plain. The
  'attention' and 'mlp' modes literally drop the final residual like the
  reference (SURVEY.md §7.6).
- Masked LayerNorm trick (residualvit.py:249-260): ``mask * ln(x)`` keeps
  zeroed tokens exactly zero through the block — load-bearing for accuracy
  parity AND for mask-aware FLOPs accounting. Ported exactly. Note gated
  tokens still participate in attention as (zero) keys — the reference does
  NOT mask attention, and neither do we.
- Budget token appended as the LAST sequence token (":552-585"): constant
  fill, 'learnable' (budget-scaled embedding) or 'learnable_interpolate'
  (lerp of two embeddings, appended as ONE token — fixing the reference's
  num_budget_tokens=2 bookkeeping bug, SURVEY.md §7.7).
- Per-sample budget sampling during training from list/float/interval
  (":541-550"); eval requires ``set_budget`` (":619-622").
- pos-emb added with budget token excluded (":335-348").
- Gate's budget input is ``budget_token.mean()`` over the whole batch — a
  scalar even with per-sample budgets (quirk preserved, ":208").

Deliberate fixes vs the reference (documented divergences):
- 'attention+mlp' without a budget token works here (the reference's
  hard-coded fwd_mask concat crashes); 'attention' with a budget token is
  rejected at construction (the reference crashes at runtime).
- ``random.choice`` AttributeError for list budgets (SURVEY.md §7.3) is
  fixed by explicit PRNG sampling.

Per-layer masks travel in ``aux['masks']`` (replacing ``self.mask`` side
channels read by utils/utils.py:100-122).
"""

from __future__ import annotations

from typing import Any, List, Literal, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from peekvit_tpu.ops.attention import SelfAttention
from peekvit_tpu.ops.gates import GumbelSigmoid, sigmoid_with_temp
from peekvit_tpu.ops.mlp import MLP
from peekvit_tpu.ops.noise import apply_noise
from peekvit_tpu.ops.patch_embed import PatchEmbed

Aux = dict


class ResidualGate(nn.Module):
    """Token gate: Dense(1) projection -> gumbel/sigmoid gate -> mask."""

    hidden_dim: int
    threshold: Union[float, str] = 0.5
    temp: float = 1.0
    gate_type: str = "gumbel"
    sigmoid_bias: float = 10.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        budget: Optional[jax.Array] = None,
        threshold: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        assert budget is None or threshold is None, "Cannot specify both budget and threshold"
        logits = nn.Dense(1, name="projection")(x)
        if self.gate_type == "gumbel":
            assert budget is None, "Gumbel gate does not support budget"
            return GumbelSigmoid(hard=True, temp=self.temp, bias=self.sigmoid_bias)(
                logits, train=train
            )
        if self.gate_type != "sigmoid":
            raise ValueError(f"Unknown gate type {self.gate_type}")
        mask = sigmoid_with_temp(logits, self.temp, self.sigmoid_bias)
        if budget is not None:
            return nn.relu(mask - (1.0 - budget))
        if threshold is not None:
            return nn.relu(mask - threshold)
        if self.threshold == "learnable":
            thr = self.param("threshold", nn.initializers.constant(0.5), ())
        else:
            thr = self.threshold
        return nn.relu(mask - thr)


class ResidualViTBlock(nn.Module):
    """Gated transformer block (reference residualvit.py:81-273). LN eps 1e-6."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    temp: float = 1.0
    add_input: bool = False
    num_class_tokens: int = 1
    num_registers: int = 0
    skip: Optional[str] = None  # 'attention' | 'mlp' | 'attention+mlp' | None
    gate_type: str = "gumbel"
    gate_bias: float = 10.0
    gate_threshold: Union[float, str] = 0.5
    budget_token: Any = False  # truthy iff a budget token rides the sequence
    ln_eps: float = 1e-6

    @property
    def num_special_tokens(self) -> int:
        return self.num_class_tokens + self.num_registers

    def setup(self):
        if self.skip in ("attention", "mlp", "attention+mlp"):
            self.residual_gate = ResidualGate(
                self.hidden_dim,
                threshold=self.gate_threshold,
                temp=self.temp,
                gate_type=self.gate_type,
                sigmoid_bias=self.gate_bias,
                name="residual_gate",
            )
        if self.skip == "attention" and self.budget_token:
            raise ValueError(
                "skip='attention' with a budget token is inconsistent in the "
                "spec (reference crashes); use 'attention+mlp'."
            )
        self.ln_1 = nn.LayerNorm(epsilon=self.ln_eps, name="ln_1")
        self.self_attention = SelfAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout, name="self_attention"
        )
        self.ln_2 = nn.LayerNorm(epsilon=self.ln_eps, name="ln_2")
        self.mlp = MLP(self.hidden_dim, self.mlp_dim, name="mlp")
        self.dropout_layer = nn.Dropout(self.dropout)
        if self.budget_token == "learnable":
            self.budget_token_gate = nn.Dense(1, name="budget_token_gate")

    # ---- helpers ------------------------------------------------------

    def _split(self, tokens: jax.Array):
        """-> (special, img, budget_token|None)."""
        s = self.num_special_tokens
        special = tokens[:, :s]
        rest = tokens[:, s:]
        if self.budget_token:
            return special, rest[:, :-1], rest[:, -1:]
        return special, rest, None

    def _gate(self, img_tokens, budget_token, *, train: bool):
        """Run the gate exactly as the reference dispatches budget/threshold."""
        current_budget, threshold = None, None
        if self.budget_token:
            # scalar mean over the whole batch (quirk, residualvit.py:208)
            current_budget = jnp.mean(budget_token)
        if self.budget_token == "learnable":
            threshold = jax.nn.sigmoid(self.budget_token_gate(budget_token))
            current_budget = None
        return self.residual_gate(
            img_tokens, budget=current_budget, threshold=threshold, train=train
        )

    def _attn(self, x, *, train):
        return self.self_attention(x, deterministic=not train)

    def _drop(self, x, *, train):
        return self.dropout_layer(x, deterministic=not train)

    # ---- forward modes (reference residualvit.py:130-273) --------------

    def plain_forward(self, tokens, mask=None, *, train=False):
        m = 1.0 if mask is None else mask
        x = m * self.ln_1(tokens)
        x = m * self._attn(x, train=train)
        x = self._drop(x, train=train)
        x = x + tokens
        y = m * self.ln_2(x)
        y = self.mlp(y)
        return x + y

    def forward_skip_attention(self, tokens, *, train=False):
        special, img, _ = self._split(tokens)
        mask = self._gate(img, None, train=train)
        masked_input = jnp.concatenate([special, mask * img], axis=1)
        x = self.ln_1(masked_input)
        x = self._attn(x, train=train)
        x = self._drop(x, train=train)
        x = x + tokens
        y = self.ln_2(x)
        y = self.mlp(y)
        return y, mask  # literal: final residual dropped (SURVEY.md §7.6)

    def forward_skip_mlp(self, tokens, *, train=False):
        x = self.ln_1(tokens)
        x = self._attn(x, train=train)
        x = self._drop(x, train=train)
        x = x + tokens
        special, img, budget_token = self._split(x)
        mask = self._gate(img, budget_token, train=train)
        masked_input = jnp.concatenate([special, mask * img], axis=1)
        if self.budget_token:
            masked_input = jnp.concatenate([masked_input, budget_token], axis=1)
        y = self.ln_2(masked_input)
        y = self.mlp(y)
        if self.add_input:
            pad = [jnp.zeros_like(special), (1.0 - mask) * img]
            if self.budget_token:
                pad.append(jnp.zeros_like(budget_token))
            y = y + jnp.concatenate(pad, axis=1)
        return y, mask  # literal: 'x +' residual dropped

    def forward_skip_attention_mlp(self, tokens, *, train=False):
        special, img, budget_token = self._split(tokens)
        mask = self._gate(img, budget_token, train=train)
        masked_input = jnp.concatenate([special, mask * img], axis=1)
        if self.budget_token:
            masked_input = jnp.concatenate([masked_input, budget_token], axis=1)
        ones = lambda k: jnp.ones((mask.shape[0], k, 1), mask.dtype)
        fwd_parts = [ones(self.num_special_tokens), mask]
        if self.budget_token:
            fwd_parts.append(ones(1))
        fwd_mask = jnp.concatenate(fwd_parts, axis=1)
        y = self.plain_forward(masked_input, mask=fwd_mask, train=train)
        if self.add_input:
            pad = [jnp.zeros_like(special), (1.0 - mask) * img]
            if self.budget_token:
                pad.append(jnp.zeros_like(budget_token))
            y = y + jnp.concatenate(pad, axis=1)
        return y, mask

    def __call__(self, tokens: jax.Array, *, train: bool = False):
        """-> (tokens, mask|None). mask is (B, N_img, 1)."""
        if self.skip == "attention":
            return self.forward_skip_attention(tokens, train=train)
        if self.skip == "mlp":
            return self.forward_skip_mlp(tokens, train=train)
        if self.skip == "attention+mlp":
            return self.forward_skip_attention_mlp(tokens, train=train)
        return self.plain_forward(tokens, train=train), None


class ResidualViTEncoder(nn.Module):
    """Pos-emb (budget token excluded) + gated blocks + final LN
    (reference residualvit.py:278-348)."""

    seq_length: int  # WITHOUT budget token
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
            tokens = tokens[:, :-1] + pos
            tokens = jnp.concatenate([tokens, budget_tokens], axis=1)
        else:
            tokens = tokens + pos
        tokens = nn.Dropout(self.dropout, deterministic=not train)(tokens)

        residual_layers = self.residual_layers or ["attention+mlp"] * self.num_layers
        masks = {}
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
        return nn.LayerNorm(epsilon=1e-5, name="ln")(tokens), masks


class ResidualVisionTransformer(nn.Module):
    """ResidualViT classifier. Returns (logits, aux) with aux['masks'],
    aux['current_budget']."""

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
    budget_interval: tuple = (0, 1)
    noise_layer: Optional[int] = None
    noise_type: str = "gaussian"

    accepts_budget: bool = True

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
        self.encoder = ResidualViTEncoder(
            seq_length,
            self.num_layers,
            self.num_heads,
            self.hidden_dim,
            self.mlp_dim,
            self.dropout,
            self.attention_dropout,
            residual_layers=tuple(self.residual_layers)
            if self.residual_layers
            else None,
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
                "learnable_budget_token_1",
                nn.initializers.normal(stddev=1.0),
                (1, 1, self.hidden_dim),
            )
        if self.add_budget_token == "learnable_interpolate":
            self.learnable_budget_token_2 = self.param(
                "learnable_budget_token_2",
                nn.initializers.normal(stddev=1.0),
                (1, 1, self.hidden_dim),
            )
        self.head = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )

    def _sample_budget(self, n: int) -> jax.Array:
        """Per-sample training budgets (reference residualvit.py:541-550)."""
        if isinstance(self.add_budget_token, float):
            return jnp.full((n,), self.add_budget_token, jnp.float32)
        rng = self.make_rng("budget")
        if isinstance(self.add_budget_token, (list, tuple)):
            opts = jnp.asarray(self.add_budget_token, jnp.float32)
            return jax.random.choice(rng, opts, shape=(n,))
        lo, hi = self.budget_interval
        return jax.random.uniform(rng, (n,), jnp.float32) * (hi - lo) + lo

    def _budget_token(self, budget_vec: jax.Array) -> jax.Array:
        """(B,) budgets -> (B, 1, D) budget token (residualvit.py:552-585)."""
        b = budget_vec[:, None, None]
        if self.add_budget_token == "learnable":
            return self.learnable_budget_token_1 * b
        if self.add_budget_token == "learnable_interpolate":
            return self.learnable_budget_token_1 * b + self.learnable_budget_token_2 * (1.0 - b)
        return jnp.full(
            (budget_vec.shape[0], 1, self.hidden_dim), 0.0, jnp.float32
        ) + b

    def embed(self, x: jax.Array) -> jax.Array:
        n = x.shape[0]
        x = self.conv_proj(x)
        if self.num_registers > 0:
            x = jnp.concatenate(
                [jnp.broadcast_to(self.register_tokens, (n, self.num_registers, self.hidden_dim)), x],
                axis=1,
            )
        cls = jnp.broadcast_to(self.class_tokens, (n, self.num_class_tokens, self.hidden_dim))
        return jnp.concatenate([cls, x], axis=1)

    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        budget: Optional[jax.Array] = None,
        noise_value: Optional[jax.Array] = None,
        noise_rng: Optional[jax.Array] = None,
    ):
        tokens = self.embed(x)
        n = tokens.shape[0]
        current_budget = None
        if self.add_budget_token:
            if train and budget is None:
                current_budget = self._sample_budget(n)
            elif train:
                # training.train_budget: fixed budget during training
                # (reference train.py:102-104, with the typo fixed — §7.2)
                current_budget = jnp.broadcast_to(
                    jnp.asarray(budget, jnp.float32), (n,)
                )
            else:
                if budget is None:
                    raise ValueError(
                        "Budget not set. Call set_budget() (or pass budget=) "
                        "before evaluating this model."
                    )
                current_budget = jnp.broadcast_to(
                    jnp.asarray(budget, jnp.float32), (n,)
                )
            tokens = jnp.concatenate(
                [tokens, self._budget_token(current_budget)], axis=1
            )
        tokens, masks = self.encoder(tokens, train=train,
                                     noise_value=noise_value,
                                     noise_rng=noise_rng)
        logits = self.head(jnp.sum(tokens[:, : self.num_class_tokens], axis=1))
        aux: Aux = {"masks": masks}
        if current_budget is not None:
            aux["current_budget"] = current_budget
        return logits, aux
