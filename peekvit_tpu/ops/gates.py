"""Differentiable discrete gates with straight-through estimators.

Contracts from reference models/blocks.py:14-69:

- GumbelSoftmax: train = hard gumbel-softmax (ST); eval = one-hot argmax of
  the raw logits (no noise).
- GumbelSigmoid: train = straight-through round(sigmoid((logits+g)/tau+bias));
  eval = round(sigmoid(logits)) — bias and temperature are *ignored* at eval
  (quirk preserved, blocks.py:57).
- SigmoidWithTemp: sigmoid(x/temp + bias), same train/eval.

All stochastic paths take explicit PRNG keys; straight-through uses
``jax.lax.stop_gradient``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gumbel_sigmoid(
    logits: jax.Array,
    rng: jax.Array,
    tau: float = 1.0,
    bias: float = 0.0,
    hard: bool = True,
) -> jax.Array:
    """Gumbel-sigmoid with straight-through rounding (train-time path)."""
    g = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.sigmoid((logits + g) / tau + bias)
    if hard:
        y_hard = jnp.round(y_soft)
        return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return y_soft


def hard_sigmoid_eval(logits: jax.Array) -> jax.Array:
    """Eval-time gate: round(sigmoid(x)). Reference blocks.py:57."""
    return jnp.round(jax.nn.sigmoid(logits))


def gumbel_softmax(
    logits: jax.Array,
    rng: Optional[jax.Array],
    tau: float = 1.0,
    hard: bool = True,
    axis: int = -1,
    train: bool = True,
) -> jax.Array:
    """torch.nn.functional.gumbel_softmax semantics + the reference's eval mode.

    Train: softmax((logits + Gumbel)/tau); if hard, one-hot(argmax) with ST.
    Eval (reference blocks.py:23-25): one-hot(argmax(logits)) — no noise.
    """
    if not train:
        idx = jnp.argmax(logits, axis=axis)
        return jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype)
    g = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if hard:
        idx = jnp.argmax(y_soft, axis=axis)
        y_hard = jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype)
        return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return y_soft


def sigmoid_with_temp(x: jax.Array, temp: float = 1.0, bias: float = 0.0) -> jax.Array:
    return jax.nn.sigmoid(x / temp + bias)


class GumbelSigmoid(nn.Module):
    """Train: ST gumbel-sigmoid; eval: round(sigmoid(x))."""

    hard: bool = True
    temp: float = 1.0
    bias: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if train:
            rng = self.make_rng("gumbel")
            return gumbel_sigmoid(x, rng, tau=self.temp, bias=self.bias, hard=self.hard)
        return hard_sigmoid_eval(x)


class GumbelSoftmax(nn.Module):
    hard: bool = True
    axis: int = -1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        rng = self.make_rng("gumbel") if train else None
        return gumbel_softmax(x, rng, hard=self.hard, axis=self.axis, train=train)


class SigmoidWithTemp(nn.Module):
    temp: float = 1.0
    bias: float = 0.0

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        del train  # same path in train and eval (reference blocks.py:62-69)
        return sigmoid_with_temp(x, self.temp, self.bias)
