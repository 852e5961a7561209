"""Channel-noise injection ops (the reference's only fault-injection subsystem).

Contracts from reference models/blocks.py:100-186 (NoiseBlock):

- gaussian SNR: noise power = signal_power / 10^(snr_db/10); **snr_db == 0 is
  the no-noise sentinel** (blocks.py:124-126), not infinite noise.
- token_drop: zero ``int(prob * seq_len)`` tokens chosen by one random
  permutation **shared across the batch** (blocks.py:149-153).
- the whole op runs under no-grad (blocks.py:157) -> stop_gradient.

``value`` (snr or prob) is a traced scalar so eval-time noise sweeps do not
recompile. token_drop keeps a static shape by building a keep-mask from a
permuted iota compared against ``num_mask``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_snr_noise(x: jax.Array, snr_db: jax.Array, rng: jax.Array) -> jax.Array:
    """Add Gaussian noise at the given SNR (dB). snr_db == 0 -> identity."""
    snr_db = jnp.asarray(snr_db, dtype=jnp.float32)
    signal_power = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    noise_power = signal_power / (10.0 ** (snr_db / 10.0))
    std = jnp.sqrt(noise_power)
    std = jnp.where(snr_db == 0.0, 0.0, std)  # 0 dB is the no-noise sentinel
    noise = jax.random.normal(rng, x.shape, dtype=jnp.float32) * std
    return x + jax.lax.stop_gradient(noise.astype(x.dtype))


def token_drop_noise(x: jax.Array, prob: jax.Array, rng: jax.Array) -> jax.Array:
    """Zero a random fraction of tokens, same token indices for the whole batch."""
    n = x.shape[1]
    prob = jnp.asarray(prob, dtype=jnp.float32)
    num_mask = jnp.floor(prob * n).astype(jnp.int32)  # int(prob * seq) truncates
    perm = jax.random.permutation(rng, n)
    # token i is dropped iff its position in the permutation is < num_mask
    drop_rank = jnp.argsort(perm)
    keep = (drop_rank >= num_mask).astype(x.dtype)[None, :, None]
    return x * jax.lax.stop_gradient(keep)


def apply_noise(
    x: jax.Array, noise_type: str, value: jax.Array, rng: jax.Array
) -> jax.Array:
    """Dispatch on static noise_type ('gaussian' | 'token_drop')."""
    if noise_type == "gaussian":
        return gaussian_snr_noise(x, value, rng)
    if noise_type == "token_drop":
        return token_drop_noise(x, value, rng)
    raise ValueError(f"unknown noise_type {noise_type!r}")
