"""Patch embedding as a reshaped matmul (MXU-friendly).

The reference uses ``nn.Conv2d(3, D, kernel=P, stride=P)`` (reference:
models/vit.py:160,203-222). A stride-P conv with a PxP kernel over
non-overlapping patches is exactly a matmul of flattened patches with the
flattened kernel — on TPU we express it that way so XLA tiles one large
(B*N, P*P*C) x (P*P*C, D) matmul onto the MXU instead of lowering a conv.

Images are NHWC (TPU-native layout); the torch->jax adapter converts
OIHW conv kernels to the (P*P*C, D) matrix with matching patch-pixel order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def extract_patches(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, N, P*P*C) with N = (H/P)*(W/P).

    Patch pixel order is (row, col, channel) within the patch — the adapter
    reshapes torch (D, C, P, P) kernels to match (see adapters.py).
    """
    b, h, w, c = x.shape
    p = patch_size
    nh, nw = h // p, w // p
    x = x.reshape(b, nh, p, nw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, p, p, c)
    return x.reshape(b, nh * nw, p * p * c)


def patch_embed(x: jax.Array, kernel: jax.Array, bias: jax.Array, patch_size: int) -> jax.Array:
    """x: (B, H, W, C); kernel: (P*P*C, D); bias: (D,). Returns (B, N, D)."""
    patches = extract_patches(x, patch_size)
    return jnp.einsum("bnp,pd->bnd", patches, kernel) + bias


class PatchEmbed(nn.Module):
    """Conv patch-embed expressed as a matmul.

    Init matches reference models/vit.py:191-194: trunc_normal with
    std=sqrt(1/fan_in) where fan_in = C*P*P, zero bias.
    """

    hidden_dim: int
    patch_size: int
    in_channels: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = self.in_channels * self.patch_size * self.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=(1.0 / fan_in) ** 0.5),
            (fan_in, self.hidden_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.hidden_dim,))
        return patch_embed(x, kernel, bias, self.patch_size)
