"""Multi-head self-attention.

Numerically matches ``torch.nn.MultiheadAttention(batch_first=True)`` as the
reference wraps it (reference: models/blocks.py:88-95): packed qkv input
projection, query scaled by 1/sqrt(head_dim), softmax over keys in fp32,
optional dropout on the attention weights, output projection.

Parameters are stored jax-style:
  in_proj/kernel  : (D, 3D)   (= torch ``in_proj_weight.T``)
  in_proj/bias    : (3D,)
  out_proj/kernel : (D, D)    (= torch ``out_proj.weight.T``)
  out_proj/bias   : (D,)

The pure function :func:`multi_head_attention` is the single source of truth;
the linen module :class:`SelfAttention` wraps it. A Pallas fused kernel can be
selected globally via :func:`set_attention_impl` — it must be numerically
interchangeable (parity-tested in tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Global switch: "xla" (pure jnp, default) or "pallas" (fused TPU kernel).
_ATTENTION_IMPL = "xla"


def set_attention_impl(name: str) -> None:
    global _ATTENTION_IMPL
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown attention impl {name!r}")
    _ATTENTION_IMPL = name


def get_attention_impl() -> str:
    return _ATTENTION_IMPL


def qkv_projection(x: jax.Array, kernel: jax.Array, bias: jax.Array):
    """Packed qkv projection. x: (B, N, D) -> q, k, v each (B, N, D)."""
    d = x.shape[-1]
    qkv = jnp.einsum("bnd,de->bne", x, kernel) + bias
    return qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]


def attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    key_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention over heads.

    q/k/v: (B, N, D). key_mask: optional (B, N) with 1 = attend, 0 = exclude
    (additive -inf masking of keys). Returns (B, N, D).
    """
    b, n, d = q.shape
    head_dim = d // num_heads
    # (B, N, H, hd)
    q = q.reshape(b, n, num_heads, head_dim)
    k = k.reshape(b, k.shape[1], num_heads, head_dim)
    v = v.reshape(b, v.shape[1], num_heads, head_dim)

    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale

    if key_mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=logits.dtype)
        logits = jnp.where(key_mask[:, None, None, :] > 0, logits, neg)

    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)

    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)

    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out.reshape(b, n, d)


def multi_head_attention(
    x: jax.Array,
    params: dict,
    num_heads: int,
    *,
    key_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Full MHSA: packed qkv proj -> attention -> out proj. x: (B, N, D)."""
    # The fused inference kernel has no differentiation rule and uses the
    # inference-only clamped softmax, so it is gated on `deterministic`
    # (not merely dropout_rate == 0.0): training forwards always take the
    # differentiable XLA path (or the custom-VJP kernel via the fused
    # training blocks in ops/pallas/fused_attention_vjp.py).
    # QAT hook (ops/fake_quant.py): identity unless this forward is traced
    # under ``with fake_quant(True)`` — then the qkv and out-proj matmuls
    # see int8-grid fake-quantized operands (STE), matching the engine's
    # quantization points (inference.vit_forward_quant).
    from peekvit_tpu.ops.fake_quant import maybe_fq

    if _ATTENTION_IMPL == "pallas" and key_mask is None and deterministic:
        from peekvit_tpu.ops.pallas.fused_attention import fused_mhsa

        xq, wq = maybe_fq(x, params["in_proj"]["kernel"], site="qkv")
        qkv = jnp.einsum("bnd,de->bne", xq, wq) + params["in_proj"]["bias"]
        out = fused_mhsa(qkv, num_heads, jax.default_backend() != "tpu")
    else:
        xq, wq = maybe_fq(x, params["in_proj"]["kernel"], site="qkv")
        q, k, v = qkv_projection(xq, wq, params["in_proj"]["bias"])
        out = attention_core(
            q,
            k,
            v,
            num_heads,
            key_mask=key_mask,
            dropout_rate=dropout_rate,
            deterministic=deterministic,
            dropout_rng=dropout_rng,
        )
    oq, wo = maybe_fq(out, params["out_proj"]["kernel"], site="out")
    return jnp.einsum("bnd,de->bne", oq, wo) + params["out_proj"]["bias"]


class SelfAttention(nn.Module):
    """Linen wrapper. Mirrors reference models/blocks.py:88-95.

    Param layout intentionally mirrors the torch key grammar so checkpoint
    adapters are mechanical:
      self_attention.in_proj_weight -> in_proj/kernel (transposed)
    """

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        key_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        d = self.hidden_dim
        # torch nn.MultiheadAttention init: xavier_uniform on in_proj_weight,
        # constant 0 on biases, xavier-ish on out_proj.
        in_proj = {
            "kernel": self.param(
                "in_proj_kernel", nn.initializers.xavier_uniform(), (d, 3 * d)
            ),
            "bias": self.param("in_proj_bias", nn.initializers.zeros, (3 * d,)),
        }
        out_proj = {
            "kernel": self.param(
                "out_proj_kernel", nn.initializers.xavier_uniform(), (d, d)
            ),
            "bias": self.param("out_proj_bias", nn.initializers.zeros, (d,)),
        }
        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        return multi_head_attention(
            x,
            {"in_proj": in_proj, "out_proj": out_proj},
            self.num_heads,
            key_mask=key_mask,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dropout_rng=rng,
        )
