"""Quantization-aware training: straight-through fake quantization.

The int8 serving engines (inference.py ``quantized=True``) round weights
to per-output-column int8 and activations to per-token dynamic int8
(ops/pallas/quant_blocks.py ``quantize_linear`` / ``_quant_rows``).
Post-training quantization of a model never trained to tolerate that
rounding costs top-1 agreement (BASELINE.md: 0.89-0.93 vs fp32 on the
outlier fixture). QAT closes the gap at the source: during fine-tuning
every engine-quantized matmul sees ``dequant(quant(.))`` of both
operands on EXACTLY the engine's grid, with the straight-through
estimator (Bengio et al. 2013; standard LSQ-style QAT) letting
gradients flow through the rounding as identity — the weights learn to
sit on representable points and to shrink the activation error the int8
engine will later commit for real.

Enabled as a TRACE-TIME switch (the :func:`fake_quant` context manager
wraps the model apply inside the Trainer's loss/eval fns — same
precedent as ops.attention.set_attention_impl): zero cost when off, no
model-code threading. The reference has no quantization of any kind;
this subsystem is TPU-native scope (int8 is the >roofline serving path,
BASELINE.md).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_ENABLED = False


def enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def fake_quant(on: bool = True):
    """Enable fake quantization for model applies TRACED in this block."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = bool(on)
    try:
        yield
    finally:
        _ENABLED = prev


def _ste(x32, q):
    """Straight-through: forward q, gradient identity."""
    return x32 + jax.lax.stop_gradient(q - x32)


def fq_weight(w: jax.Array) -> jax.Array:
    """dequant(quant(w)) on the engine's weight grid — symmetric int8 per
    OUTPUT COLUMN (quant_blocks.quantize_linear), STE gradient."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127) * s
    return _ste(wf, q).astype(w.dtype)


def fq_act(x: jax.Array) -> jax.Array:
    """dequant(quant(x)) on the engine's activation grid — symmetric int8
    per ROW/token, dynamic abs-max (quant_blocks._quant_rows), STE."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127) * s
    return _ste(xf, q).astype(x.dtype)


def maybe_fq(x: jax.Array, w: jax.Array):
    """(x, w) fake-quantized when QAT is on, unchanged otherwise. Called
    at the exact matmuls the int8 engine quantizes: qkv / out-proj
    (ops/attention.py) and fc1 / fc2 (ops/mlp.py)."""
    if not _ENABLED:
        return x, w
    return fq_act(x), fq_weight(w)
