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

Two activation grids, matching the two engine modes:

- **dynamic** (default): symmetric per-token abs-max scales —
  ``_quant_rows(x)``.
- **static caps** (``fake_quant(True, caps=...)``): fixed calibrated
  scale ``cap/127`` per quantized site with saturation at the cap —
  ``_quant_rows(x, cap)``, the engine's ``calib_static_caps=True`` mode.
  ``caps`` is the engine's calibration structure
  (inference.collect_activation_caps): one
  ``((attn_ln, attn_out), (mlp_ln, mlp_h))`` tuple per encoder layer.
  The hooks fire in layer order during tracing, so per-site counters
  assign the layer index; models whose quantized matmuls are not
  exactly the four encoder-layer sites (e.g. MAE's decoder blocks, MoE
  expert stacks) fail the consumption check with a clear error.
  Clipped-STE gradients: identity inside ``|x| <= cap``, zero where the
  engine would saturate (PACT-style; a saturated activation's gradient
  cannot reach the weight through a clipped value).

Both grids optionally compose with **SmoothQuant equalization**
(``fake_quant(smoothing=...)``): at the two LN-output sites the hook
fake-quantizes ``(x / s, w * s)`` — exact in fp for the matmul product,
but the quantization grid becomes the one the engine's default
``calib_images=`` mode bakes into its weights
(inference.smooth_vit_params), so QAT trains against the grid that is
actually served (round 5, VERDICT r4 #7;
inference.collect_qat_calibration returns the matched caps+smoothing
pair).

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
_CAPS = None
_SMOOTH = None
_SITE_IDX = None

# site name -> index into the per-layer ((a1, a2), (m1, m2)) caps tuple
_SITE_SLOT = {"qkv": (0, 0), "out": (0, 1), "fc1": (1, 0), "fc2": (1, 1)}
# SmoothQuant equalization applies only at the two LN-OUTPUT sites (the
# engine bakes s into the LN affine + the following weight's rows:
# inference.smooth_vit_params); 'out'/'fc2' inputs are not LN outputs.
_SITE_SMOOTH = {"qkv": 0, "fc1": 1}


def enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def fake_quant(on: bool = True, caps=None, smoothing=None):
    """Enable fake quantization for model applies TRACED in this block.

    ``caps``: optional static calibration tuple (one
    ``((attn_ln, attn_out), (mlp_ln, mlp_h))`` per encoder layer, from
    inference.collect_activation_caps / the residual stats collector).
    With caps the activation grid is the static-caps engine's; without,
    the dynamic per-token engine's.

    ``smoothing``: optional per-layer ``(s1, s2)`` SmoothQuant
    equalization vectors (inference.compute_smoothing_vectors / the
    residual stats collector). At the two LN-output sites the hook then
    fake-quantizes ``x / s`` against ``w * s`` — the exact-in-fp
    transform the engine bakes into its weights at calibration
    (inference.smooth_vit_params), so training sees the SMOOTHED grid
    the engine's default ``calib_images=`` mode actually serves
    (VERDICT r4 #7). Composes with ``caps`` (collect them on the
    smoothed model: inference.collect_qat_calibration).
    """
    global _ENABLED, _CAPS, _SMOOTH, _SITE_IDX
    prev = (_ENABLED, _CAPS, _SMOOTH, _SITE_IDX)
    _ENABLED = bool(on)
    _CAPS = tuple(caps) if (on and caps is not None) else None
    _SMOOTH = tuple(smoothing) if (on and smoothing is not None) else None
    if _CAPS is not None and _SMOOTH is not None \
            and len(_CAPS) != len(_SMOOTH):
        _ENABLED, _CAPS, _SMOOTH, _SITE_IDX = prev
        raise ValueError(
            f"fake_quant: caps cover {len(caps)} layers but smoothing "
            f"covers {len(smoothing)} — calibrate both on the same model "
            "(inference.collect_qat_calibration returns a matched pair)")
    _SITE_IDX = ({s: 0 for s in _SITE_SLOT}
                 if (_CAPS is not None or _SMOOTH is not None) else None)
    try:
        yield
        if _SITE_IDX is not None:
            n = len(_CAPS) if _CAPS is not None else len(_SMOOTH)
            used = set(_SITE_IDX.values())
            # The context wraps the model apply at TRACE time (inside the
            # Trainer's jitted loss), so whenever this block actually ran
            # the hooks must have fired: zero consumption means the traced
            # forward never reached the maybe_fq sites (e.g. a Pallas
            # path without hooks) and would silently train UNQUANTIZED
            # (ADVICE r4 #3 — {0} is an error, not a cache-hit artifact:
            # on a jit cache hit the wrapped body never executes at all).
            if used != {n}:
                raise ValueError(
                    "static-caps/smoothed QAT consumed caps unevenly "
                    f"(per-site counts {_SITE_IDX}, {n} layer entries): "
                    "the model's quantized matmuls are not exactly the four "
                    "encoder-layer sites the calibration covers "
                    "(supported: plain/Rank/Residual ViT encoders)")
    finally:
        _ENABLED, _CAPS, _SMOOTH, _SITE_IDX = prev


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


def fq_act(x: jax.Array, cap=None) -> jax.Array:
    """dequant(quant(x)) on the engine's activation grid.

    ``cap=None``: symmetric int8 per ROW/token, dynamic abs-max
    (quant_blocks._quant_rows), identity STE. ``cap=<float>``: the
    static-caps engine grid — fixed scale cap/127, saturating clip,
    clipped STE (gradient zero where the engine saturates)."""
    xf = x.astype(jnp.float32)
    if cap is not None:
        s = jnp.maximum(jnp.asarray(cap, jnp.float32), 1e-12) / 127.0
        q = jnp.clip(jnp.round(xf / s), -127, 127) * s
        inside = xf * (jnp.abs(xf) <= s * 127.0).astype(jnp.float32)
        out = inside + jax.lax.stop_gradient(q - inside)
        return out.astype(x.dtype)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127) * s
    return _ste(xf, q).astype(x.dtype)


def maybe_fq(x: jax.Array, w: jax.Array, site: str | None = None):
    """(x, w) fake-quantized when QAT is on, unchanged otherwise. Called
    at the exact matmuls the int8 engine quantizes: qkv / out-proj
    (ops/attention.py, sites 'qkv'/'out') and fc1 / fc2 (ops/mlp.py,
    sites 'fc1'/'fc2'). Under static caps / smoothing the per-site call
    order during tracing assigns the layer index (encoder layers trace
    in order in every model family).

    With smoothing, the LN-output sites fake-quantize the equalized pair
    ``(x / s, w * s)`` — exact in fp for the product, but the quant grid
    becomes the smoothed engine's (see :func:`fake_quant`)."""
    if not _ENABLED:
        return x, w
    cap = None
    if _SITE_IDX is not None and site is not None:
        n = len(_CAPS) if _CAPS is not None else len(_SMOOTH)
        i = _SITE_IDX[site]
        if i >= n:
            raise ValueError(
                f"static-caps/smoothed QAT: site '{site}' traced more than "
                f"the {n} calibrated encoder layers — the model has "
                "quantized matmuls outside the encoder stack (supported: "
                "plain/Rank/Residual ViT encoders)")
        _SITE_IDX[site] = i + 1
        if _CAPS is not None:
            a, b = _SITE_SLOT[site]
            cap = _CAPS[i][a][b]
        if _SMOOTH is not None and site in _SITE_SMOOTH:
            s = jnp.asarray(_SMOOTH[i][_SITE_SMOOTH[site]], jnp.float32)
            x = (x.astype(jnp.float32) / s).astype(x.dtype)
            w = (w.astype(jnp.float32) * s[:, None]).astype(w.dtype)
    return fq_act(x, cap), fq_weight(w)
