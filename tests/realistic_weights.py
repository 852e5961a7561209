"""Pretrained-like ViT weight fixture with OUTLIER CHANNELS (VERDICT r2 #4).

Zero egress blocks real pretrained weights, but the failure mode that
matters for the w8a8 engines and the clamped no-max softmax is well
documented in the quantization literature (LLM.int8 / ViT-PTQ surveys, see
PAPERS.md): pretrained transformers concentrate large activations in a
small, LAYER-PERSISTENT set of embedding channels — the residual stream
carries outliers 10-100x the typical magnitude, which dynamic per-token
int8 scales then squash. Random-init weights (std 0.02) never show this,
so round-2's engine validation proved nothing about real checkpoints.

``make_outlier_vit_params`` turns any freshly-built ViT param tree into a
fixture with that statistic: a fixed set of channels gets amplified
residual writes in EVERY layer (out-proj and fc2 columns), LN scales get
mild spread, and the head is non-degenerate. ``outlier_ratio`` measures
max|residual activation| / 99th percentile at the encoder output so tests
can assert the fixture actually exhibits >=10x outliers rather than
assuming it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


OUTLIER_CHANNELS = (7, 133, 421, 555, 700)  # fixed, layer-persistent


def make_outlier_vit_params(params, seed: int = 0, amp: float = 12.0):
    """Return a copy of a ViT param tree with pretrained-like outlier
    channels. Works for any tree with encoder.layers_i blocks (ViT,
    RankViT share the layout)."""
    rng = np.random.default_rng(seed)
    params = jax.tree.map(lambda x: np.array(x, np.float32), params)
    d = params["encoder"]["pos_embedding"].shape[-1]
    ch = [c for c in OUTLIER_CHANNELS if c < d]

    params["head"]["kernel"] = rng.normal(
        0, 0.02, params["head"]["kernel"].shape).astype(np.float32)
    params["head"]["bias"][:] = 0.0
    params["class_tokens"] = rng.normal(
        0, 0.02, params["class_tokens"].shape).astype(np.float32)

    for name, lp in params["encoder"].items():
        if not name.startswith("layers_"):
            continue
        # amplified residual writes into the SAME channels every layer
        lp["self_attention"]["out_proj_kernel"][:, ch] *= amp
        lp["mlp"]["fc2_kernel"][:, ch] *= amp
        # mild LN-affine spread (pretrained LNs are not all-ones)
        for ln in ("ln_1", "ln_2"):
            lp[ln]["scale"] = (1.0 + rng.normal(0, 0.15, d)).astype(
                np.float32)
            lp[ln]["bias"] = rng.normal(0, 0.05, d).astype(np.float32)
    return jax.tree.map(jnp.asarray, params)


def outlier_ratio(params, images, *, patch_size: int, num_heads: int) -> float:
    """max|residual-stream activation| / its 99th percentile at the encoder
    output (fp32 forward). Pretrained ViTs measure >=10; random init ~3."""
    from peekvit_tpu.inference import _embed
    from peekvit_tpu.ops.attention import attention_core

    cast = lambda t: t.astype(jnp.float32)  # noqa: E731
    tokens, d = _embed(params, images, patch_size, 1, 0, cast)
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])
    ids = sorted(int(k.split("_")[1]) for k in enc if k.startswith("layers_"))

    def ln(x, p, eps=1e-5):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]

    for i in ids:
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        y = ln(tokens, lp["ln_1"])
        qkv = y @ at["in_proj_kernel"] + at["in_proj_bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        y = attention_core(q, k, v, num_heads)
        tokens = tokens + y @ at["out_proj_kernel"] + at["out_proj_bias"]
        z = ln(tokens, lp["ln_2"])
        z = jax.nn.gelu(z @ lp["mlp"]["fc1_kernel"] + lp["mlp"]["fc1_bias"])
        tokens = tokens + z @ lp["mlp"]["fc2_kernel"] + lp["mlp"]["fc2_bias"]
    a = jnp.abs(tokens)
    return float(jnp.max(a) / jnp.percentile(a, 99.0))


def max_attention_log2_units(params, images, *, patch_size: int,
                             num_heads: int) -> float:
    """Largest |attention logit| in the units the fused kernel clamps
    (scale * LOG2E folded in, ops/pallas/fused_attention._attn_scores_pv
    clamps to [-80, 115]) across all layers, fp32 forward."""
    from peekvit_tpu.inference import _embed
    from peekvit_tpu.ops.attention import attention_core

    LOG2E = 1.4426950408889634
    cast = lambda t: t.astype(jnp.float32)  # noqa: E731
    tokens, d = _embed(params, images, patch_size, 1, 0, cast)
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    ids = sorted(int(k.split("_")[1]) for k in enc if k.startswith("layers_"))
    worst = 0.0

    def ln(x, p, eps=1e-5):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]

    b = tokens.shape[0]
    for i in ids:
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        y = ln(tokens, lp["ln_1"])
        qkv = y @ at["in_proj_kernel"] + at["in_proj_bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        n = q.shape[1]
        qh = q.reshape(b, n, num_heads, hd)
        kh = k.reshape(b, n, num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (scale * LOG2E)
        worst = max(worst, float(jnp.max(jnp.abs(logits))))
        y = attention_core(q, k, v, num_heads)
        tokens = tokens + y @ at["out_proj_kernel"] + at["out_proj_bias"]
        z = ln(tokens, lp["ln_2"])
        z = jax.nn.gelu(z @ lp["mlp"]["fc1_kernel"] + lp["mlp"]["fc1_bias"])
        tokens = tokens + z @ lp["mlp"]["fc2_kernel"] + lp["mlp"]["fc2_bias"]
    return worst
