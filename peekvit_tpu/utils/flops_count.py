"""Sparsity-aware FLOPs accounting (reference utils/flops_count.py).

The reference instruments ptflops with custom hooks that subtract
masked-out (all-zero) tokens from every Linear and attention matmul
(flops_count.py:27-39,45-145) — an *empirical* counter that needs a slow
hooked forward per batch (validate/test.py:137-147).

TPU-native replacement: the forward already returns every gate mask in
``aux``, so effective FLOPs are computed *analytically* from the model
geometry + per-layer active-token counts — exact, instant, and free of the
reference's never-reset ``avg_sparsity`` accumulator bug (SURVEY.md §7.17).
XLA's own compiled cost analysis is exposed as ``xla_flops`` for the dense
(budget=1) cross-check.

Counted terms mirror the reference hooks: linear projections, attention
matmuls (QK^T and PV at full active length), patch-embed conv, heads.
LayerNorm/GELU/softmax elementwise terms are O(n·d) noise next to the
O(n·d²) matmuls and are excluded, as in the reference's Linear/MHA-only
custom hooks. FLOPs = 2 × MACs (reference flops_count.py:173).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from peekvit_tpu.utils.introspection import get_forward_masks


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def count_masked_tokens(tokens: jax.Array) -> jax.Array:
    """Rows whose feature-sum == 0 (reference flops_count.py:13-21)."""
    return jnp.sum(jnp.sum(tokens, axis=-1) == 0, axis=-1)


def _encoder_layer_macs(n: float, d: int, m: int) -> float:
    """MACs of one pre-LN transformer block at n active tokens."""
    attn = 4 * n * d * d + 2 * n * n * d  # qkv+out proj, QK^T, PV
    mlp = 2 * n * d * m
    return attn + mlp


def _active_tokens_per_layer(
    module, aux: Dict[str, Any], num_layers: int, seq: float, specials: float
) -> list:
    """Mean active token count per encoder layer, from incremental masks.

    Layers without a gate mask inherit the previous layer's count (a token
    dropped at layer i stays dropped — reference utils.py:100-122)."""
    masks = get_forward_masks(aux, incremental=True)
    by_layer = {int(str(k).split("_")[-1]): v for k, v in masks.items()}
    counts = []
    current = float(seq)
    for i in range(num_layers):
        if i in by_layer:
            kept = float(jnp.mean(jnp.sum(jnp.ceil(by_layer[i]), axis=1)))
            current = kept + specials
        counts.append(current)
    return counts


def analytic_macs(module, aux: Optional[Dict[str, Any]] = None) -> float:
    """Per-image MACs of a ViT-family module given a forward's aux masks."""
    d = module.hidden_dim
    m = module.mlp_dim
    num_layers = module.num_layers

    if hasattr(module, "num_points"):  # PCT family: ARPE embed + blocks
        n = module.num_points
        macs = n * 3 * d + n * d * d  # ARPE rel-pos MLP (approx.)
        counts = _active_tokens_per_layer(module, aux or {}, num_layers, n, 0)
        for c in counts:
            macs += _encoder_layer_macs(c, d, m)
        macs += d * module.num_classes
        return macs

    p = module.patch_size
    n_patches = (module.image_size // p) ** 2
    specials = getattr(module, "num_class_tokens", 1) + getattr(
        module, "num_registers", 0
    )
    if getattr(module, "add_budget_token", None):
        specials += 1
    seq = n_patches + specials

    macs = n_patches * d * (p * p * 3)  # conv patch-embed
    counts = _active_tokens_per_layer(module, aux or {}, num_layers, seq, specials)
    for c in counts:
        macs += _encoder_layer_macs(c, d, m)
    macs += d * module.num_classes  # head on summed class tokens
    return macs


def compute_flops(
    model,
    batch: jax.Array,
    budget: Optional[float] = None,
    noise_value: Optional[float] = None,
    as_strings: bool = False,
    verbose: bool = False,
) -> Tuple[float, int]:
    """(flops_per_image, num_params) — reference compute_flops contract
    (flops_count.py:149-180): runs a forward to observe the masks the model
    actually produces at this budget, then counts analytically."""
    _, aux = model(batch, budget=budget, noise_value=noise_value)
    flops = 2.0 * analytic_macs(model.module, aux)
    params = count_params(model.params)
    if as_strings:
        return f"{flops / 1e9:.2f} GFLOPs", f"{params / 1e6:.2f} M"
    return flops, params


def sparsity_per_module(model, batch, budget=None) -> Dict[str, float]:
    """Per-gated-layer kept-token fraction at this budget — replaces the
    reference's polluted ``module.avg_sparsity`` accumulators
    (flops_count.py:35-39 + §7.17)."""
    from peekvit_tpu.utils.introspection import sparsity_per_layer

    _, aux = model(batch, budget=budget)
    return sparsity_per_layer(aux)


def xla_flops(fn, *args) -> Optional[float]:
    """Dense-compute FLOPs from XLA's compiled cost analysis — the
    device-truth cross-check for ``analytic_macs`` at budget=1."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None
