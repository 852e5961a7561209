"""Model-introspection helpers over aux pytrees (reference utils/utils.py
read mutable module attributes: get_forward_masks :100-122, gating probs
:76-94; here the forward's explicit aux outputs replace the side channels).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def ordered_masks(aux: dict) -> Dict[str, jnp.ndarray]:
    """aux['masks'] as an ordered {layer_name: (B, S, 1)} dict."""
    masks = aux.get("masks", {})
    if not isinstance(masks, dict):
        masks = {f"layer_{i}": m for i, m in enumerate(masks)}
    return dict(
        sorted(masks.items(), key=lambda kv: int(str(kv[0]).split("_")[-1]))
    )


def get_forward_masks(aux: dict, incremental: bool = False):
    """Per-layer masks; ``incremental=True`` multiplies each layer's mask by
    the ceil of the previous product so a token dropped once stays dropped in
    the visualization (reference utils.py:100-122)."""
    masks = ordered_masks(aux)
    if not incremental:
        return masks
    out = {}
    prev = None
    for name, mask in masks.items():
        if prev is not None:
            mask = mask * jnp.ceil(prev)
        out[name] = mask
        prev = mask
    return out


def get_gating_probs(aux: dict) -> Dict[str, jnp.ndarray]:
    """Per-layer MoE gating probabilities (reference get_last_forward_gates,
    utils.py:76-94)."""
    probs = aux.get("gating_probs", {})
    if not isinstance(probs, dict):
        probs = {f"layer_{i}": p for i, p in enumerate(probs)}
    return dict(
        sorted(probs.items(), key=lambda kv: int(str(kv[0]).split("_")[-1]))
    )


def get_learned_thresholds(params: dict) -> Dict[str, float]:
    """Learned gate thresholds per block from the param tree (reference
    get_learned_thresholds, utils.py:125-135 — reads module attributes;
    here the thresholds are leaves named 'threshold')."""
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name.endswith("threshold"):
            out[name] = float(leaf)
    return out


def get_moes(module) -> Dict[str, int]:
    """Per-layer expert counts of a MoE module (reference get_moes,
    utils.py:57-73 — module walking; here the counts are module config)."""
    out = {}
    for kind in ("mlp_moes", "attn_moes"):
        counts = getattr(module, kind, None)
        if counts:
            for i, c in enumerate(counts):
                if c and c > 1:
                    out[f"layer_{i}/{kind[:-5]}"] = int(c)
    return out


def get_ranking_layers(module) -> list:
    """Block indices that rank/prune tokens (reference
    get_rankingvit_blocks, utils.py:140-156)."""
    if getattr(module, "rankvit_layers", None):
        return list(module.rankvit_layers)
    enabled = getattr(module, "ranking_enabled", None)
    if enabled:
        return [i for i, e in enumerate(enabled) if e]
    return []


def sparsity_per_layer(aux: dict) -> Dict[str, float]:
    """Fraction of tokens KEPT per gated layer — the exact per-module
    sparsity the reference accumulated in its FLOPs hooks
    (flops_count.py:35-39), computed directly from masks instead."""
    return {
        name: float(jnp.mean(mask)) for name, mask in ordered_masks(aux).items()
    }
