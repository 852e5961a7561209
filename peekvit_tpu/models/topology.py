"""Model surgery (reference: models/topology.py).

Under jit, "surgery" means rebuilding the static module config and re-keying
the param tree — never mutating modules. Freezing becomes an optax gradient
mask (:func:`trainable_mask`) instead of ``requires_grad`` flags.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from peekvit_tpu.models.base import Model


def _rebuild(model: Model, **module_changes) -> Model:
    """New Model with a reconfigured module (params unchanged)."""
    module = dataclasses.replace(model.module, **module_changes)
    args = dict(model.model_args)
    for k, v in module_changes.items():
        if k in args or k in ("num_layers", "num_registers"):
            args[k] = v
    return dataclasses.replace(model, module=module, model_args=args, _jitted=None)


def remove_layers_and_stitch(model: Model, layers_to_remove: List[int]) -> Model:
    """Drop encoder blocks and renumber (reference topology.py:161-183)."""
    enc = model.params["encoder"]
    num_layers = model.module.num_layers
    keep = [i for i in range(num_layers) if i not in set(layers_to_remove)]
    new_enc = {k: v for k, v in enc.items() if not k.startswith("layers_")}
    for new_i, old_i in enumerate(keep):
        new_enc[f"layers_{new_i}"] = enc[f"layers_{old_i}"]
    params = dict(model.params)
    params["encoder"] = new_enc

    changes = {"num_layers": len(keep)}
    # per-layer config lists must shrink in step with the stack
    for attr in ("residual_layers", "rankvit_layers", "mlp_moes", "attn_moes"):
        val = getattr(model.module, attr, None)
        if isinstance(val, (list, tuple)):
            if attr == "rankvit_layers":
                changes[attr] = [keep.index(i) for i in val if i in keep]
            else:
                changes[attr] = [val[i] for i in keep]
    out = _rebuild(model, **changes)
    out.params = params
    return out


def reinit_class_tokens(model: Model, seed: int = 0) -> Model:
    """normal(std=0.02) re-init of every param whose path contains 'class'
    (reference topology.py:102-118)."""
    rng = jax.random.key(seed)

    def rec(tree, path):
        nonlocal rng
        if not isinstance(tree, dict):
            if any("class" in p for p in path):
                rng, sub = jax.random.split(rng)
                return jax.random.normal(sub, tree.shape, tree.dtype) * 0.02
            return tree
        return {k: rec(v, path + [k]) for k, v in tree.items()}

    model.params = rec(model.params, [])
    model._jitted = None
    return model


def trainable_mask(params, params_list: List[str]) -> dict:
    """Pytree of bools: True where the param path contains any substring.

    The optax-mask equivalent of reference topology.py:128-157
    (train_only_these_params). Use with ``optax.masked`` or zero out grads.
    """

    def rec(tree, path):
        if not isinstance(tree, dict):
            name = ".".join(path)
            return any(s in name for s in params_list)
        return {k: rec(v, path + [k]) for k, v in tree.items()}

    return rec(params, [])


def train_only_these_params(params, params_list: List[str], verbose: bool = False):
    """Reference-named alias returning (mask, trainable_names, frozen_names)."""
    mask = trainable_mask(params, params_list)
    trainable, frozen = [], []

    def rec(m, path):
        if not isinstance(m, dict):
            (trainable if m else frozen).append(".".join(path))
            return
        for k, v in m.items():
            rec(v, path + [k])

    rec(mask, [])
    if verbose:
        print("Trainable parameters:", trainable)
        print("Frozen parameters:", frozen)
    return mask, trainable, frozen


def freeze_module(params, module_path: str) -> dict:
    """Mask that freezes everything under module_path (topology.py:121-124)."""

    def rec(tree, path):
        if not isinstance(tree, dict):
            return not ".".join(path).startswith(module_path)
        return {k: rec(v, path + [k]) for k, v in tree.items()}

    return rec(params, [])


def add_register_tokens(model: Model, num_registers: int, seed: int = 0) -> Model:
    """Add register tokens to a built ViT (reference topology.py:17-64).

    Deliberate fix vs the reference (whose monkey-patched version leaves
    pos_embedding at the old length and crashes): we extend pos_embedding
    with normal(0.02) rows for the new register positions.
    """
    out = _rebuild(model, num_registers=num_registers)
    params = dict(out.params)
    k1, k2 = jax.random.split(jax.random.key(seed))
    hidden = model.module.hidden_dim
    params["register_tokens"] = jnp.zeros((1, num_registers, hidden))
    enc = dict(params["encoder"])
    pos = enc["pos_embedding"]
    c = model.module.num_class_tokens
    extra = jax.random.normal(k2, (1, num_registers, hidden), pos.dtype) * 0.02
    # registers sit between class tokens and patch tokens (vit.py:229-236)
    enc["pos_embedding"] = jnp.concatenate([pos[:, :c], extra, pos[:, c:]], axis=1)
    params["encoder"] = enc
    out.params = params
    out.model_args["num_registers"] = num_registers
    return out


def add_residual_gates(model: Model, residual_gates_args: dict) -> Model:
    """Retrofit residual gates onto a plain ViT (reference topology.py:68-98):
    rebuild as ResidualVisionTransformer and transfer shared weights."""
    from peekvit_tpu.models.adapters import transfer_params
    from peekvit_tpu.models.registry import build_model

    args = dict(model.model_args)
    args.update(
        residual_layers=residual_gates_args["residual_layers"],
        gate_type=residual_gates_args["gate_type"],
        add_input=residual_gates_args["add_input"],
        gate_temp=residual_gates_args["gate_temp"],
    )
    res = build_model("residualvit", args, model.noise_args)
    merged, missing, _ = transfer_params(model.params, res.params)
    if missing:
        print("Gate params randomly initialized:", missing[:8])
    res.params = merged
    return res
