"""Checkpoint adapters: torch/timm/torchvision state dicts -> jax param trees,
and cross-model (ViT -> ResidualViT) transfer.

Key grammar from the reference (models/adapters.py:75-166):
- torchvision: ``encoder.layers.encoder_layer_0``, ``mlp.0/mlp.3``,
  ``heads.head``, ``class_token`` -> peekvit grammar first, then to jax.
- timm: ``blocks.N``, ``norm1/norm2``, ``attn.qkv``, ``patch_embed.proj``,
  ``cls_token``, ``pos_embed`` -> peekvit grammar.
- peekvit torch grammar -> our param paths with layout transforms:
  conv OIHW -> flattened (P*P*C, D) matmul kernel, packed in_proj transposed,
  all Dense kernels transposed.

Head replacement contract: when the checkpoint's class count differs, the
head is re-zeroed (reference adapters.py:107-114 — zeros, matching the
model's zero-init head).
"""

from __future__ import annotations

import re
from typing import Optional

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- key renamers
# (string->string, operating on torch-style dotted keys — reference parity)


def adapt_torch_key(p: str) -> str:
    """torchvision ViT key -> peekvit torch key (reference adapters.py:92-101)."""
    p = (
        p.replace("mlp.0", "mlp.fc1")
        .replace("mlp.3", "mlp.fc2")
        .replace("heads.head", "head")
        .replace("mlp.linear_1", "mlp.fc1")
        .replace("mlp.linear_2", "mlp.fc2")
    )
    if p.count("self_attention") == 1:
        p = p.replace("self_attention", "self_attention.self_attention")
    if p == "class_token":
        return "class_tokens"
    p = re.sub(r"encoder_layer_(\d+)", r"\1", p)
    return p


def adapt_timm_key(p: str) -> str:
    """timm ViT key -> peekvit torch key (reference adapters.py:134-152)."""
    p = p.replace("norm1", "ln_1").replace("norm2", "ln_2")
    p = p.replace("attn.qkv.bias", "self_attention.self_attention.in_proj_bias")
    p = p.replace("attn.qkv.weight", "self_attention.self_attention.in_proj_weight")
    p = p.replace("attn.proj.bias", "self_attention.self_attention.out_proj.bias")
    p = p.replace("attn.proj.weight", "self_attention.self_attention.out_proj.weight")
    p = p.replace("patch_embed.proj.bias", "conv_proj.bias")
    p = p.replace("patch_embed.proj.weight", "conv_proj.weight")
    p = p.replace("cls_token", "class_tokens")
    p = p.replace("pos_embed", "encoder.pos_embedding")
    p = p.replace("norm.weight", "encoder.ln.weight")
    p = p.replace("norm.bias", "encoder.ln.bias")
    p = re.sub(r"blocks\.(\d+)", r"encoder.layers.\1", p)
    return p


# --------------------------------------------------- peekvit torch key -> jax


def _torch_key_to_path_and_transform(key: str, arr: np.ndarray):
    """Map a peekvit-grammar torch key to (our param path tuple, jax array).

    Returns None for keys we deliberately drop.
    """
    parts = key.split(".")

    def dense(kernel_name, bias_name, prefix, leaf):
        if leaf == "weight":
            return prefix + (kernel_name,), arr.T
        return prefix + (bias_name,), arr

    # normalize encoder.layers.N -> encoder/layers_N
    out: list[str] = []
    i = 0
    while i < len(parts):
        if (
            parts[i] == "layers"
            and i + 1 < len(parts)
            and parts[i + 1].isdigit()
        ):
            out.append(f"layers_{parts[i + 1]}")
            i += 2
        else:
            out.append(parts[i])
            i += 1
    # torch nests SelfAttention(wrapper).self_attention(nn.MultiheadAttention);
    # our SelfAttention module holds the params directly — collapse the pair.
    parts = [
        p for j, p in enumerate(out)
        if not (p == "self_attention" and j + 1 < len(out) and out[j + 1] == "self_attention")
    ]

    leaf = parts[-1]
    prefix = tuple(parts[:-1])

    # conv patch embed: OIHW (D, C, P, P) -> (P*P*C, D)
    if parts[0] == "conv_proj":
        if leaf == "weight":
            d, c, p, _ = arr.shape
            return ("conv_proj", "kernel"), arr.transpose(2, 3, 1, 0).reshape(
                p * p * c, d
            )
        return ("conv_proj", "bias"), arr

    if leaf in ("class_tokens", "register_tokens", "pos_embedding",
                "learnable_budget_token_1", "learnable_budget_token_2",
                "mask_token", "threshold"):
        return tuple(parts), arr

    # LayerNorm: weight -> scale
    if len(parts) >= 2 and parts[-2].startswith("ln"):
        if leaf == "weight":
            return prefix + ("scale",), arr
        return prefix + ("bias",), arr

    # packed attention projections
    if leaf == "in_proj_weight":
        return prefix + ("in_proj_kernel",), arr.T
    if leaf == "in_proj_bias":
        return prefix + ("in_proj_bias",), arr
    if len(parts) >= 2 and parts[-2] == "out_proj":
        if leaf == "weight":
            return prefix[:-1] + ("out_proj_kernel",), arr.T
        return prefix[:-1] + ("out_proj_bias",), arr

    # MLP fc1/fc2 are flattened param names (fc1_kernel) in our MLP module
    if len(parts) >= 2 and parts[-2] in ("fc1", "fc2"):
        fc = parts[-2]
        if leaf == "weight":
            return prefix[:-1] + (f"{fc}_kernel",), arr.T
        return prefix[:-1] + (f"{fc}_bias",), arr

    # generic Dense-like leaves (head, gate projections, early-exit heads...)
    if leaf == "weight":
        if arr.ndim == 2:
            return prefix + ("kernel",), arr.T
        return prefix + ("weight",), arr
    if leaf == "bias":
        return prefix + ("bias",), arr

    return tuple(parts), arr


def convert_torch_state_dict(state_dict: dict, num_classes: Optional[int] = None) -> dict:
    """peekvit-grammar torch state dict -> nested jax param dict.

    If ``num_classes`` differs from the checkpoint head, the head is replaced
    with zeros (reference adapters.py:107-114).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}

    if num_classes is not None and "head.weight" in sd:
        old = sd["head.weight"].shape
        if old[0] != num_classes:
            sd["head.weight"] = np.zeros((num_classes, old[1]), dtype=np.float32)
            sd["head.bias"] = np.zeros((num_classes,), dtype=np.float32)

    tree: dict = {}
    for key, arr in sd.items():
        mapped = _torch_key_to_path_and_transform(key, arr)
        if mapped is None:
            continue
        path, value = mapped
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(np.ascontiguousarray(value))
    return tree


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:  # torch tensor without importing torch at module scope
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


# -------------------------------------------------------------- tree transfer


def transfer_params(src, dst, _path=()):
    """Non-strict merge: copy every src leaf whose path+shape matches dst.

    Returns (merged_tree, missing_paths, loaded_paths). The jax equivalent of
    ``load_state_dict(strict=False)`` used by ViT->ResidualViT init
    (reference adapters.py:8-38).
    """
    missing, loaded = [], []

    def rec(s, d, path):
        if not isinstance(d, dict):
            if s is not None and getattr(s, "shape", None) == getattr(d, "shape", None):
                loaded.append("/".join(path))
                return s
            missing.append("/".join(path))
            return d
        out = {}
        for k, dv in d.items():
            sv = s.get(k) if isinstance(s, dict) else None
            out[k] = rec(sv, dv, path + [k])
        return out

    merged = rec(src, dst, [])
    return merged, missing, loaded


def adapt_torch_state_dict(torch_state_dict: dict, num_classes: int) -> dict:
    """torchvision-grammar -> jax params (reference adapters.py:75-115)."""
    renamed = {adapt_torch_key(k): v for k, v in torch_state_dict.items()}
    return convert_torch_state_dict(renamed, num_classes=num_classes)


def adapt_timm_state_dict(timm_state_dict: dict, num_classes: int) -> dict:
    """timm-grammar -> jax params (reference adapters.py:118-166)."""
    renamed = {adapt_timm_key(k): v for k, v in timm_state_dict.items()}
    return convert_torch_state_dict(renamed, num_classes=num_classes)


# ------------------------------------------------------------ model-level API


def load_pretrained(model, torch_pretrained_weights=None, timm_pretrained_weights=None):
    """Load pretrained torch weights into a built Model (non-strict).

    Accepts local ``.pth`` paths only — this environment has no network
    egress, so torchvision/timm hub downloads (reference vit.py:273-299)
    are rejected with a clear error.
    """
    import os

    assert not (torch_pretrained_weights and timm_pretrained_weights), (
        "You cannot load weights from both torch and timm at the same time."
    )
    spec = torch_pretrained_weights or timm_pretrained_weights
    if not os.path.exists(str(spec)):
        raise FileNotFoundError(
            f"Pretrained weights {spec!r} is not a local file. Hub downloads "
            "are unavailable (no network egress); place the .pth locally."
        )
    import torch

    sd = torch.load(spec, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    elif isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    num_classes = model.model_args.get("num_classes")
    if torch_pretrained_weights:
        src = adapt_torch_state_dict(sd, num_classes=num_classes)
    else:
        src = adapt_timm_state_dict(sd, num_classes=num_classes)

    merged, missing, loaded = transfer_params(src, model.params)
    if missing:
        print(
            "Some parameters are not present in the checkpoint and keep their "
            "init values:", missing[:10], "..." if len(missing) > 10 else "",
        )
    model.params = merged
    return model


def from_vit_to_residual_vit(vit_checkpoint: str, model_args: Optional[dict] = None):
    """Init a ResidualViT from a plain-ViT checkpoint (reference adapters.py:8-38)."""
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.utils.checkpoint import load_state

    src_model = load_state(vit_checkpoint)
    args = model_args if model_args is not None else dict(src_model.model_args)
    res = build_model("residualvit", args)
    merged, missing, _ = transfer_params(src_model.params, res.params)
    if missing:
        print("Randomly initialized (not in ViT checkpoint):", missing)
    res.params = merged
    return res


def from_vit_to_eeresidual_vit(vit_checkpoint: str, residual_vit_args: dict):
    """Reference adapters.py:42-72."""
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.utils.checkpoint import load_state

    src_model = load_state(vit_checkpoint)
    args = {**src_model.model_args, **residual_vit_args}
    res = build_model("eeresidualvit", args)
    merged, missing, _ = transfer_params(src_model.params, res.params)
    if missing:
        print("Randomly initialized (not in ViT checkpoint):", missing)
    res.params = merged
    return res, args
