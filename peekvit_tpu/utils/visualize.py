"""Visualization suite (reference utils/visualize.py, 827 LoC).

Every plot family is reproduced on matplotlib (plotly isn't in the image):

- recap plots: budget-vs-accuracy, flops-vs-accuracy, budget-vs-throughput,
  multi-run cumulative variants (reference :74-161)
- budget x noise accuracy grids (:164-225)
- MoE: per-image expert-assignment maps (:281-339) and expert-embedding
  PCA scatter (:342-374)
- Residual: per-layer incremental token-mask heatmaps / overlays
  (plot_masked_images :381-500), dataset-level mask distribution (:504-606)
- class-token tools (:610-784): per-layer class tokens, pairwise distance
  heatmaps, token-norm curves — intermediate features come from flax's
  ``capture_intermediates`` instead of torchvision feature extractors
- reconstructed-image grids (:787-823)

Masks come from the forward's aux pytree (get_forward_masks) — the JAX
replacement for the reference's module-attribute side channels (§3.4).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from peekvit_tpu.utils.introspection import (  # noqa: E402
    get_forward_masks,
    get_gating_probs,
)


def _savefig(fig, save_path: Optional[str]):
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


# ----------------------------------------------------------- recap plots


def plot_budget_vs_acc(budgets, accuracies, save_path=None, label=None,
                       title="Budget vs accuracy"):
    """reference visualize.py:74-101 (left panel)."""
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(budgets, accuracies, marker="o", label=label)
    ax.set_xlabel("budget")
    ax.set_ylabel("top-1 accuracy")
    ax.set_title(title)
    ax.grid(alpha=0.3)
    if label:
        ax.legend()
    return _savefig(fig, save_path)


def plot_flops_vs_acc(flops, accuracies, save_path=None, label=None,
                      title="FLOPs vs accuracy"):
    """reference visualize.py:74-101 (right panel); flops per image."""
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(np.asarray(flops) / 1e9, accuracies, marker="o", label=label)
    ax.set_xlabel("GFLOPs / image")
    ax.set_ylabel("top-1 accuracy")
    ax.set_title(title)
    ax.grid(alpha=0.3)
    if label:
        ax.legend()
    return _savefig(fig, save_path)


def plot_budget_vs_throughput(budgets, images_per_sec, save_path=None,
                              label=None, title="Budget vs throughput"):
    """reference visualize.py:104-121."""
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(budgets, images_per_sec, marker="s", label=label)
    ax.set_xlabel("budget")
    ax.set_ylabel("images / second")
    ax.set_title(title)
    ax.grid(alpha=0.3)
    if label:
        ax.legend()
    return _savefig(fig, save_path)


def plot_cumulative_runs(runs: Dict[str, dict], x_key: str = "budgets",
                         y_key: str = "accuracies", save_path=None,
                         run_colors=None, title="Cumulative"):
    """Multi-run overlay (reference visualize.py:124-161). ``runs`` maps
    run-name -> {budgets/flops: [...], accuracies: [...]}."""
    fig, ax = plt.subplots(figsize=(6, 4.5))
    for i, (name, data) in enumerate(runs.items()):
        color = (run_colors or {}).get(name)
        xs = np.asarray(data[x_key], dtype=float)
        if x_key == "flops":
            xs = xs / 1e9
        ax.plot(xs, data[y_key], marker="o", label=name, color=color)
    ax.set_xlabel("GFLOPs / image" if x_key == "flops" else x_key)
    ax.set_ylabel(y_key)
    ax.set_title(title)
    ax.grid(alpha=0.3)
    ax.legend()
    return _savefig(fig, save_path)


def plot_budget_noise_grid(results: Dict[float, Dict[float, float]],
                           save_path=None, title="accuracy: budget x noise"):
    """Heatmap of accuracy over (budget, noise) (reference :164-225).
    ``results[budget][noise] = accuracy``."""
    budgets = sorted(results)
    noises = sorted(next(iter(results.values())))
    grid = np.array([[results[b][n] for n in noises] for b in budgets])
    fig, ax = plt.subplots(figsize=(1.2 * len(noises) + 2, 0.8 * len(budgets) + 2))
    im = ax.imshow(grid, cmap="viridis", aspect="auto")
    ax.set_xticks(range(len(noises)), [f"{n:g}" for n in noises])
    ax.set_yticks(range(len(budgets)), [f"{b:g}" for b in budgets])
    ax.set_xlabel("noise")
    ax.set_ylabel("budget")
    ax.set_title(title)
    for i in range(len(budgets)):
        for j in range(len(noises)):
            ax.text(j, i, f"{grid[i, j]:.3f}", ha="center", va="center",
                    color="w", fontsize=8)
    fig.colorbar(im)
    return _savefig(fig, save_path)


# ------------------------------------------------------------ mask plots


def _mask_to_grid(mask: np.ndarray, patches_per_side: int) -> np.ndarray:
    """(N_img, 1) img-token mask -> (P, P) grid. Masks exclude special
    tokens already (reference semantics, §7.15)."""
    m = np.asarray(mask).reshape(-1)[: patches_per_side * patches_per_side]
    return m.reshape(patches_per_side, patches_per_side)


def plot_masked_images(
    model,
    images: Sequence,
    denormalize=None,
    hard: bool = True,
    skip_layers: Sequence[int] = (),
    overlay: bool = False,
    masked_region_color: str = "lightsteelblue",
    budget: Optional[float] = None,
    save_dir: Optional[str] = None,
) -> List:
    """Per-image, per-layer incremental token masks as heatmaps or color
    overlays (reference visualize.py:381-500 + §3.4 call stack).

    ``images`` is a sequence of (img, label) or raw arrays (HWC, normalized).
    """
    import jax.numpy as jnp

    skip = set(int(s) for s in skip_layers)
    patches_per_side = model.module.image_size // model.module.patch_size
    rgba_masked = np.asarray(matplotlib.colors.to_rgba(masked_region_color))
    outputs = []
    for idx, item in enumerate(images):
        img = item[0] if isinstance(item, (tuple, list)) else item
        x = jnp.asarray(np.asarray(img, dtype=np.float32))[None]
        _, aux = model(x, budget=budget)
        masks = get_forward_masks(aux, incremental=True)
        masks = {
            name: m for i, (name, m) in enumerate(masks.items()) if i not in skip
        }
        shown = np.asarray(denormalize(np.asarray(img))) if denormalize else (
            np.asarray(img)
        )
        shown = np.clip(shown, 0, 1)

        ncols = len(masks) + 1
        fig, axes = plt.subplots(1, ncols, figsize=(2.2 * ncols, 2.4))
        axes = np.atleast_1d(axes)
        axes[0].imshow(shown)
        axes[0].set_title("input", fontsize=8)
        axes[0].axis("off")
        for ax, (name, mask) in zip(axes[1:], masks.items()):
            grid = _mask_to_grid(np.asarray(mask[0]), patches_per_side)
            if hard:
                grid = np.ceil(grid)
            if overlay:
                up = np.kron(grid, np.ones((
                    shown.shape[0] // patches_per_side,
                    shown.shape[1] // patches_per_side,
                )))[: shown.shape[0], : shown.shape[1]]
                out = shown.copy()
                dropped = up < 0.5
                out[dropped] = (
                    0.6 * rgba_masked[:3] + 0.4 * out[dropped]
                )
                ax.imshow(out)
            else:
                ax.imshow(grid, cmap="viridis", vmin=0, vmax=1)
            ax.set_title(name, fontsize=8)
            ax.axis("off")
        if save_dir:
            outputs.append(
                _savefig(fig, os.path.join(save_dir, f"image_{idx}.png"))
            )
        else:
            outputs.append(fig)
    return outputs


def img_mask_distribution(model, dataset, num_images: int = 100,
                          budget: Optional[float] = None,
                          save_path: Optional[str] = None):
    """Dataset-level mean keep-probability per patch position per layer
    (reference visualize.py:504-606)."""
    import jax.numpy as jnp

    patches_per_side = model.module.image_size // model.module.patch_size
    acc: Dict[str, np.ndarray] = {}
    n = min(num_images, len(dataset))
    for i in range(n):
        img = dataset[i][0]
        _, aux = model(jnp.asarray(np.asarray(img, np.float32))[None], budget=budget)
        for name, m in get_forward_masks(aux, incremental=True).items():
            grid = _mask_to_grid(np.ceil(np.asarray(m[0])), patches_per_side)
            acc[name] = acc.get(name, 0) + grid
    ncols = len(acc)
    fig, axes = plt.subplots(1, ncols, figsize=(2.2 * ncols, 2.4))
    for ax, (name, g) in zip(np.atleast_1d(axes), acc.items()):
        im = ax.imshow(g / n, cmap="viridis", vmin=0, vmax=1)
        ax.set_title(name, fontsize=8)
        ax.axis("off")
    fig.colorbar(im, ax=axes, shrink=0.8)
    return _savefig(fig, save_path)


# -------------------------------------------------------------- MoE plots


def plot_moe_expert_maps(model, images: Sequence, denormalize=None,
                         save_dir: Optional[str] = None):
    """Per-image map of which expert each token routes to
    (reference visualize.py:281-339)."""
    import jax.numpy as jnp

    patches_per_side = model.module.image_size // model.module.patch_size
    outputs = []
    for idx, item in enumerate(images):
        img = item[0] if isinstance(item, (tuple, list)) else item
        _, aux = model(jnp.asarray(np.asarray(img, np.float32))[None])
        # per-layer entries may be {'attn': probs, 'mlp': probs} dicts
        gates = {}
        for name, v in get_gating_probs(aux).items():
            sub = v if isinstance(v, dict) else {"": v}
            for kind, probs in sub.items():
                if probs is not None and probs.shape[-1] > 1:
                    gates[f"{name}/{kind}".rstrip("/")] = probs
        shown = np.asarray(denormalize(np.asarray(img))) if denormalize else (
            np.asarray(img))
        ncols = len(gates) + 1
        fig, axes = plt.subplots(1, ncols, figsize=(2.2 * ncols, 2.4))
        axes = np.atleast_1d(axes)
        axes[0].imshow(np.clip(shown, 0, 1))
        axes[0].axis("off")
        axes[0].set_title("input", fontsize=8)
        for ax, (name, g) in zip(axes[1:], gates.items()):
            assign = np.argmax(np.asarray(g[0]), axis=-1)  # (S,)
            grid = assign[-patches_per_side * patches_per_side:].reshape(
                patches_per_side, patches_per_side
            )
            ax.imshow(grid, cmap="tab10", vmin=0, vmax=max(9, g.shape[-1] - 1))
            ax.set_title(name, fontsize=8)
            ax.axis("off")
        if save_dir:
            outputs.append(_savefig(fig, os.path.join(save_dir, f"experts_{idx}.png")))
        else:
            outputs.append(fig)
    return outputs


def plot_moe_expert_pca(expert_embeddings: Dict[str, np.ndarray],
                        save_path: Optional[str] = None):
    """PCA scatter of per-expert token embeddings (reference :342-374,
    3D plotly scatter -> 2D matplotlib)."""
    from sklearn.decomposition import PCA

    fig, ax = plt.subplots(figsize=(5, 4.5))
    for name, emb in expert_embeddings.items():
        emb = np.asarray(emb).reshape(-1, emb.shape[-1])
        pts = PCA(n_components=2).fit_transform(emb) if emb.shape[0] > 2 else emb[:, :2]
        ax.scatter(pts[:, 0], pts[:, 1], s=8, alpha=0.6, label=name)
    ax.legend(fontsize=7)
    ax.set_title("expert embeddings (PCA)")
    return _savefig(fig, save_path)


# -------------------------------------------------------- class-token tools


def extract_intermediates(model, x, budget=None):
    """Per-layer block outputs via flax capture_intermediates — the JAX
    equivalent of torchvision create_feature_extractor (reference :610-678).
    Returns {path: array} for every encoder block's output tokens."""
    import jax

    variables = {"params": model.params, **model.state}
    rngs = {"noise": jax.random.key(0)}
    b = None if budget is None else np.float32(budget)
    _, mods = model.module.apply(
        variables, x, train=False, budget=b, noise_value=None, rngs=rngs,
        capture_intermediates=True, mutable=["intermediates"],
    )
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, tuple):
            out = node[0]
            if isinstance(out, tuple):  # blocks returning (tokens, mask)
                out = out[0]
            if hasattr(out, "ndim") and out.ndim == 3:
                flat["/".join(path[:-1])] = np.asarray(out)

    walk(mods["intermediates"], ())
    return flat


def _per_layer_tokens(model, x, budget=None) -> Dict[str, np.ndarray]:
    """One token array per encoder layer: the shortest-path capture whose
    feature dim equals hidden_dim (filters out gate/score sublayer sows)."""
    import re

    d = model.module.hidden_dim
    feats = extract_intermediates(model, x, budget=budget)
    by_layer: Dict[int, tuple] = {}
    for k, v in feats.items():
        m = re.search(r"layers?_(\d+)", k)
        if m is None or v.shape[-1] != d:
            continue
        i = int(m.group(1))
        if i not in by_layer or len(k) < len(by_layer[i][0]):
            by_layer[i] = (k, v)
    return {f"layer_{i}": v for i, (_, v) in sorted(by_layer.items())}


def plot_class_tokens(model, img, budget=None, save_path=None):
    """Per-layer class-token values as heatmap rows (reference :680-715)."""
    import jax.numpy as jnp

    x = jnp.asarray(np.asarray(img, np.float32))[None]
    layers = _per_layer_tokens(model, x, budget)
    ncls = getattr(model.module, "num_class_tokens", 1)
    mat = np.stack([v[0, :ncls].reshape(-1) for v in layers.values()])
    fig, ax = plt.subplots(figsize=(8, 0.4 * len(mat) + 1.5))
    im = ax.imshow(mat, aspect="auto", cmap="coolwarm")
    ax.set_yticks(range(len(layers)), list(layers), fontsize=6)
    ax.set_xlabel("class-token features")
    fig.colorbar(im)
    return _savefig(fig, save_path)


def plot_class_tokens_distances(model, img, budget=None, save_path=None):
    """Pairwise L2 distance between per-layer class tokens (reference
    :719-746, torch.cdist heatmap)."""
    import jax.numpy as jnp

    x = jnp.asarray(np.asarray(img, np.float32))[None]
    layers = _per_layer_tokens(model, x, budget)
    ncls = getattr(model.module, "num_class_tokens", 1)
    toks = np.stack([v[0, :ncls].mean(axis=0) for v in layers.values()])
    d = np.sqrt(((toks[:, None] - toks[None]) ** 2).sum(-1))
    fig, ax = plt.subplots(figsize=(5, 4.5))
    im = ax.imshow(d, cmap="magma")
    ax.set_xticks(range(len(layers)), range(len(layers)))
    ax.set_yticks(range(len(layers)), range(len(layers)))
    ax.set_title("class-token distances across layers")
    fig.colorbar(im)
    return _savefig(fig, save_path)


def plot_token_norms(model, img, budget=None, save_path=None):
    """Per-layer token L2 norms (reference :750-784) — the signal RankViT
    prunes on."""
    import jax.numpy as jnp

    x = jnp.asarray(np.asarray(img, np.float32))[None]
    layers = _per_layer_tokens(model, x, budget)
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, v in layers.items():
        norms = np.linalg.norm(v[0], axis=-1)
        ax.plot(np.sort(norms)[::-1], label=name, alpha=0.8)
    ax.set_xlabel("token rank")
    ax.set_ylabel("L2 norm")
    ax.legend(fontsize=6)
    ax.set_title("token norms per layer")
    return _savefig(fig, save_path)


# --------------------------------------------------------- reconstruction


def plot_reconstructed_images(model, images: Sequence, denormalize=None,
                              budget: Optional[float] = None,
                              save_dir: Optional[str] = None):
    """input | reconstruction | mask triptychs (reference :787-823) for
    models whose forward returns (logits, recon[, mask])."""
    import jax.numpy as jnp

    outputs = []
    for idx, item in enumerate(images):
        img = item[0] if isinstance(item, (tuple, list)) else item
        out, aux = model(jnp.asarray(np.asarray(img, np.float32))[None],
                         budget=budget)
        recon = np.asarray(out[1][0])
        rmask = np.asarray(out[2][0]) if len(out) > 2 else None
        shown = np.asarray(denormalize(np.asarray(img))) if denormalize else (
            np.asarray(img))
        recon_shown = np.asarray(denormalize(recon)) if denormalize else recon
        ncols = 3 if rmask is not None else 2
        fig, axes = plt.subplots(1, ncols, figsize=(2.4 * ncols, 2.6))
        axes[0].imshow(np.clip(shown, 0, 1))
        axes[0].set_title("input", fontsize=8)
        axes[1].imshow(np.clip(recon_shown, 0, 1))
        axes[1].set_title("reconstruction", fontsize=8)
        if rmask is not None:
            axes[2].imshow(rmask.squeeze(), cmap="viridis", vmin=0, vmax=1)
            axes[2].set_title("mask", fontsize=8)
        for ax in axes:
            ax.axis("off")
        if save_dir:
            outputs.append(_savefig(fig, os.path.join(save_dir, f"recon_{idx}.png")))
        else:
            outputs.append(fig)
    return outputs
