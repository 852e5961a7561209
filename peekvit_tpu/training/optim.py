"""Optimizers, schedulers and main losses behind the reference's config
targets (configs/optimizer/*.yaml, configs/scheduler/*.yaml,
configs/loss/*.yaml name torch classes; TARGET_ALIASES in utils/config.py
routes them here).

TPU-native design: optax transforms built through ``optax.inject_hyperparams``
so the learning rate is an opt-state leaf — the per-EPOCH scheduler step the
reference does (train/train.py:125-127, torch ``scheduler.step()``) becomes a
cheap host-side write of one scalar, with no recompilation of the jitted
train step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class OptimizerSpec:
    """Self-describing optimizer config; ``build()`` makes the optax tx."""

    kind: str
    lr: float
    weight_decay: float = 0.0
    momentum: float = 0.0

    def build(self, param_mask=None) -> optax.GradientTransformation:
        if self.kind == "adam":
            # torch.optim.Adam applies *coupled* L2 via weight_decay
            base = (
                optax.inject_hyperparams(_adam_l2)(
                    learning_rate=self.lr, weight_decay=self.weight_decay
                )
                if self.weight_decay
                else optax.inject_hyperparams(optax.adam)(learning_rate=self.lr)
            )
        elif self.kind == "adamw":
            base = optax.inject_hyperparams(optax.adamw)(
                learning_rate=self.lr, weight_decay=self.weight_decay
            )
        elif self.kind == "sgd":
            # only the lr is schedule-injected; weight_decay/momentum gate
            # Python conditionals in _sgd_l2 and must stay static
            base = optax.inject_hyperparams(
                _sgd_l2, static_args=("weight_decay", "momentum"))(
                learning_rate=self.lr,
                weight_decay=self.weight_decay,
                momentum=self.momentum,
            )
        else:
            raise ValueError(f"Unknown optimizer kind {self.kind}")
        if param_mask is not None:
            # reference topology.train_only_these_params freezes by zeroing
            # requires_grad (topology.py:128-157); the optax-native form is a
            # masked zero transform.
            base = optax.chain(
                optax.masked(optax.set_to_zero(), _invert_mask(param_mask)), base
            )
        return base


def _invert_mask(mask):
    return jax.tree.map(lambda m: not m, mask)


def _adam_l2(learning_rate, weight_decay):
    """torch-style Adam with coupled L2 (decay added to the gradient)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(learning_rate),
    )


def _sgd_l2(learning_rate, weight_decay, momentum):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.sgd(learning_rate, momentum=momentum or None),
    )


def set_learning_rate(opt_state, lr: float):
    """Write the schedule's lr into an inject_hyperparams opt state."""

    def visit(node):
        if isinstance(node, optax.InjectStatefulHyperparamsState) or hasattr(
            node, "hyperparams"
        ):
            if "learning_rate" in node.hyperparams:
                node.hyperparams["learning_rate"] = jnp.asarray(
                    lr, dtype=jnp.asarray(node.hyperparams["learning_rate"]).dtype
                )
            return True
        return False

    found = _walk_opt_state(opt_state, visit)
    if not found:
        raise ValueError("opt_state has no injected learning_rate hyperparam")
    return opt_state


def get_learning_rate(opt_state) -> Optional[float]:
    out = []

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            out.append(float(jnp.asarray(node.hyperparams["learning_rate"])))
            return True
        return False

    _walk_opt_state(opt_state, visit)
    return out[0] if out else None


def _walk_opt_state(node, visit) -> bool:
    if hasattr(node, "hyperparams"):
        if visit(node):
            return True
    found = False
    if isinstance(node, (tuple, list)):
        for child in node:
            found = _walk_opt_state(child, visit) or found
    return found


# ------------------------------------------------------------- config targets


def Adam(lr: float = 1e-3, weight_decay: float = 0.0, **_) -> OptimizerSpec:
    """torch.optim.Adam equivalent (configs/optimizer/adam.yaml)."""
    return OptimizerSpec("adam", lr=lr, weight_decay=weight_decay)


def AdamW(lr: float = 1e-3, weight_decay: float = 0.01, **_) -> OptimizerSpec:
    return OptimizerSpec("adamw", lr=lr, weight_decay=weight_decay)


def SGD(lr: float = 0.1, weight_decay: float = 0.0, momentum: float = 0.0, **_):
    """torch.optim.SGD equivalent (configs/optimizer/sgd.yaml)."""
    return OptimizerSpec("sgd", lr=lr, weight_decay=weight_decay, momentum=momentum)


@dataclasses.dataclass
class SchedulerSpec:
    """Per-epoch lr schedule (reference steps schedulers per epoch,
    train/train.py:125-127)."""

    kind: str
    T_max: int = 200
    eta_min: float = 0.0

    def lr_at(self, epoch: int, base_lr: float) -> float:
        if self.kind == "cosine":
            return self.eta_min + (base_lr - self.eta_min) * 0.5 * (
                1 + math.cos(math.pi * min(epoch, self.T_max) / self.T_max)
            )
        raise ValueError(f"Unknown scheduler kind {self.kind}")


def CosineAnnealingLR(T_max: int = 200, eta_min: float = 0.0, **_) -> SchedulerSpec:
    """torch CosineAnnealingLR equivalent (configs/scheduler/cosineannealing.yaml)."""
    return SchedulerSpec("cosine", T_max=T_max, eta_min=eta_min)


class CrossEntropyLoss:
    """torch.nn.CrossEntropyLoss equivalent: integer labels, mean reduced."""

    def __call__(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


class MSELossMain:
    """torch.nn.MSELoss equivalent (reconstruction trainer main loss)."""

    def __call__(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        return jnp.mean((pred - target) ** 2)
