"""Mesh construction and sharding rules.

Scaling recipe (How to Scale Your Model): pick a mesh, annotate shardings
with ``NamedSharding``, let XLA insert the collectives over ICI. For ViT
scale the winning layout is pure data parallelism — batch over ``data``,
params replicated — with the ``model`` axis available for tensor-parallel
Dense kernels when hidden_dim outgrows one chip.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A (data, model) mesh over the available devices.

    Defaults to all devices on the data axis — the right layout for
    ViT-scale models where params fit on one chip. ``n_model > 1`` carves
    an inner model axis (adjacent devices, so TP collectives ride the
    fastest ICI links).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over data; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel param rules: regex on the param path -> PartitionSpec.
# Column-parallel for qkv/fc1 (split output features), row-parallel for
# out-proj/fc2 (split input features) — the Megatron layout, which needs a
# single psum per block and XLA inserts it from these shardings alone.
_TP_RULES = [
    # in_proj kernel (D, 3D) / fc1 kernel (D, M): split output features
    (re.compile(r"(in_proj|fc1)_?kernel$"), P(None, MODEL_AXIS)),
    # out_proj kernel (D, D) / fc2 kernel (M, D): split input features
    (re.compile(r"(out_proj|fc2)_?kernel$"), P(MODEL_AXIS, None)),
    # matching biases live on the split output dim
    (re.compile(r"(in_proj|fc1)_?bias$"), P(MODEL_AXIS)),
]

# Expert parallelism: stacked MoE expert params (E, ...) shard the leading
# expert axis over the model mesh axis; GSPMD turns the dense top-1 combine
# einsum (moevit.py) into per-device expert compute + one all-reduce.
_EP_RULES = [
    (re.compile(r"experts/fc[12]_kernel$"), P(MODEL_AXIS, None, None)),
    (re.compile(r"experts/fc[12]_bias$"), P(MODEL_AXIS, None)),
]


def param_spec(path: str, ndim: int, tensor_parallel: bool) -> P:
    if tensor_parallel:
        for pat, spec in _EP_RULES:
            if pat.search(path) and ndim == len(spec):
                return spec
        if ndim in (1, 2):
            for pat, spec in _TP_RULES:
                if pat.search(path):
                    return spec
    return P()


def shard_params(params, mesh: Mesh, tensor_parallel: bool = False):
    """Place a param pytree on the mesh (replicated, or TP-sharded when the
    mesh has a model axis and ``tensor_parallel`` is set)."""

    def place(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = param_spec(name, getattr(leaf, "ndim", 0), tensor_parallel)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard host batch arrays over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
