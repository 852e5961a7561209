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


def make_hybrid_mesh(
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    slice_of=None,
) -> Mesh:
    """A (data, model) mesh laid out for MULTI-SLICE topologies (TPU pods
    joined by DCN), same axis names as :func:`make_mesh` so every
    Trainer/engine code path works unchanged.

    Layout rule (How to Scale Your Model: collectives must ride ICI, not
    DCN, wherever the sharding allows): the ``model`` axis and each
    slice's block of the ``data`` axis stay INSIDE one slice, so
    tensor-parallel psums and in-slice gradient reduce-scatters ride ICI;
    only the data axis's slice-major stride crosses DCN, where the one
    unavoidable cross-slice collective — the gradient all-reduce — is
    lowered hierarchically by XLA (in-slice reduce-scatter, cross-slice
    all-reduce of 1/slice_size of the bytes, in-slice all-gather).

    Slice membership comes from each device's ``slice_index`` (absent on
    CPU/single-slice backends); ``slice_of`` overrides it (used by the
    virtual-mesh tests). With no slice info or a single slice this is
    exactly :func:`make_mesh`.
    """
    devices = list(devices if devices is not None else jax.devices())
    if slice_of is None:
        slice_of = lambda d: getattr(d, "slice_index", None)  # noqa: E731
    sids = [slice_of(d) for d in devices]
    if any(s is None for s in sids) or len(set(sids)) <= 1:
        return make_mesh(n_model=n_model, devices=devices)

    groups: dict = {}
    for d, s in zip(devices, sids):
        groups.setdefault(s, []).append(d)
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(
            f"uneven slices: {({k: len(g) for k, g in groups.items()})} — "
            "a hybrid mesh needs the same device count per slice")
    per = sizes.pop()
    if per % n_model:
        raise ValueError(
            f"n_model={n_model} must divide the {per} devices of one "
            "slice (the model axis may not cross DCN)")
    # slice-major data axis: rows [s*per/n_model, (s+1)*per/n_model) all
    # live in slice s, so each mesh row (a model-axis group) is in-slice
    grid = np.stack([
        np.asarray(groups[s]).reshape(per // n_model, n_model)
        for s in sorted(groups)
    ]).reshape(-1, n_model)
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


def _data_axis_spec(leaf, n: int) -> P:
    """First dimension divisible by ``n`` shards over ``data``; scalars and
    non-divisible leaves stay replicated."""
    for axis, s in enumerate(getattr(leaf, "shape", ())):
        if s >= n and s % n == 0:
            return P(*([None] * axis + [DATA_AXIS]))
    return P()


def fsdp_param_sharding(params, mesh: Mesh):
    """FSDP / ZeRO-3 placement for a PARAM pytree: every weight leaf is
    sharded over the ``data`` axis on its first divisible dimension, so
    each chip stores 1/n_data of the model (ViT-H/14: 2.5 GB of fp32
    params -> ~320 MB on 8 chips, on top of the ZeRO-1 optimizer-state
    saving).

    XLA's SPMD partitioner derives the whole FSDP schedule from these
    shardings alone: the forward/backward all-gathers each weight right
    before its matmul (and discards the gathered copy after), gradients
    come back reduce-scattered to the same shards, and the optimizer
    update runs shard-local. No wrapper classes, no hooks — the sharding
    annotation IS the strategy (How to Scale Your Model's recipe).

    Returns a pytree of ``NamedSharding`` matching ``params`` (usable with
    ``jax.device_put`` and as per-step ``with_sharding_constraint``
    targets). Use with the linen train step: the Pallas fused path runs
    inside a shard_map that requires replicated params.
    """
    if DATA_AXIS not in mesh.shape:
        raise ValueError(
            f"fsdp_param_sharding shards over a '{DATA_AXIS}' mesh axis, "
            f"but this mesh has axes {tuple(mesh.shape)}")
    n = mesh.shape[DATA_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _data_axis_spec(leaf, n)), params)


def zero1_optimizer_sharding(opt_state, mesh: Mesh):
    """ZeRO-1 placement for an optimizer-state pytree: every array leaf is
    sharded over the ``data`` axis on its first divisible dimension
    (adam's m/v and MultiSteps' grad accumulators are param-shaped, so
    this cuts the resident optimizer state to 1/n_data per chip — at
    ViT-H/14 that is 7.6 GB -> <1 GB on 8 chips); non-divisible leaves
    and scalars (step counts) stay replicated.

    XLA's partitioner derives the rest of the ZeRO-1 schedule from these
    shardings alone: each device updates only its state shard and the
    resulting update slice, and the apply-to-replicated-params add
    becomes the all-gather. Returns a pytree of ``NamedSharding`` with
    the same structure as ``opt_state`` (usable with ``jax.device_put``
    and as per-step ``with_sharding_constraint`` targets)."""
    if DATA_AXIS not in mesh.shape:
        raise ValueError(
            f"zero1_optimizer_sharding shards over a '{DATA_AXIS}' mesh "
            f"axis, but this mesh has axes {tuple(mesh.shape)} — ZeRO-1 "
            "needs a data-parallel axis (use make_mesh/make_hybrid_mesh, "
            "or disable training.zero_sharded_optimizer)")
    n = mesh.shape[DATA_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _data_axis_spec(leaf, n)),
        opt_state)
