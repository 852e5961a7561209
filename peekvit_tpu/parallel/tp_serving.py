"""Tensor-parallel SERVING for the plain-ViT engine family.

Completes the parallelism matrix on the inference side: the engines'
data-parallel shard_map (inference.py ``InferenceEngine._jit``) scales
throughput, this module scales LATENCY — one forward's compute split
over the mesh's ``model`` axis, the Megatron way (head-sharded
attention, column/row-sharded MLP; one psum per sublayer riding ICI).
The reference has no parallelism of any kind (SURVEY.md §2 inventory;
/root/reference/train/train.py:61 ``model.to(device)``).

When it pays: each layer costs two fp32 (B, N, D) psums over ICI, so TP
wins when per-chip compute saved > psum time. Analytically (v5e ICI
~90 GB/s/link bidir): ViT-B bs1 is ~16 us/layer of compute against
~13 us/layer of psum traffic — near break-even, keep it on one chip;
ViT-H (69 us/layer, psum ~21 us at N=257, D=1280) gains ~2.3x latency
at TP=4 — TP serving is for models whose per-layer compute dwarfs one
chip, exactly the regime the training-side TP rules target
(mesh.py: "when hidden_dim outgrows one chip"). Unmeasurable in this
1-chip environment; the parity tests + dryrun pin correctness on the
virtual mesh.

Design: Pallas calls are not GSPMD-partitionable, so the schedule is
explicit — ``shard_map`` over a (data, model) mesh where each model
shard holds its slice of every layer's weights (leading shard axis,
``P(MODEL_AXIS)``) and runs the PARTIAL sublayer kernels
(ops/pallas/tp_blocks.py) on the replicated token stream; ``lax.psum``
completes each sublayer and bias + residual are added once, in fp32,
after the reduction. Embed and classify are token-cheap and run
replicated on every model shard (re-computing them is faster than
gathering). The batch axis composes: images arrive ``P(DATA_AXIS)``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from peekvit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def prepare_tp_serving_params(params, n_model: int, num_heads: int,
                              compute_dtype=jnp.bfloat16):
    """Slice a plain-ViT param tree into Megatron serving shards.

    Runs the engine's build-time preparation first (fp32->compute-dtype
    cast, (1, k) bias pre-shaping, LN/pos folding — inference.py
    ``prepare_engine_params(fold_ln=True)``), then slices every layer:

    - folded qkv (D, 3D) -> per-shard (D, 3*dl) blocks ``[q_s|k_s|v_s]``
      where dl = D/n_model covers that shard's heads (head-major packing
      means a shard's q/k/v slices are contiguous columns);
    - out-proj (D, D) -> (dl, D) row slices (row-parallel);
    - folded fc1 (D, M) + bias -> (D, M/n_model) column slices;
    - fc2 (M, D) -> (M/n_model, D) row slices.

    Returns ``{"shared": ..., "tp": ...}``: ``shared`` carries the embed
    constants, per-layer out-proj/fc2 biases stacked (L, 1, D) (added
    once, post-psum), the final LN and the head — replicated; ``tp``
    carries the weight slices stacked with a LEADING SHARD AXIS
    ((S, L, ...)) so a plain ``P(MODEL_AXIS)`` in_spec distributes them.
    """
    from peekvit_tpu.inference import _layer_ids, prepare_engine_params

    if n_model < 2:
        raise ValueError(f"tensor-parallel serving needs n_model >= 2 "
                         f"(got {n_model}); use the data-parallel engine")
    if num_heads % n_model:
        raise ValueError(
            f"num_heads={num_heads} must be divisible by the model-axis "
            f"size {n_model} (head-sharded attention)")
    prep = prepare_engine_params(params, compute_dtype, fold_ln=True)
    enc = prep["encoder"]
    ids = _layer_ids(enc)
    d = prep["conv_proj"]["kernel"].shape[-1]
    mlp_dim = enc[f"layers_{ids[0]}"]["mlp"]["fc2_kernel"].shape[0]
    if mlp_dim % n_model:
        raise ValueError(
            f"mlp_dim={mlp_dim} must be divisible by the model-axis "
            f"size {n_model} (column-parallel fc1)")
    dl, ml = d // n_model, mlp_dim // n_model

    wqkv, bqkv, wo, w1, b1, w2, bo, b2 = ([] for _ in range(8))
    for i in ids:
        lp = enc[f"layers_{i}"]
        fq, f1 = lp["_folded_qkv"], lp["_folded_fc1"]
        at, mlp = lp["self_attention"], lp["mlp"]
        wq, bq = fq["kernel"], fq["bias"]
        wqkv.append(jnp.stack([
            jnp.concatenate(
                [wq[:, c * d + s * dl:c * d + (s + 1) * dl]
                 for c in range(3)], axis=1)
            for s in range(n_model)]))
        bqkv.append(jnp.stack([
            jnp.concatenate(
                [bq[:, c * d + s * dl:c * d + (s + 1) * dl]
                 for c in range(3)], axis=1)
            for s in range(n_model)]))
        wo.append(jnp.stack(jnp.split(at["out_proj_kernel"], n_model,
                                      axis=0)))
        w1.append(jnp.stack(jnp.split(f1["kernel"], n_model, axis=1)))
        b1.append(jnp.stack(jnp.split(f1["bias"], n_model, axis=1)))
        w2.append(jnp.stack(jnp.split(mlp["fc2_kernel"], n_model, axis=0)))
        bo.append(at["out_proj_bias"])
        b2.append(mlp["fc2_bias"])

    stack_l = lambda xs: jnp.stack(xs, axis=1)  # noqa: E731 — (S, L, ...)
    tp = {"wqkv": stack_l(wqkv), "bqkv": stack_l(bqkv), "wo": stack_l(wo),
          "w1": stack_l(w1), "b1": stack_l(b1), "w2": stack_l(w2)}
    shared = {
        "conv_proj": prep["conv_proj"],
        "_embed_special": prep["_embed_special"],
        "_embed_img_bias": prep["_embed_img_bias"],
        "encoder": {"ln": enc["ln"]},
        "head": prep["head"],
        "bo": jnp.stack(bo),  # (L, 1, D)
        "b2": jnp.stack(b2),
    }
    return {"shared": shared, "tp": tp}


def place_tp_serving_params(prepared, mesh):
    """Device-put the prepared tree: tp slices sharded over the model
    axis (each chip holds 1/n_model of every layer), shared replicated."""
    tp_sh = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    return {
        "shared": jax.tree.map(lambda x: jax.device_put(x, rep),
                               prepared["shared"]),
        "tp": jax.tree.map(lambda x: jax.device_put(x, tp_sh),
                           prepared["tp"]),
    }


def make_tp_vit_forward(mesh, *, num_heads: int, patch_size: int,
                        num_class_tokens: int = 1, ln_eps: float = 1e-5,
                        compute_dtype=jnp.bfloat16, interpret: bool = False,
                        images_per_cell: int = 1, rank_layers=(),
                        budget: Optional[float] = None):
    """Build the jittable TP serving forward: (prepared, images) -> logits.

    The returned fn is a ``shard_map`` over the full (data, model) mesh:
    images split over ``data``, weight slices over ``model``, logits
    assembled over ``data`` (replicated over ``model`` — every model
    shard finishes with identical post-psum activations).

    ``rank_layers`` + ``budget`` add the RankViT EXACT physical drop
    (reference rankvit.py:55-77, same f32-ceil semantics as the
    single-device exact-drop engine): because TP keeps activations fully
    replicated — only weights are sharded — the norm/top_k/gather runs
    identically on every model shard (psum outputs are bitwise identical
    across shards), so the shrinking token shapes stay consistent with
    no extra collective. One compiled fn per static budget, as in the
    single-device mode.
    """
    from jax.experimental.shard_map import shard_map

    from peekvit_tpu.inference import _classify, _embed_posfolded
    from peekvit_tpu.ops.pallas.tp_blocks import (
        tp_attention_partial,
        tp_mlp_partial,
    )

    n_model = mesh.shape[MODEL_AXIS]
    heads_local = num_heads // n_model
    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    rank_layers = tuple(rank_layers or ())

    def shard_fn(prepared, images):
        shared, tp = prepared["shared"], prepared["tp"]
        tokens, _ = _embed_posfolded(shared, images, patch_size, cast)
        num_layers = shared["bo"].shape[0]
        for l in range(num_layers):
            if l in rank_layers and budget is not None and budget < 1.0:
                c = num_class_tokens
                n_alive = tokens.shape[1] - c
                n_keep = int(np.ceil(np.float32(n_alive)
                                     * np.float32(budget)))
                img = tokens[:, c:]
                norms = jnp.linalg.norm(img.astype(jnp.float32), axis=-1)
                _, idx = jax.lax.top_k(norms, n_keep)
                kept = jnp.take_along_axis(img, idx[..., None], axis=1)
                tokens = jnp.concatenate([tokens[:, :c], kept], axis=1)
            pa = tp_attention_partial(
                tokens, tp["wqkv"][0, l], tp["bqkv"][0, l], tp["wo"][0, l],
                heads_local, ln_eps, interpret, images_per_cell)
            pa = jax.lax.psum(pa, MODEL_AXIS)
            tokens = (tokens.astype(jnp.float32) + pa
                      + shared["bo"][l].astype(jnp.float32)).astype(
                          compute_dtype)
            pm = tp_mlp_partial(
                tokens, tp["w1"][0, l], tp["b1"][0, l], tp["w2"][0, l],
                ln_eps, interpret, images_per_cell)
            pm = jax.lax.psum(pm, MODEL_AXIS)
            tokens = (tokens.astype(jnp.float32) + pm
                      + shared["b2"][l].astype(jnp.float32)).astype(
                          compute_dtype)
        return _classify(shared, tokens, num_class_tokens, cast, ln_eps)

    in_specs = ({"shared": P(), "tp": P(MODEL_AXIS)}, P(DATA_AXIS))
    return jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=P(DATA_AXIS),
        check_rep=False,
    ))


def prepare_tp_residual_serving_params(params, n_model: int, num_heads: int,
                                       compute_dtype=jnp.bfloat16,
                                       early_exits: bool = False):
    """Slice a ResidualViT param tree into Megatron serving shards.

    Unlike the plain-ViT prep this does NOT fold LN (the gate masks
    multiply the affined LN output row-wise, which does not commute with
    a folded bias — same reason the single-device masked engine stays
    unfolded, inference.prepare_engine_params docstring). Layout:

    - ``tp`` (leading shard axis, ``P(MODEL_AXIS)``): in_proj (D, 3*dl)
      head-grouped column slices ``[q_s|k_s|v_s]`` + bias slices,
      out-proj (dl, D) row slices, fc1 (D, M/n) column slices + bias,
      fc2 (M/n, D) row slices — stacked (S, L, ...);
    - ``shared`` (replicated): embed constants, per-layer LN affines
      (L, 1, D), fp32 gate/budget-token-gate projections (L, D, 1) /
      (L, 1), post-psum biases bo/b2 (L, 1, D), learnable budget
      token(s), final LN + head, and (EE models) the per-layer exit
      heads stacked.
    """
    from peekvit_tpu.inference import _layer_ids, prepare_engine_params

    if n_model < 2:
        raise ValueError(f"tensor-parallel serving needs n_model >= 2 "
                         f"(got {n_model}); use the data-parallel engine")
    if num_heads % n_model:
        raise ValueError(
            f"num_heads={num_heads} must be divisible by the model-axis "
            f"size {n_model} (head-sharded attention)")
    prep = prepare_engine_params(params, compute_dtype)
    enc = prep["encoder"]
    ids = _layer_ids(enc)
    d = prep["conv_proj"]["kernel"].shape[-1]
    mlp_dim = enc[f"layers_{ids[0]}"]["mlp"]["fc1_kernel"].shape[-1]
    if mlp_dim % n_model:
        raise ValueError(
            f"mlp_dim={mlp_dim} must be divisible by the model-axis "
            f"size {n_model} (column-parallel fc1)")
    dl = d // n_model

    tp_lists = {k: [] for k in ("wqkv", "bqkv", "wo", "w1", "b1", "w2")}
    sh_lists = {k: [] for k in ("ln1s", "ln1b", "ln2s", "ln2b", "gk", "gb",
                                "bo", "b2")}
    ee_lists = {k: [] for k in ("ee_lns", "ee_lnb", "ee_hk", "ee_hb")}
    has_btg = "budget_token_gate" in enc[f"layers_{ids[0]}"]
    if has_btg:
        sh_lists["bgk"], sh_lists["bgb"] = [], []
    for i in ids:
        lp = enc[f"layers_{i}"]
        at, mlp = lp["self_attention"], lp["mlp"]
        wq, bq = at["in_proj_kernel"], at["in_proj_bias"]
        tp_lists["wqkv"].append(jnp.stack([
            jnp.concatenate(
                [wq[:, c * d + s * dl:c * d + (s + 1) * dl]
                 for c in range(3)], axis=1)
            for s in range(n_model)]))
        tp_lists["bqkv"].append(jnp.stack([
            jnp.concatenate(
                [bq[:, c * d + s * dl:c * d + (s + 1) * dl]
                 for c in range(3)], axis=1)
            for s in range(n_model)]))
        tp_lists["wo"].append(
            jnp.stack(jnp.split(at["out_proj_kernel"], n_model, axis=0)))
        tp_lists["w1"].append(
            jnp.stack(jnp.split(mlp["fc1_kernel"], n_model, axis=1)))
        tp_lists["b1"].append(
            jnp.stack(jnp.split(mlp["fc1_bias"], n_model, axis=1)))
        tp_lists["w2"].append(
            jnp.stack(jnp.split(mlp["fc2_kernel"], n_model, axis=0)))
        sh_lists["ln1s"].append(lp["ln_1"]["scale"])
        sh_lists["ln1b"].append(lp["ln_1"]["bias"])
        sh_lists["ln2s"].append(lp["ln_2"]["scale"])
        sh_lists["ln2b"].append(lp["ln_2"]["bias"])
        gp = lp["residual_gate"]["projection"]
        sh_lists["gk"].append(gp["kernel"])
        sh_lists["gb"].append(gp["bias"])
        if has_btg:
            bg = lp["budget_token_gate"]
            sh_lists["bgk"].append(bg["kernel"])
            sh_lists["bgb"].append(bg["bias"])
        sh_lists["bo"].append(at["out_proj_bias"])
        sh_lists["b2"].append(mlp["fc2_bias"])
        if early_exits:
            ee_lists["ee_lns"].append(enc[f"early_exit_heads_{i}_ln"]["scale"])
            ee_lists["ee_lnb"].append(enc[f"early_exit_heads_{i}_ln"]["bias"])
            ee_lists["ee_hk"].append(enc[f"early_exit_heads_{i}_head"]["kernel"])
            ee_lists["ee_hb"].append(enc[f"early_exit_heads_{i}_head"]["bias"])

    tp = {k: jnp.stack(v, axis=1) for k, v in tp_lists.items()}  # (S, L, .)
    shared = {
        "conv_proj": prep["conv_proj"],
        "class_tokens": prep["class_tokens"],
        "encoder": {"ln": enc["ln"], "pos_embedding": enc["pos_embedding"]},
        "head": prep["head"],
    }
    if "register_tokens" in prep:
        shared["register_tokens"] = prep["register_tokens"]
    for key in ("learnable_budget_token_1", "learnable_budget_token_2"):
        if key in prep:
            shared[key] = prep[key]
    shared.update({k: jnp.stack(v) for k, v in sh_lists.items()})
    if early_exits:
        shared.update({k: jnp.stack(v) for k, v in ee_lists.items()})
    return {"shared": shared, "tp": tp}


def make_tp_residual_forward(mesh, *, num_heads: int, patch_size: int,
                             num_class_tokens: int = 1,
                             num_registers: int = 0, gate_temp: float = 1.0,
                             gate_bias: float = 0.0,
                             budget_token="learnable",
                             compute_dtype=jnp.bfloat16,
                             interpret: bool = False,
                             images_per_cell: int = 1,
                             early_exits: bool = False):
    """Build the jittable TP ResidualViT serving forward:
    (prepared, images, budget) -> logits (or the EE tuple).

    Mirrors ``inference.residualvit_forward_fused`` (sigmoid gates,
    'attention+mlp' skip, budget token — the shipped-config mode) over
    the Megatron schedule: gates are batch-cheap fp32 XLA math on the
    REPLICATED token stream with replicated projections — every model
    shard computes bitwise-identical masks with no collective (the same
    property the RankViT TP drop exploits) — while the two compute-heavy
    sublayers run as masked PARTIAL kernels + one psum each. ``budget``
    stays a traced scalar: the whole sweep shares one compilation, like
    the single-device engine. The non-learnable budget-token modes take
    the reference's WHOLE-batch budget-token mean (residualvit.py:208),
    which under a dp x tp mesh must span the data axis — pmean'd inside
    the shard_map.
    """
    from jax.experimental.shard_map import shard_map

    from peekvit_tpu.inference import _classify, _embed, _layer_norm
    from peekvit_tpu.ops.pallas.tp_blocks import (
        tp_masked_attention_partial,
        tp_masked_mlp_partial,
    )

    n_model = mesh.shape[MODEL_AXIS]
    heads_local = num_heads // n_model
    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    c = num_class_tokens
    s = c + num_registers

    def shard_fn(prepared, images, budget):
        shared, tp = prepared["shared"], prepared["tp"]
        tokens, d = _embed(shared, images, patch_size, c, num_registers,
                           cast)
        b = tokens.shape[0]
        tokens = tokens + cast(shared["encoder"]["pos_embedding"])

        budget_vec = jnp.broadcast_to(
            jnp.asarray(budget, jnp.float32), (b,))[:, None, None]
        bcast = budget_vec.astype(compute_dtype)
        if budget_token == "learnable":
            btok = cast(shared["learnable_budget_token_1"]) * bcast
        elif budget_token == "learnable_interpolate":
            btok = (cast(shared["learnable_budget_token_1"]) * bcast
                    + cast(shared["learnable_budget_token_2"])
                    * (1.0 - bcast))
        else:
            btok = jnp.broadcast_to(bcast, (b, 1, d))
        btok = jnp.broadcast_to(btok, (b, 1, d))
        tokens = jnp.concatenate([tokens, btok], axis=1)

        num_layers = shared["bo"].shape[0]
        exits = []
        for l in range(num_layers):
            # ---- gate: replicated fp32 XLA math, identical per shard
            img = tokens[:, s:-1]
            logits = (img.astype(jnp.float32)
                      @ shared["gk"][l].astype(jnp.float32)
                      + shared["gb"][l].astype(jnp.float32))
            sig = jax.nn.sigmoid(logits / gate_temp + gate_bias)
            if budget_token == "learnable":
                thr = jax.nn.sigmoid(
                    tokens[:, -1:].astype(jnp.float32)
                    @ shared["bgk"][l].astype(jnp.float32)
                    + shared["bgb"][l].astype(jnp.float32))
                mask = jax.nn.relu(sig - thr)
            else:
                # reference quirk (residualvit.py:208): WHOLE-batch mean
                # of the budget token — spans the data axis under dp
                cur_b = jnp.mean(tokens[:, -1:].astype(jnp.float32))
                cur_b = jax.lax.pmean(cur_b, DATA_AXIS)
                mask = jax.nn.relu(sig - (1.0 - cur_b))
            mask_f32 = mask  # (B, N_img, 1) fp32
            mask_c = mask.astype(compute_dtype)

            ones = jnp.ones((b, 1, 1), jnp.float32)
            fwd_mask = jnp.concatenate(
                [jnp.ones((b, s, 1), jnp.float32), mask_f32, ones], axis=1)
            tokens = jnp.concatenate(
                [tokens[:, :s], mask_c * img, tokens[:, -1:]], axis=1)

            pa = tp_masked_attention_partial(
                tokens, fwd_mask.astype(compute_dtype),
                shared["ln1s"][l].astype(compute_dtype),
                shared["ln1b"][l].astype(compute_dtype),
                tp["wqkv"][0, l], tp["bqkv"][0, l], tp["wo"][0, l],
                heads_local, 1e-6, interpret, images_per_cell)
            pa = jax.lax.psum(pa, MODEL_AXIS)
            tokens = (((pa + shared["bo"][l].astype(jnp.float32)) * fwd_mask
                       + tokens.astype(jnp.float32))
                      .astype(compute_dtype))
            pm = tp_masked_mlp_partial(
                tokens, fwd_mask.astype(compute_dtype),
                shared["ln2s"][l].astype(compute_dtype),
                shared["ln2b"][l].astype(compute_dtype),
                tp["w1"][0, l], tp["b1"][0, l], tp["w2"][0, l],
                1e-6, interpret, images_per_cell)
            pm = jax.lax.psum(pm, MODEL_AXIS)
            tokens = ((pm + shared["b2"][l].astype(jnp.float32)
                       + tokens.astype(jnp.float32)).astype(compute_dtype))
            if early_exits:
                cls = _layer_norm(tokens[:, :c],
                                  cast(shared["ee_lns"][l]),
                                  cast(shared["ee_lnb"][l]), 1e-5)[:, 0]
                exits.append((cls @ cast(shared["ee_hk"][l])
                              + cast(shared["ee_hb"][l][0])).astype(
                                  jnp.float32))

        final = _classify(shared, tokens, c, cast, 1e-5)
        if early_exits:
            return tuple(exits) + (final,)
        return final

    in_specs = ({"shared": P(), "tp": P(MODEL_AXIS)}, P(DATA_AXIS), P())
    # a single P(DATA_AXIS) is a pytree PREFIX of the output, so it covers
    # both the plain logits and the EE (exit_0, ..., final) tuple
    out_specs = P(DATA_AXIS)
    return jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    ))


def tp_serving_engine(model, mesh, *, compute_dtype=jnp.bfloat16,
                      interpret: Optional[bool] = None,
                      images_per_cell: int = 1, ee_outputs: bool = False):
    """(prepared_params, make_fn) for TP serving of a built model.

    Covers plain ViT, RankViT (exact physical drop), and the ResidualViT
    family in its shipped-config mode (sigmoid gates, 'attention+mlp'
    skip, budget token) — including the EE variant's final logits and,
    with ``ee_outputs=True``, its per-layer exit tuple.

    ``make_fn(budget)`` returns a jitted fn: plain ViT uses
    ``make_fn(None)`` -> (prepared, images) -> logits; RankViT builds one
    per static budget (exact physical drop); ResidualViT's
    ``make_fn(None)`` -> (prepared, images, traced_budget) -> logits (one
    compilation for the whole sweep). Used by ``InferenceEngine`` when
    its mesh carries a model axis > 1; exposed for direct use. Batch must
    divide the mesh's data-axis size.
    """
    module = model.module
    name = type(module).__name__
    residual_family = name in ("ResidualVisionTransformer",
                               "EEResidualVisionTransformer",
                               "ResidualVisionTransformerWithDecoder")
    if name not in ("VisionTransformer",
                    "RankVisionTransformer") and not residual_family:
        raise NotImplementedError(
            "tensor-parallel serving covers the plain/Rank "
            "VisionTransformer and ResidualViT-family engines; serve "
            "other families data-parallel (mesh with model axis 1) — "
            "their routing/ACT control flow has no TP partial kernels")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if DATA_AXIS not in mesh.shape or MODEL_AXIS not in mesh.shape:
        raise ValueError(
            f"tensor-parallel serving needs a ({DATA_AXIS}, {MODEL_AXIS}) "
            f"mesh (parallel.make_mesh / make_hybrid_mesh); got axes "
            f"{tuple(mesh.shape)}")
    n_model = mesh.shape[MODEL_AXIS]

    if residual_family:
        layers = (module.residual_layers
                  or ["attention+mlp"] * module.num_layers)
        if (set(layers) != {"attention+mlp"}
                or module.gate_type != "sigmoid"
                or module.add_input
                or not module.add_budget_token):
            raise NotImplementedError(
                "TP ResidualViT serving supports the shipped-config mode "
                "(sigmoid gates, attention+mlp skip, budget token, "
                "add_input=False) — same envelope as the single-device "
                "fused engine")
        prepared = prepare_tp_residual_serving_params(
            model.params, n_model, module.num_heads, compute_dtype,
            early_exits=ee_outputs)
        prepared = place_tp_serving_params(prepared, mesh)

        def make_fn(budget: Optional[float]):
            return make_tp_residual_forward(
                mesh, num_heads=module.num_heads,
                patch_size=module.patch_size,
                num_class_tokens=getattr(module, "num_class_tokens", 1),
                num_registers=getattr(module, "num_registers", 0),
                gate_temp=module.gate_temp, gate_bias=module.gate_bias,
                budget_token=module.add_budget_token,
                compute_dtype=compute_dtype, interpret=interpret,
                images_per_cell=images_per_cell, early_exits=ee_outputs)

        return prepared, make_fn

    prepared = prepare_tp_serving_params(
        model.params, n_model, module.num_heads, compute_dtype)
    prepared = place_tp_serving_params(prepared, mesh)
    rank_layers = tuple(getattr(module, "rankvit_layers", ()) or ())

    def make_fn(budget: Optional[float]):
        return make_tp_vit_forward(
            mesh, num_heads=module.num_heads, patch_size=module.patch_size,
            num_class_tokens=getattr(module, "num_class_tokens", 1),
            compute_dtype=compute_dtype, interpret=interpret,
            images_per_cell=images_per_cell, rank_layers=rank_layers,
            budget=budget)

    return prepared, make_fn
