"""Pipeline- and sequence-parallel forwards for the GATED ResidualViT
family, with aux (per-layer gate masks) flowing back to the loss
(VERDICT r3 #4: the model family this repo is about must train pipelined /
sequence-parallel WITH its gate regularizers).

Scope matches the fused train path's shipped-config mode (SURVEY.md §7.6):
sigmoid gates, 'attention+mlp' skip, learnable(-interpolate) budget token,
add_input=False, dropout 0. Reference semantics:
/root/reference/models/residualvit.py:130-260 (gate + masked-LN
plain_forward), :472-486 (budget token), as modeled by
peekvit_tpu/models/residualvit.py.

Numerics are the fp32 linen math (attention_core + exact-erf gelu +
two-pass LN), like the plain-ViT parallel forwards — parity vs the
single-device linen step is pinned in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from peekvit_tpu.parallel.mesh import MODEL_AXIS
from peekvit_tpu.parallel.pipeline import (
    STAGE_AXIS,
    pipeline_forward_aux,
)
from peekvit_tpu.parallel.sequence import _ln


def _gate_mask(lp, tokens, s, *, gate_temp, gate_bias, budget_token):
    """Sigmoid gate + learnable budget-token threshold (reference
    residualvit.py:58-69,154-165; fp32). tokens: (B, N, D) with layout
    [special(s), img, budget]. Returns mask (B, N_img, 1)."""
    img = tokens[:, s:-1].astype(jnp.float32)
    gp = lp["residual_gate"]["projection"]
    sig = jax.nn.sigmoid(
        (img @ gp["kernel"].astype(jnp.float32)
         + gp["bias"].astype(jnp.float32)) / gate_temp + gate_bias)
    if budget_token == "learnable":
        bg = lp["budget_token_gate"]
        thr = jax.nn.sigmoid(
            tokens[:, -1:].astype(jnp.float32) @ bg["kernel"].astype(
                jnp.float32) + bg["bias"].astype(jnp.float32))
        return jax.nn.relu(sig - thr)
    raise NotImplementedError(
        "parallel ResidualViT training supports budget_token='learnable' "
        "only: the other modes threshold on a WHOLE-batch mean of the "
        "evolving budget token (reference residualvit.py:208), which "
        "microbatching / batch sharding would silently change")


def _residual_block(lp, tokens, mask, s, num_heads, *, key_mask=None,
                    ln_eps=1e-6):
    """forward_skip_attention_mlp body after the gate (reference
    residualvit.py:216-233 -> plain_forward :175-183): masked input
    replaces the stream, mask * LN on both sublayers, masked attention
    output, unmasked MLP output."""
    from peekvit_tpu.ops.attention import attention_core

    b = tokens.shape[0]
    d = tokens.shape[-1]
    img = tokens[:, s:-1]
    ones = jnp.ones((b, 1, 1), jnp.float32)
    fwd_mask = jnp.concatenate(
        [jnp.ones((b, s, 1), jnp.float32), mask, ones], axis=1)
    if key_mask is not None:  # zero PADDED rows of the fwd mask (SP path)
        fwd_mask = fwd_mask * key_mask[..., None]
    t = jnp.concatenate(
        [tokens[:, :s], mask.astype(tokens.dtype) * img, tokens[:, -1:]],
        axis=1)

    at = lp["self_attention"]
    x = _ln(t, lp["ln_1"]["scale"], lp["ln_1"]["bias"], ln_eps) * fwd_mask
    qkv = x @ at["in_proj_kernel"] + at["in_proj_bias"]
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    y = attention_core(q, k, v, num_heads, key_mask=key_mask)
    y = (y @ at["out_proj_kernel"] + at["out_proj_bias"]) * fwd_mask
    x = y + t
    z = _ln(x, lp["ln_2"]["scale"], lp["ln_2"]["bias"], ln_eps) * fwd_mask
    z = jax.nn.gelu(z @ lp["mlp"]["fc1_kernel"] + lp["mlp"]["fc1_bias"],
                    approximate=False)
    return x + (z @ lp["mlp"]["fc2_kernel"] + lp["mlp"]["fc2_bias"])


def _embed_with_budget(params, images, budget_vec, *, patch_size,
                       num_class_tokens, num_registers, budget_token):
    """Front end shared by both parallel forwards: embed + pos (budget
    token excluded) + budget-token append (reference :472-486,601-603)."""
    from peekvit_tpu.inference import _embed

    cast = lambda t: t.astype(jnp.float32)  # noqa: E731
    tokens, d = _embed(params, images, patch_size, num_class_tokens,
                       num_registers, cast)
    tokens = tokens + cast(params["encoder"]["pos_embedding"])
    b = tokens.shape[0]
    bvec = budget_vec.astype(jnp.float32)[:, None, None]
    if budget_token == "learnable":
        btok = cast(params["learnable_budget_token_1"]) * bvec
    elif budget_token == "learnable_interpolate":
        btok = (cast(params["learnable_budget_token_1"]) * bvec
                + cast(params["learnable_budget_token_2"]) * (1.0 - bvec))
    else:
        btok = jnp.broadcast_to(bvec, (b, 1, d))
    return jnp.concatenate(
        [tokens, jnp.broadcast_to(btok, (b, 1, d))], axis=1), d


def stack_residual_stage_params(params, num_stages: int):
    """Residual encoder layer params (incl. gates) stacked with leading
    (num_stages, layers_per_stage) axes — contiguous layer groups."""
    enc = params["encoder"]
    ids = sorted(int(k.split("_")[1]) for k in enc if k.startswith("layers_"))
    if len(ids) % num_stages:
        raise ValueError(
            f"{len(ids)} encoder layers not divisible into "
            f"{num_stages} pipeline stages")
    lps = len(ids) // num_stages
    stages = []
    for s in range(num_stages):
        group = [enc[f"layers_{ids[s * lps + j]}"] for j in range(lps)]
        stages.append(jax.tree.map(lambda *ls: jnp.stack(ls), *group))
    return jax.tree.map(lambda *ls: jnp.stack(ls), *stages)


def pipelined_residualvit_forward(
    params, images, budget_vec, *, mesh: Mesh, num_microbatches: int,
    num_heads: int, patch_size: int, num_class_tokens: int = 1,
    num_registers: int = 0, gate_temp: float = 1.0, gate_bias: float = 0.0,
    budget_token="learnable", axis: str = STAGE_AXIS, data_axis: str = None):
    """Gated ResidualViT forward pipelined over the mesh's ``axis``.

    Each stage runs its layers' gate + masked block and emits the gate
    masks as pipeline AUX (pipeline_forward_aux); the stitched aux feeds
    LossCompose exactly like the single-device step. Returns
    ``(logits, aux)`` with aux['masks'][f'layer_{i}'] = (B, N_img, 1)
    and aux['current_budget'] = budget_vec.
    """
    tokens, d = _embed_with_budget(
        params, images, budget_vec, patch_size=patch_size,
        num_class_tokens=num_class_tokens, num_registers=num_registers,
        budget_token=budget_token)
    s = num_class_tokens + num_registers
    num_stages = mesh.shape[axis]
    stage_params = stack_residual_stage_params(params, num_stages)
    n_img = tokens.shape[1] - s - 1

    def stage_fn(p, act):
        lps = jax.tree.leaves(p)[0].shape[0]
        layer_masks = []
        for j in range(lps):  # static unroll over this stage's layers
            lp = jax.tree.map(lambda leaf: leaf[j], p)
            mask = _gate_mask(lp, act, s, gate_temp=gate_temp,
                              gate_bias=gate_bias, budget_token=budget_token)
            act = _residual_block(lp, act, mask, s, num_heads)
            layer_masks.append(mask)
        # BATCH-LEADING (mb, lps, N_img, 1): pipeline_forward_aux's dp
        # out_spec shards aux dim 2 (after the (S, M) prefix), so the
        # within-microbatch batch must be the leaf's leading dim
        return act, jnp.stack(layer_masks, axis=1)

    out, aux_stacked = pipeline_forward_aux(
        stage_fn, stage_params, tokens, mesh=mesh,
        num_microbatches=num_microbatches, axis=axis, data_axis=data_axis)

    # aux_stacked: (S, M, mb, lps, N_img, 1) -> per-layer (B, N_img, 1)
    S, M, mb, lps = aux_stacked.shape[:4]
    masks = {}
    for st in range(S):
        for j in range(lps):
            masks[f"layer_{st * lps + j}"] = aux_stacked[st, :, :, j].reshape(
                M * mb, n_img, 1)

    from peekvit_tpu.inference import _classify

    logits = _classify(params, out, num_class_tokens,
                       lambda t: t.astype(jnp.float32), 1e-5)
    return logits, {"masks": masks, "current_budget": budget_vec}


def sequence_parallel_residualvit_forward(
    params, images, budget_vec, *, mesh: Mesh, num_heads: int,
    patch_size: int, num_class_tokens: int = 1, num_registers: int = 0,
    gate_temp: float = 1.0, gate_bias: float = 0.0,
    budget_token="learnable", axis: str = MODEL_AXIS,
    data_axis: str = None):
    """Gated ResidualViT forward with the TOKEN axis sharded over ``axis``
    (model-level Megatron-SP, lifting parallel/sequence.py to the gated
    family).

    - The gate projection and masked-LN/MLP math are token-local; the
      learnable budget-token threshold needs the (evolving) budget token
      on every shard, recovered with one tiny psum per layer (the budget
      position's owner contributes, others add zero).
    - Padded positions are excluded as attention KEYS and zeroed in the
      forward mask; GATED tokens are NOT key-excluded (linen semantics:
      masked tokens attend with zeroed features, residualvit.py:249-260).
    - Per-layer masks are emitted (sharded over tokens, reassembled by the
      out_spec) so LossCompose applies unchanged.
    """
    import numpy as np

    tokens, d = _embed_with_budget(
        params, images, budget_vec, patch_size=patch_size,
        num_class_tokens=num_class_tokens, num_registers=num_registers,
        budget_token=budget_token)
    s_special = num_class_tokens + num_registers
    b, n, _ = tokens.shape
    n_img = n - s_special - 1
    sdev = mesh.shape[axis]
    n_pad = -(-n // sdev) * sdev
    tokens = jnp.pad(tokens, ((0, 0), (0, n_pad - n), (0, 0)))
    pos = np.arange(n_pad)
    pad_valid = (pos < n).astype(np.float32)          # real token?
    is_img = ((pos >= s_special) & (pos < n - 1)).astype(np.float32)
    is_budget = (pos == n - 1).astype(np.float32)
    enc = params["encoder"]
    layer_ids = sorted(int(k.split("_")[1]) for k in enc
                       if k.startswith("layers_"))

    from peekvit_tpu.ops.attention import attention_core

    def body(p, t):
        # t: (B_local, n_pad/s, D) local token shard; static per-shard
        # position masks come from slicing the global constants by shard
        idx = jax.lax.axis_index(axis)
        npl = t.shape[1]
        start = idx * npl
        loc = lambda v: jax.lax.dynamic_slice(  # noqa: E731
            jnp.asarray(v, jnp.float32), (start,), (npl,))
        l_valid = loc(pad_valid)[None, :, None]
        l_img = loc(is_img)[None, :, None]
        l_budget = loc(is_budget)[None, :, None]
        b_l = t.shape[0]
        key_mask = jnp.broadcast_to(loc(pad_valid)[None, :], (b_l, npl))
        key_mask = jax.lax.all_gather(key_mask, axis, axis=1, tiled=True)

        masks = []
        for i in layer_ids:
            lp = p[f"layers_{i}"]
            tf = t.astype(jnp.float32)
            # gate: token-local Dense(1) everywhere, masked to img positions
            gp = lp["residual_gate"]["projection"]
            sig = jax.nn.sigmoid(
                (tf @ gp["kernel"].astype(jnp.float32)
                 + gp["bias"].astype(jnp.float32)) / gate_temp + gate_bias)
            if budget_token != "learnable":
                raise NotImplementedError(
                    "SP ResidualViT needs budget_token='learnable' (other "
                    "modes threshold on a whole-batch mean)")
            # budget token lives on ONE shard: psum recovers it
            btok = jax.lax.psum(
                jnp.sum(tf * l_budget, axis=1, keepdims=True), axis)
            bg = lp["budget_token_gate"]
            thr = jax.nn.sigmoid(
                btok @ bg["kernel"].astype(jnp.float32)
                + bg["bias"].astype(jnp.float32))
            mask_full = jax.nn.relu(sig - thr)  # (B, npl, 1) all positions
            # img positions gate; special + budget stay 1; padded stay 0
            fwd_mask = (mask_full * l_img
                        + (l_valid - l_img)) * l_valid
            masks.append(mask_full * l_img)

            t = (tf * jnp.where(l_img > 0, mask_full, 1.0) * l_valid)
            at = lp["self_attention"]
            x = _ln(t, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                    1e-6) * fwd_mask
            qkv = x @ at["in_proj_kernel"] + at["in_proj_bias"]
            q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
            k = jax.lax.all_gather(k, axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, axis, axis=1, tiled=True)
            y = attention_core(q, k, v, num_heads, key_mask=key_mask)
            y = (y @ at["out_proj_kernel"] + at["out_proj_bias"]) * fwd_mask
            x = y + t
            z = _ln(x, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                    1e-6) * fwd_mask
            z = jax.nn.gelu(z @ lp["mlp"]["fc1_kernel"]
                            + lp["mlp"]["fc1_bias"], approximate=False)
            t = x + (z @ lp["mlp"]["fc2_kernel"] + lp["mlp"]["fc2_bias"])
        return t, jnp.stack(masks)  # (L, B, npl, 1)

    tok_spec = (P(data_axis, axis, None) if data_axis
                else P(None, axis, None))
    mask_spec = (P(None, data_axis, axis, None) if data_axis
                 else P(None, None, axis, None))
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), tok_spec),
        out_specs=(tok_spec, mask_spec),
        check_rep=False,
    )
    out, masks_stacked = fn(enc, tokens)

    from peekvit_tpu.inference import _classify

    logits = _classify(params, out[:, :n], num_class_tokens,
                       lambda t: t.astype(jnp.float32), 1e-5)
    masks = {f"layer_{i}": masks_stacked[li][:, s_special:n - 1]
             for li, i in enumerate(layer_ids)}
    return logits, {"masks": masks, "current_budget": budget_vec}
