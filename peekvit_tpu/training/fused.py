"""Fused mixed-precision training path for the plain-ViT family.

Mirrors peekvit_tpu/inference.py's engine but differentiable: the attention
sublayer runs through the custom-VJP Pallas block
(ops/pallas/fused_attention_vjp) so neither direction materializes fp32
score matrices in HBM; the MLP half and all weight-grad matmuls stay on
XLA (already at MXU peak). Master params stay fp32; compute is bf16
(grads accumulate fp32 through the cast).

Numerical parity with the linen train step is pinned in
tests/test_fused_training.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from peekvit_tpu.inference import (_classify, _embed,
                                   _layer_ids, _layer_norm)


def _train_layer_fusable(d: int, m: int, itemsize: int = 2,
                         budget: int = 80 * 1024 * 1024) -> bool:
    """Can the merged-layer VJP kernel hold one layer's weights (compute
    dtype) PLUS its fp32 weight-gradient accumulators in VMEM?  ViT-B
    (d=768, m=3072): 14 MB weights + 28 MB accumulators -> yes."""
    weight_elems = d * 3 * d + d * d + d * m + m * d
    return weight_elems * (itemsize + 4) < budget


def vit_forward_trainable(params, images, *, patch_size: int, num_heads: int,
                          num_class_tokens: int = 1, num_registers: int = 0,
                          ln_eps: float = 1e-5, compute_dtype=jnp.bfloat16,
                          remat: bool = False,
                          interpret: bool = False,
                          merged="auto", save_qkv="auto") -> jax.Array:
    """Differentiable fused eval/train forward (no dropout paths — the
    reference ViT configs all train with dropout 0.0).

    ``merged`` selects the per-layer kernelization. The v5e A/B
    (benchmarks/train_step.py -> train_step.json, ViT-B/16 bs256,
    fwd+bwd+adam) ranks them:

      split 240 ms < split+remat 290 ~ merged VJP 298 < hybrid 386
      < linen fp32 500

    so 'auto' = False = the SPLIT path (custom-VJP attention kernel + XLA
    MLP): XLA batches the MLP/weight-grad matmuls over the whole (B*N)
    dimension at full MXU efficiency and SAVES the gelu input, which beats
    both recompute strategies. True (the all-Pallas merged VJP, per-cell
    VMEM-accumulated weight grads) and 'hybrid' (merged Pallas forward +
    XLA-recompute backward) are kept as measured NEGATIVES with pinned
    grad parity — the round-3 merged-kernel INFERENCE win does not carry
    to training, where the backward's batched gradient matmuls dominate.

    ``remat=True`` wraps each split-path block in jax.checkpoint (the
    merged backward already recomputes the forward flash-style, so remat
    is a no-op there).
    """
    from peekvit_tpu.ops.pallas.fused_attention_vjp import (
        attention_block_trainable,
    )
    from peekvit_tpu.ops.pallas.fused_layer_vjp import (
        layer_block_hybrid,
        layer_block_trainable,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    tokens, d = _embed(params, images, patch_size, num_class_tokens,
                       num_registers, cast)
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])
    if merged == "auto":
        merged = False  # measured best (see docstring ranking)

    if merged:
        block = (layer_block_hybrid if merged == "hybrid"
                 else layer_block_trainable)

        def layer(tokens, lp):
            at = lp["self_attention"]
            return block(
                tokens,
                cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]),
                cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                cast(lp["mlp"]["fc1_kernel"]), cast(lp["mlp"]["fc1_bias"]),
                cast(lp["mlp"]["fc2_kernel"]), cast(lp["mlp"]["fc2_bias"]),
                num_heads, ln_eps, interpret, 1,
            )
    else:
        if save_qkv == "auto":
            # measured WIN at ViT-B/16 bs256: 218.9 -> 204.6 ms/step
            # (+6.9%, benchmarks/train_step.json split_saveqkv_bf16) — the
            # (B, N, 3D) HBM round trip is cheaper than the backward's
            # LN+qkv matmul recompute plus XLA's fp32 LN rematerialization.
            # Under remat the checkpointed fwd re-runs in the backward and
            # re-writes the save, so the trade is unmeasured there — keep
            # the recompute-everything shape remat exists for.
            save_qkv = not remat

        def layer(tokens, lp):
            at = lp["self_attention"]
            tokens = attention_block_trainable(
                tokens,
                cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]),
                cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
                num_heads, ln_eps, interpret, 1, save_qkv,
            )
            z = _layer_norm(tokens, cast(lp["ln_2"]["scale"]),
                            cast(lp["ln_2"]["bias"]), ln_eps)
            z = jax.nn.gelu(z @ cast(lp["mlp"]["fc1_kernel"])
                            + cast(lp["mlp"]["fc1_bias"]))
            return tokens + (z @ cast(lp["mlp"]["fc2_kernel"])
                             + cast(lp["mlp"]["fc2_bias"]))

        if remat:
            layer = jax.checkpoint(layer)
    for i in _layer_ids(enc):
        tokens = layer(tokens, enc[f"layers_{i}"])

    return _classify(params, tokens, num_class_tokens, cast, ln_eps)


def make_fused_train_step(model, tx, compute_dtype=jnp.bfloat16,
                          remat: bool = False,
                          interpret: Optional[bool] = None,
                          merged="auto", save_qkv="auto"):
    """Jitted (params, opt_state, x, y) -> (params, opt_state, loss) for a
    plain ViT with the fused-attention training path.

    params/opt_state are DONATED (rebind them from the return value, as the
    Trainer does): without donation every step pays an extra ~1 GB of
    HBM alloc+copy for the 86.6M-param fp32 tree + adam state."""
    import optax

    module = model.module
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fwd = functools.partial(
        vit_forward_trainable,
        patch_size=module.patch_size,
        num_heads=module.num_heads,
        num_class_tokens=getattr(module, "num_class_tokens", 1),
        num_registers=getattr(module, "num_registers", 0),
        ln_eps=getattr(module, "ln_eps", 1e-5),
        compute_dtype=compute_dtype,
        remat=remat,
        interpret=interpret,
        merged=merged,
        save_qkv=save_qkv,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = fwd(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return step


def residualvit_forward_trainable(params, images, budget_vec, *,
                                  patch_size: int, num_heads: int,
                                  num_class_tokens: int = 1,
                                  num_registers: int = 0,
                                  gate_temp: float = 1.0,
                                  gate_bias: float = 0.0,
                                  budget_token="learnable",
                                  compute_dtype=jnp.bfloat16,
                                  interpret: bool = False,
                                  save_qkv: bool = True,
                                  pmean_axis: Optional[str] = None):
    """Differentiable fused ResidualViT forward (sigmoid gates,
    'attention+mlp' skip). Returns (logits, aux) with aux['masks'] and
    aux['current_budget'] so LossCompose regularizers apply unchanged.

    ``budget_vec``: (B,) per-sample budgets — the caller samples them
    (reference residualvit.py:541-550 samples inside the module; here the
    trainer owns the PRNG). Gates run on XLA and their gradients flow into
    the masked custom-VJP attention kernel's dmask cotangent.
    """
    from peekvit_tpu.ops.pallas.fused_attention_vjp import (
        masked_attention_block_trainable,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    c = num_class_tokens
    tokens, d = _embed(params, images, patch_size, c, num_registers, cast)
    b = tokens.shape[0]
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])  # budget token excluded

    bvec = budget_vec.astype(jnp.float32)[:, None, None]
    if budget_token == "learnable":
        btok = cast(params["learnable_budget_token_1"]) * bvec.astype(
            compute_dtype)
    elif budget_token == "learnable_interpolate":
        btok = (cast(params["learnable_budget_token_1"]) * bvec.astype(
            compute_dtype)
            + cast(params["learnable_budget_token_2"])
            * (1.0 - bvec).astype(compute_dtype))
    else:
        btok = bvec.astype(compute_dtype)
    btok = jnp.broadcast_to(btok, (b, 1, d))
    tokens = jnp.concatenate([tokens, btok], axis=1)
    s = c + num_registers

    masks = {}
    for i in _layer_ids(enc):
        lp = enc[f"layers_{i}"]
        img = tokens[:, s:-1]
        gp = lp["residual_gate"]["projection"]
        logits_g = img.astype(jnp.float32) @ gp["kernel"].astype(jnp.float32) \
            + gp["bias"].astype(jnp.float32)
        sig = jax.nn.sigmoid(logits_g / gate_temp + gate_bias)
        if budget_token in ("learnable", "learnable_interpolate"):
            bg = lp["budget_token_gate"]
            thr = jax.nn.sigmoid(
                tokens[:, -1:].astype(jnp.float32) @ bg["kernel"].astype(
                    jnp.float32) + bg["bias"].astype(jnp.float32))
            mask = jax.nn.relu(sig - thr)
        else:
            # whole-BATCH mean: under a data-sharded shard_map (dp-fused
            # training) the local mean must span the mesh, exactly like
            # the serving engine's pmean (inference.py dp path)
            cur_b = jnp.mean(tokens[:, -1:].astype(jnp.float32))
            if pmean_axis is not None:
                cur_b = jax.lax.pmean(cur_b, pmean_axis)
            mask = jax.nn.relu(sig - (1.0 - cur_b))
        masks[f"layer_{i}"] = mask
        mask_c = mask.astype(compute_dtype)

        ones = jnp.ones((b, 1, 1), compute_dtype)
        fwd_mask = jnp.concatenate(
            [jnp.ones((b, s, 1), compute_dtype), mask_c, ones], axis=1)
        tokens = jnp.concatenate(
            [tokens[:, :s], mask_c * img, tokens[:, -1:]], axis=1)

        at = lp["self_attention"]
        tokens = masked_attention_block_trainable(
            tokens, fwd_mask,
            cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
            cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]),
            cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
            num_heads, 1e-6, interpret, save_qkv,
        )
        # MLP half on XLA: tokens + MLP(mask * LN2(tokens)) — natively
        # differentiable (plain_forward keeps the MLP output unmasked)
        z = _layer_norm(tokens, cast(lp["ln_2"]["scale"]),
                        cast(lp["ln_2"]["bias"]), 1e-6) * fwd_mask
        z = jax.nn.gelu(z @ cast(lp["mlp"]["fc1_kernel"])
                        + cast(lp["mlp"]["fc1_bias"]))
        tokens = tokens + (z @ cast(lp["mlp"]["fc2_kernel"])
                           + cast(lp["mlp"]["fc2_bias"]))

    logits = _classify(params, tokens, c, cast, ln_eps=1e-5)
    aux = {"masks": masks, "current_budget": budget_vec}
    return logits, aux


def sample_budgets(module, key, batch: int) -> jax.Array:
    """Per-sample training budgets matching the module config
    (reference residualvit.py:541-550)."""
    bt = module.add_budget_token
    if isinstance(bt, float):
        return jnp.full((batch,), bt, jnp.float32)
    if isinstance(bt, (list, tuple)):
        return jax.random.choice(
            key, jnp.asarray(bt, jnp.float32), shape=(batch,))
    lo, hi = getattr(module, "budget_interval", (0.0, 1.0))
    return jax.random.uniform(key, (batch,), jnp.float32) * (hi - lo) + lo
