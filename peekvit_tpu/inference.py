"""Fused inference engine for the ViT family (the production serving path).

The linen modules are the source of truth for training and parity; this
module compiles an equivalent eval-only forward straight from the param
pytree, with the per-block attention sublayer (LN -> qkv -> MHSA ->
out-proj -> residual) executed as ONE Pallas kernel
(ops/pallas/fused_attention.fused_attention_block). The MLP half stays on
XLA, which already runs it at ~100% MXU utilization on v5e.

Layer fusion needs the raw params (linen submodules own their LayerNorms,
so a fused kernel can't be expressed inside the module tree without
changing the checkpoint layout) — hence a separate engine that READS the
standard param tree. Numerical parity with ``Model.__call__`` is pinned in
tests/test_inference.py.

Usage::

    engine = InferenceEngine(model)            # plain ViT / RankViT family
    logits = engine(images)                    # jitted, bf16, fused

``bench.py`` uses this path for the headline throughput number.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _patchify(x: jax.Array, patch_size: int) -> jax.Array:
    """NHWC image -> (B, n_patches, p*p*3) rows in conv-NHWC order."""
    b, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def _unpatchify_cmajor(rec: jax.Array, patch_size: int) -> jax.Array:
    """(B, h*w, 3*p*p) channel-major patch rows -> NHWC image: the inverse
    of the reference decoders' einops map 'b (h w) (c p1 p2) ->
    b (h p1) (w p2) c' (vitdecoder.py:90-92, maevit.py rearrange)."""
    b, n, _ = rec.shape
    p = patch_size
    h = int(round(n ** 0.5))
    rec = rec.reshape(b, h, h, 3, p, p)
    rec = rec.transpose(0, 1, 4, 2, 5, 3)
    return rec.reshape(b, h * p, h * p, 3)


def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )



def _embed(params, images, patch_size, num_class_tokens, num_registers, cast):
    """Shared front end: conv patch-embed as matmul + [cls, registers,
    patches] layout (vit.py:229-236). Returns (tokens, d)."""
    x = cast(images)
    wconv = cast(params["conv_proj"]["kernel"])
    d = wconv.shape[-1]
    tokens = _patchify(x, patch_size) @ wconv.reshape(-1, d) + cast(
        params["conv_proj"]["bias"])
    b = tokens.shape[0]
    pieces = [jnp.broadcast_to(
        cast(params["class_tokens"]), (b, num_class_tokens, d))]
    if num_registers:
        pieces.append(jnp.broadcast_to(
            cast(params["register_tokens"]), (b, num_registers, d)))
    pieces.append(tokens)
    return jnp.concatenate(pieces, axis=1), d


def _embed_posfolded(params, images, patch_size, cast):
    """Embed with pos-embedding + conv bias pre-folded into build-time
    constants (prepare_engine_params fold_ln=True): the projection matmul's
    epilogue add carries bias AND pos in one pass, instead of the separate
    whole-(B, N, D) pos-add sweep after the concat."""
    x = cast(images)
    wconv = cast(params["conv_proj"]["kernel"])
    d = wconv.shape[-1]
    img = _patchify(x, patch_size) @ wconv.reshape(-1, d) + cast(
        params["_embed_img_bias"])
    b = img.shape[0]
    spec = cast(params["_embed_special"])
    spec = jnp.broadcast_to(spec, (b,) + spec.shape[1:])
    return jnp.concatenate([spec, img], axis=1), d


def _classify(params, tokens, num_class_tokens, cast, ln_eps=1e-5):
    """Shared back end: final LN -> SUM of class tokens (§7.10) -> head.

    LN is token-local and only the class tokens feed the head, so the
    slice happens BEFORE the LN: normalizing all N tokens to read C of
    them costs ~0.3 ms/forward at ViT-B bs256."""
    enc = params["encoder"]
    cls = _layer_norm(tokens[:, :num_class_tokens], cast(enc["ln"]["scale"]),
                      cast(enc["ln"]["bias"]), ln_eps)
    cls = jnp.sum(cls, axis=1)
    logits = cls @ cast(params["head"]["kernel"]) + cast(params["head"]["bias"])
    return logits.astype(jnp.float32)


def _layer_ids(enc):
    return sorted(int(k.split("_")[1]) for k in enc if k.startswith("layers_"))


def _inject_noise(tokens, i, noise_layer, noise_type, noise_value, noise_rng):
    """NoiseBlock-before-layer-i on the engine path (VERDICT r3 #5): the
    same ops.noise.apply_noise the linen encoders run, at the same point in
    the token stream (before block ``noise_layer``, reference
    utils/utils.py:162-191 + blocks.py:100-186). With the raw rngs['noise']
    key plumbed through (models/base.py apply_fn) the realization matches
    linen bitwise at equal dtype — parity-tested in tests/test_inference.py."""
    if noise_layer is None or i != noise_layer:
        return tokens
    from peekvit_tpu.ops.noise import apply_noise

    nv = 0.0 if noise_value is None else noise_value
    rng = noise_rng if noise_rng is not None else jax.random.key(0)
    return apply_noise(tokens, noise_type, nv, rng)


def prepare_engine_params(params, compute_dtype=None, fold_ln: bool = False):
    """Engine-side param preparation, ONCE at construction (round 4):

    - every 1-D vector leaf becomes (1, k): the fused wrappers' in-graph
      ``(k,) -> (1, k)`` reshapes feeding a Pallas call are real TPU
      relayout kernels that XLA does NOT hoist out of the forward —
      measured 0.114 ms/layer at ViT-B bs256 (4.408 -> 4.294, interleaved
      same-process A/B), i.e. ~1.4 ms per 256-image forward;
    - fp32 leaves pre-cast to ``compute_dtype`` so the per-call cast()
      sweeps become no-ops — EXCEPT gate/routing subtrees (residual_gate,
      budget_token_gate, gating_network: engine gate math is deliberately
      fp32 because thresholding/argmax is discontinuous) and int8 dequant
      scales (sqkv/so/s1/s2 stay f32 for dequant precision);
    - ``fold_ln=True`` (plain-LN engines: ViT / RankViT / single-expert
      MoE sublayers) pre-computes fold_ln_into_weights for every layer
      and stores the results as ``_folded_qkv`` / ``_folded_fc1``
      subtrees. The in-graph per-forward fold is two weight-sized fp32
      sweeps plus a (1,d)@(d,m) matmul PER LAYER PER CALL that XLA cannot
      hoist (params are jit operands) — measured 0.14 ms/layer at ViT-B
      bs256 (the engine_decomp marginal-layer 4.435 ms vs the kernel's
      own 4.29 ms). Folding here is also MORE precise: it runs on the
      original fp32 weights instead of their bf16 casts. Masked engines
      (Residual/A-ViT) must not fold — row masks don't commute with the
      folded bias (see _layer_kernel docstring).
    """
    FP_SUBTREES = {"residual_gate", "budget_token_gate", "gating_network"}
    FP_LEAVES = {"sqkv", "so", "s1", "s2"}

    def visit(path, leaf):
        leaf = jnp.asarray(leaf)
        names = [str(getattr(k, "key", k)) for k in path]
        keep_fp = bool(FP_SUBTREES & set(names)) or (
            names and names[-1] in FP_LEAVES)
        if (compute_dtype is not None and not keep_fp
                and leaf.dtype == jnp.float32):
            leaf = leaf.astype(compute_dtype)
        if leaf.ndim == 1 and leaf.shape[0] > 1:
            leaf = leaf.reshape(1, -1)
        return leaf

    out = jax.tree_util.tree_map_with_path(visit, params)
    if fold_ln and "encoder" in params:
        from peekvit_tpu.ops.pallas.fused_attention import (
            fold_ln_into_weights,
        )

        cdt = compute_dtype or jnp.float32
        # plain pre-LN block stacks: the main encoder, plus the MAE
        # decoder (decoder_blocks is the same MAEViTEncoder structure —
        # models/maevit.py, reference maevit.py:278-325)
        for sub in ("encoder", "decoder_blocks"):
            if sub not in params:
                continue
            for key, sp in params[sub].items():
                if not key.startswith("layers_") or "ln_1" not in sp:
                    continue
                if "self_attention" not in sp or "mlp" not in sp:
                    continue  # quantized tree: only the embed fold applies
                at, mlp = sp["self_attention"], sp["mlp"]
                if "experts_1" in at or "experts_1" in mlp:
                    continue  # multi-expert MoE sublayers skip this path
                a = at.get("experts_0", at)
                m = mlp.get("experts_0", mlp)
                if "in_proj_kernel" not in a or "fc1_kernel" not in m:
                    continue
                wq, bq = fold_ln_into_weights(
                    sp["ln_1"]["scale"], sp["ln_1"]["bias"],
                    a["in_proj_kernel"], a["in_proj_bias"])
                w1, b1 = fold_ln_into_weights(
                    sp["ln_2"]["scale"], sp["ln_2"]["bias"],
                    m["fc1_kernel"], m["fc1_bias"])
                out[sub][key]["_folded_qkv"] = {
                    "kernel": wq.astype(cdt), "bias": bq.astype(cdt)}
                out[sub][key]["_folded_fc1"] = {
                    "kernel": w1.astype(cdt), "bias": b1.astype(cdt)}
            # stack the folded layers for the one-dispatch encoder
            # (encoder_layers_one_call): every layer folded + uniform
            # shapes + plain (non-expert) sublayers only
            ids = _layer_ids(params[sub])
            folded = [out[sub].get(f"layers_{i}", {}) for i in ids]
            if ids and all(
                    "_folded_qkv" in fp
                    and "out_proj_kernel" in fp.get("self_attention", {})
                    and "fc2_kernel" in fp.get("mlp", {})
                    for fp in folded):
                shapes = {fp["_folded_qkv"]["kernel"].shape
                          for fp in folded} | {
                    fp["_folded_fc1"]["kernel"].shape for fp in folded}
                if len(shapes) == 2:  # one qkv shape + one fc1 shape
                    stk = lambda lv: jnp.stack(list(lv))  # noqa: E731
                    out[sub]["_stacked_layers"] = {
                        "wqkv": stk(fp["_folded_qkv"]["kernel"]
                                    for fp in folded),
                        "bqkv": stk(fp["_folded_qkv"]["bias"]
                                    for fp in folded),
                        "wo": stk(out[sub][f"layers_{i}"]["self_attention"]
                                  ["out_proj_kernel"] for i in ids),
                        "bo": stk(out[sub][f"layers_{i}"]["self_attention"]
                                  ["out_proj_bias"] for i in ids),
                        "w1": stk(fp["_folded_fc1"]["kernel"]
                                  for fp in folded),
                        "b1": stk(fp["_folded_fc1"]["bias"]
                                  for fp in folded),
                        "w2": stk(out[sub][f"layers_{i}"]["mlp"]
                                  ["fc2_kernel"] for i in ids),
                        "b2": stk(out[sub][f"layers_{i}"]["mlp"]
                                  ["fc2_bias"] for i in ids),
                    }
        if ("class_tokens" in params and "conv_proj" in params
                and "pos_embedding" in params):
            # MAE embed fold (models/maevit.py): pos_embedding lives at
            # the TOP level and covers PATCHES ONLY (added before the
            # class/register concat, reference maevit.py:221); the
            # special tokens take no pos. Same two-constant layout as the
            # ViT fold below so _embed_posfolded serves both.
            d = params["conv_proj"]["kernel"].shape[-1]
            pos = jnp.asarray(params["pos_embedding"], jnp.float32)
            spec = [jnp.reshape(jnp.asarray(params["class_tokens"],
                                            jnp.float32), (1, -1, d))]
            if "register_tokens" in params:
                spec.append(jnp.reshape(
                    jnp.asarray(params["register_tokens"], jnp.float32),
                    (1, -1, d)))
            bias = jnp.asarray(params["conv_proj"]["bias"],
                               jnp.float32).reshape(1, 1, d)
            out["_embed_special"] = jnp.concatenate(spec, axis=1).astype(cdt)
            out["_embed_img_bias"] = (bias + pos).astype(cdt)
        elif "class_tokens" in params and "conv_proj" in params:
            # embed fold: [class|register] tokens and the conv bias each
            # absorb their slice of pos_embedding, so the embed runs as
            # matmul + one fused epilogue add + concat — no separate
            # whole-(B,N,D) pos-add sweep per forward (_embed_posfolded)
            d = params["conv_proj"]["kernel"].shape[-1]
            pos = jnp.asarray(params["encoder"]["pos_embedding"],
                              jnp.float32)
            spec = [jnp.reshape(jnp.asarray(params["class_tokens"],
                                            jnp.float32), (1, -1, d))]
            if "register_tokens" in params:
                spec.append(jnp.reshape(
                    jnp.asarray(params["register_tokens"], jnp.float32),
                    (1, -1, d)))
            spec = jnp.concatenate(spec, axis=1)
            ns = spec.shape[1]
            bias = jnp.asarray(params["conv_proj"]["bias"],
                               jnp.float32).reshape(1, 1, d)
            out["_embed_special"] = (spec + pos[:, :ns]).astype(cdt)
            out["_embed_img_bias"] = (bias + pos[:, ns:]).astype(cdt)
    return out


# VMEM budgets for weights resident in a fused kernel. The merged per-layer
# kernels raise Mosaic's scoped-vmem limit (v5e has 128 MB of VMEM; the
# default scoped limit is what round 2 mistook for hardware) and keep the
# whole layer's weights resident; split kernels keep the conservative
# default-limit budget; anything bigger falls back to XLA.
_KERNEL_WEIGHT_BYTES_LIMIT = 11 * 1024 * 1024
_MERGED_WEIGHT_BYTES_LIMIT = 64 * 1024 * 1024


def _mlp_fusable(d: int, m: int, itemsize: int = 2) -> bool:
    return 2 * d * m * itemsize <= _KERNEL_WEIGHT_BYTES_LIMIT


def _attn_fusable(d: int, itemsize: int = 2) -> bool:
    return (3 * d * d + d * d) * itemsize <= _KERNEL_WEIGHT_BYTES_LIMIT


def _layer_fusable(d: int, m: int, itemsize: int = 2) -> bool:
    """Whole layer (attn + MLP weights) resident in VMEM at once."""
    return (4 * d * d + 2 * d * m) * itemsize <= _MERGED_WEIGHT_BYTES_LIMIT


# Below this token count the SPLIT per-sublayer kernels beat the merged
# per-layer kernel (measured on v5e, rank int8 @ budget 0.25: 13.7k img/s
# split vs 11.8k merged — a 14 MB weight DMA cannot amortize over
# 13-token matmuls). The physical-drop engines pick per layer.
_MERGED_MIN_TOKENS = 128


def vit_forward_fused(params, images, *, patch_size: int, num_heads: int,
                      num_class_tokens: int = 1, num_registers: int = 0,
                      ln_eps: float = 1e-5, compute_dtype=jnp.bfloat16,
                      fused_mlp: bool = True,
                      interpret: bool = False,
                      noise_layer: Optional[int] = None,
                      noise_type: str = "gaussian", noise_value=None,
                      noise_rng=None) -> jax.Array:
    """Eval forward of a plain ViT from its param tree (fused blocks)."""
    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    enc = params["encoder"]
    if "_embed_special" in params:
        tokens, d = _embed_posfolded(params, images, patch_size, cast)
    else:
        tokens, d = _embed(params, images, patch_size, num_class_tokens,
                           num_registers, cast)
        tokens = tokens + cast(enc["pos_embedding"])
    tokens = _encoder_stack(enc, tokens, num_heads, ln_eps, cast, interpret,
                            fused_mlp, noise_layer, noise_type, noise_value,
                            noise_rng)
    return _classify(params, tokens, num_class_tokens, cast, ln_eps)


def _encoder_stack(enc, tokens, num_heads, ln_eps, cast, interpret,
                   fused_mlp=True, noise_layer=None, noise_type="gaussian",
                   noise_value=None, noise_rng=None):
    """The plain pre-LN encoder stack over fused kernels — shared by the
    ViT engine and the PCT engine (identical block structure, reference
    models/pct.py:20-57 vs torchvision EncoderBlock): one-dispatch
    encoder when available, else per-layer merged folded kernels, with
    split / XLA fallbacks under the VMEM guards."""
    from peekvit_tpu.ops.pallas.fused_attention import (
        encoder_layers_one_call,
        fold_ln_into_weights,
        fused_attention_block,
        fused_layer_block_folded,
        fused_mlp_block,
    )

    d = tokens.shape[-1]
    ids = _layer_ids(enc)
    if not ids:  # layer-less tree (overhead microbenches)
        return tokens
    mlp_dim = enc[f"layers_{ids[0]}"]["mlp"]["fc1_kernel"].shape[-1]
    fuse_layer = fused_mlp and _layer_fusable(d, mlp_dim)
    fused_mlp = fused_mlp and _mlp_fusable(d, mlp_dim)
    fuse_attn = _attn_fusable(d)

    if (fuse_layer and noise_layer is None
            and "_stacked_layers" in enc
            and not interpret and tokens.shape[0] >= 8):
        # the whole encoder in ONE dispatch (grid (L, B), aliased token
        # buffer) — bitwise-identical to the per-layer calls, 0.38 ms
        # faster at ViT-B bs256 (benchmarks/encoder_one_call.py). Noise
        # sweeps inject between layers, so they keep the per-layer path;
        # interpret mode does NOT apply input/output aliasing step-by-step
        # (layer l+1 would read the original input), so CPU runs keep the
        # per-layer path too — the TPU A/B benchmark pins parity (0.0 max
        # err); the batch floor keeps aliased reads >= 2 grid steps behind
        # the trailing write-back.
        return encoder_layers_one_call(
            tokens, jax.tree.map(cast, enc["_stacked_layers"]),
            num_heads, ln_eps, interpret)

    for i in ids:
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        if fuse_layer:
            # one kernel per layer (no HBM round trip between sublayers),
            # LN affines folded into the qkv/fc1 weights — pre-folded at
            # engine build when available (prepare_engine_params
            # fold_ln=True: the in-graph fold costs 0.14 ms/layer/call)
            fq = lp.get("_folded_qkv")
            if fq is not None:
                wqkv, bqkv = cast(fq["kernel"]), cast(fq["bias"])
                f1 = lp["_folded_fc1"]
                w1, b1 = cast(f1["kernel"]), cast(f1["bias"])
            else:
                wqkv, bqkv = fold_ln_into_weights(
                    cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                    cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]))
                w1, b1 = fold_ln_into_weights(
                    cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                    cast(lp["mlp"]["fc1_kernel"]),
                    cast(lp["mlp"]["fc1_bias"]))
            tokens = fused_layer_block_folded(
                tokens, wqkv, bqkv,
                cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
                w1, b1,
                cast(lp["mlp"]["fc2_kernel"]), cast(lp["mlp"]["fc2_bias"]),
                num_heads, ln_eps, interpret,
            )
            continue
        if fuse_attn:
            tokens = fused_attention_block(
                tokens,
                cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]),
                cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
                num_heads, ln_eps, interpret,
            )
        else:  # XLA fallback for very large hidden dims
            from peekvit_tpu.ops.attention import attention_core

            y = _layer_norm(tokens, cast(lp["ln_1"]["scale"]),
                            cast(lp["ln_1"]["bias"]), ln_eps)
            qkv = y @ cast(at["in_proj_kernel"]) + cast(at["in_proj_bias"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            y = attention_core(q, k, v, num_heads)
            tokens = tokens + (y @ cast(at["out_proj_kernel"])
                               + cast(at["out_proj_bias"]))
        if fused_mlp:
            tokens = fused_mlp_block(
                tokens,
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                cast(lp["mlp"]["fc1_kernel"]), cast(lp["mlp"]["fc1_bias"]),
                cast(lp["mlp"]["fc2_kernel"]), cast(lp["mlp"]["fc2_bias"]),
                ln_eps, interpret,
            )
        else:  # XLA MLP (reference path; already near MXU peak)
            z = _layer_norm(tokens, cast(lp["ln_2"]["scale"]),
                            cast(lp["ln_2"]["bias"]), ln_eps)
            z = jax.nn.gelu(z @ cast(lp["mlp"]["fc1_kernel"])
                            + cast(lp["mlp"]["fc1_bias"]))
            tokens = tokens + (z @ cast(lp["mlp"]["fc2_kernel"])
                               + cast(lp["mlp"]["fc2_bias"]))

    return tokens


def maevit_forward_fused(params, images, *, patch_size: int, num_heads: int,
                         num_decoder_heads: int, num_class_tokens: int = 1,
                         num_registers: int = 0, ln_eps: float = 1e-5,
                         compute_dtype=jnp.bfloat16, interpret: bool = False,
                         recon: bool = False):
    """Eval forward of an MAE ViT (models/maevit.py; reference
    maevit.py:328-390) on the fused kernel stack.

    The reference shuffles-and-drops tokens ONLY in training
    (maevit.py:221): the eval forward runs the FULL patch sequence
    through encoder and decoder, so both stacks ride the merged
    per-layer kernels / one-dispatch encoder unchanged
    (:func:`_encoder_stack` — the decoder_blocks subtree is structurally
    a second plain pre-LN stack). Layout quirks vs plain ViT, preserved
    bit-for-bit: pos-embedding covers PATCHES ONLY and is added before
    the [cls, registers, patches] concat; the final encoder LN feeds the
    head AND the decoder, so it runs over all tokens (no cls-slice-first
    shortcut); the decoder re-embeds when hidden dims differ, adds its
    own pos, and maps each token to a channel-major (c, p, p) patch.

    Returns fp32 logits, or ``(logits, reconstruction NHWC)`` when
    ``recon=True`` (the model's ``logits_recon`` output contract).
    """
    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    if "_embed_special" in params:
        tokens, d = _embed_posfolded(params, images, patch_size, cast)
    else:
        x = cast(images)
        wconv = cast(params["conv_proj"]["kernel"])
        d = wconv.shape[-1]
        img_t = (_patchify(x, patch_size) @ wconv.reshape(-1, d)
                 + cast(params["conv_proj"]["bias"])
                 + cast(params["pos_embedding"]))
        b = img_t.shape[0]
        pieces = [jnp.broadcast_to(
            cast(params["class_tokens"]), (b, num_class_tokens, d))]
        if num_registers:
            pieces.append(jnp.broadcast_to(
                cast(params["register_tokens"]), (b, num_registers, d)))
        pieces.append(img_t)
        tokens = jnp.concatenate(pieces, axis=1)

    enc = params["encoder"]
    tokens = _encoder_stack(enc, tokens, num_heads, ln_eps, cast, interpret)
    # final LN over ALL tokens: it feeds both the head and the decoder
    tokens = _layer_norm(tokens, cast(enc["ln"]["scale"]),
                         cast(enc["ln"]["bias"]), ln_eps)
    cls = jnp.sum(tokens[:, :num_class_tokens], axis=1)
    logits = (cls @ cast(params["head"]["kernel"])
              + cast(params["head"]["bias"])).astype(jnp.float32)
    if not recon:
        return logits

    dec = tokens[:, num_class_tokens + num_registers:]
    if "decoder_embed" in params:
        dec = (dec @ cast(params["decoder_embed"]["kernel"])
               + cast(params["decoder_embed"]["bias"]))
    dec = dec + cast(params["decoder_pos_embedding"])
    db = params["decoder_blocks"]
    dec = _encoder_stack(db, dec, num_decoder_heads, ln_eps, cast, interpret)
    dec = _layer_norm(dec, cast(db["ln"]["scale"]),
                      cast(db["ln"]["bias"]), ln_eps)
    rec = (dec @ cast(params["decoder_head"]["kernel"])
           + cast(params["decoder_head"]["bias"]))
    return logits, _unpatchify_cmajor(rec, patch_size).astype(jnp.float32)


def _bn_eval(x, pr, st, eps: float = 1e-5):
    """Inference-mode BatchNorm: running stats + affine, fp32."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(st["var"].astype(jnp.float32) + eps)
    return ((xf - st["mean"].astype(jnp.float32)) * inv
            * pr["scale"].astype(jnp.float32)
            + pr["bias"].astype(jnp.float32))


def pct_forward_fused(params, points, *, num_heads: int, num_points: int,
                      ln_eps: float = 1e-5, compute_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jax.Array:
    """Fused eval forward for the PointCloudTransformer (reference
    models/pct.py): gather-free ARPE + BN head on XLA; the encoder
    blocks — structurally identical to ViT blocks — run the merged folded
    Pallas layer kernels / one-dispatch encoder via :func:`_encoder_stack`.

    The ARPE rewrite (the linen path's bottleneck on TPU — the
    (B, N, K, 3) neighbor gather measures 56 ms at ModelNet40 bs128,
    vs 7 ms for the whole 4-layer encoder):

      max-pool_k elu(BN(lin1([x_i, x_i - x_j])))
        = elu( c_i + max_{j in kNN(i)} g_j )          per channel, where
      c_i = x_i @ (W_a' + W_b') + b',  g_j = -x_j @ W_b'

    with BN1 (running-stats affine) pre-folded into lin1 at engine build
    (prepare_pct_engine_params: W', b'). The split is exact because lin1
    is linear over the [point | diff] concat and elu/max commute (elu
    monotonic, the affine already inside). The kNN itself reduces to the
    k-th-smallest distance per row (top_k VALUES, no indices) and a
    d2 <= kth mask — no gather ever happens. Distance TIES at the k-th
    position include all tied points (the reference's top-k picks an
    arbitrary k of them); for real clouds ties are measure-zero, and the
    masked max only differs if a tied point is the channel argmax.
    """
    from peekvit_tpu.ops.pallas.pct_embed import arpe_tokens

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    pack = params["embedder"]["_arpe_kernel_pack"]
    pts = points.astype(jnp.float32)
    b, n, c = pts.shape
    k = int(32 * num_points / 512)
    pts_padded = jnp.pad(pts, ((0, 0), (0, 0), (0, 8 - c)))
    tokens = cast(arpe_tokens(
        pts_padded, pack["wc"], pack["wb"], pack["b1"], pack["w2"],
        pack["b2"], k, 2 * c, interpret))

    tokens = _encoder_stack(params["encoder"], tokens, num_heads, ln_eps,
                            cast, interpret)

    pooled = jnp.mean(tokens.astype(jnp.float32), axis=1)
    hd, hbs = params["head"], params["_bn_stats"]["head"]
    z = pooled @ hd["lin1"]["kernel"].astype(jnp.float32) \
        + hd["lin1"]["bias"].astype(jnp.float32).reshape(-1)
    z = jax.nn.gelu(_bn_eval(z, hd["bn1"], hbs["bn1"]), approximate=False)
    logits = z @ hd["lin2"]["kernel"].astype(jnp.float32) \
        + hd["lin2"]["bias"].astype(jnp.float32).reshape(-1)
    return logits.astype(jnp.float32)


def rankpct_forward_fused(params, points, *, budget: float, ranking,
                          num_heads: int, num_points: int,
                          ln_eps: float = 1e-5,
                          compute_dtype=jnp.bfloat16,
                          interpret: bool = False) -> jax.Array:
    """Fused eval forward for the RankPointCloudTransformer with PHYSICAL
    token drop (reference models/rankpct.py:48-146 eval semantics).

    The eval cascade's keep counts are rank-based, hence identical for
    every sample: layer i with ranking on keeps
    ``ceil(alive * budget)`` tokens — position 0 always survives
    (protected), plus the ``n_keep - 1`` largest-norm rest tokens, chosen
    with the reference's stable argsort tie-break. Dropped tokens in the
    linen path keep flowing as key-masked queries that never re-enter any
    key set or the masked mean, so physically removing them is exactly
    equivalent (PCT has no positional embedding; attention and pooling
    are permutation-invariant). Shapes stay static per budget — the
    engine compiles one fn per requested budget, like the RankViT drop
    engine. Blocks run the merged folded Pallas kernels via
    :func:`_encoder_stack`; the final mean divides by the SURVIVOR count
    (reference rankpct.py:170-175).
    """
    from peekvit_tpu.ops.pallas.pct_embed import arpe_tokens

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    pack = params["embedder"]["_arpe_kernel_pack"]
    pts = points.astype(jnp.float32)
    b, n, c = pts.shape
    k = int(32 * num_points / 512)
    pts_padded = jnp.pad(pts, ((0, 0), (0, 0), (0, 8 - c)))
    tokens = cast(arpe_tokens(
        pts_padded, pack["wc"], pack["wb"], pack["b1"], pack["w2"],
        pack["b2"], k, 2 * c, interpret))

    enc = params["encoder"]
    ids = _layer_ids(enc)
    alive = tokens.shape[1]
    for i in ids:
        if ranking[i] and budget is not None:
            n_keep = int(np.ceil(alive * float(budget)))
            n_keep = max(min(n_keep, alive), 1)
            if n_keep < alive:
                rest = tokens[:, 1:]
                norms = jnp.linalg.norm(rest.astype(jnp.float32), axis=-1)
                # reference tie-break: stable argsort on -norms
                order = jnp.argsort(-norms, axis=-1, stable=True)
                idx = order[:, :n_keep - 1]
                kept = jnp.take_along_axis(rest, idx[..., None], axis=1)
                tokens = jnp.concatenate([tokens[:, :1], kept], axis=1)
                alive = n_keep
        lp = {f"layers_{i}": enc[f"layers_{i}"]}
        tokens = _encoder_stack(lp, tokens, num_heads, ln_eps, cast,
                                interpret)

    pooled = jnp.sum(tokens.astype(jnp.float32), axis=1) / float(alive)
    hd, hbs = params["head"], params["_bn_stats"]["head"]
    z = pooled @ hd["lin1"]["kernel"].astype(jnp.float32) \
        + hd["lin1"]["bias"].astype(jnp.float32).reshape(-1)
    z = jax.nn.gelu(_bn_eval(z, hd["bn1"], hbs["bn1"]), approximate=False)
    logits = z @ hd["lin2"]["kernel"].astype(jnp.float32) \
        + hd["lin2"]["bias"].astype(jnp.float32).reshape(-1)
    return logits.astype(jnp.float32)


def prepare_pct_engine_params(params, batch_stats, compute_dtype=None,
                              bn_eps: float = 1e-5):
    """PCT engine tree: blocks remapped under 'encoder' so the shared
    prepare_engine_params fold/stack machinery applies; batch_stats packed
    as ``_bn_stats`` (fp32) for the inference-mode BatchNorms; and the
    ARPE BN1 affine folded into lin1 (pct_forward_fused's gather-free
    embedding needs the max-pool directly on the post-affine values:
    W' = W * inv*scale per out channel, b' = (b - mean)*inv*scale + bias,
    exact in fp32)."""
    tree = {
        "embedder": params["embedder"],
        "head": params["head"],
        "encoder": {k: v for k, v in params.items()
                    if k.startswith("layers_")},
    }
    out = prepare_engine_params(tree, compute_dtype, fold_ln=True)

    def bn_fold(w, b, pr, bn):
        inv = jax.lax.rsqrt(jnp.asarray(bn["var"], jnp.float32) + bn_eps)
        a = inv * jnp.asarray(pr["scale"], jnp.float32).reshape(-1)
        w = jnp.asarray(w, jnp.float32)
        b = jnp.asarray(b, jnp.float32).reshape(-1)
        return (w * a[None, :],
                (b - jnp.asarray(bn["mean"], jnp.float32)) * a
                + jnp.asarray(pr["bias"], jnp.float32).reshape(-1))

    emb = params["embedder"]
    ebs = batch_stats["embedder"]
    w1, b1 = bn_fold(emb["lin1"]["kernel"], emb["lin1"]["bias"],
                     emb["bn1"], ebs["bn1"])
    w2, b2 = bn_fold(emb["lin2"]["kernel"], emb["lin2"]["bias"],
                     emb["bn2"], ebs["bn2"])
    two_c = w1.shape[0]          # 2 * in_channels (6)
    c = two_c // 2
    d = w2.shape[-1]
    # lane-pad for the ARPE kernel (ops/pallas/pct_embed.py): points ride
    # (N, 8) blocks, the tiny channel dims pad to 128; padded rows/cols
    # are zero so they contribute nothing
    wa, wb = w1[:c], w1[c:]
    wc_p = jnp.zeros((8, 128), jnp.float32).at[:c, :two_c].set(wa + wb)
    wb_p = jnp.zeros((8, 128), jnp.float32).at[:c, :two_c].set(wb)
    b1_p = jnp.zeros((1, 128), jnp.float32).at[0, :two_c].set(b1)
    w2_p = jnp.zeros((128, d), jnp.float32).at[:two_c].set(w2)
    out["embedder"]["_arpe_kernel_pack"] = {
        "wc": wc_p, "wb": wb_p, "b1": b1_p,
        "w2": w2_p, "b2": b2.reshape(1, d),
    }
    out["_bn_stats"] = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), dict(batch_stats))
    return out


def quantize_vit_params(params):
    """Pre-quantize every block's linear weights to int8 (per-output-channel
    scales); LN / embed / head stay bf16. Returns the quantized pytree."""
    from peekvit_tpu.ops.pallas.quant_blocks import quantize_linear

    q = {"conv_proj": params["conv_proj"], "class_tokens": params["class_tokens"],
         "head": params["head"], "encoder": {"pos_embedding":
             params["encoder"]["pos_embedding"], "ln": params["encoder"]["ln"]}}
    if "register_tokens" in params:
        q["register_tokens"] = params["register_tokens"]
    for name, lp in params["encoder"].items():
        if not name.startswith("layers_"):
            continue
        at = lp["self_attention"]
        wqkv_q, sqkv = quantize_linear(at["in_proj_kernel"])
        wo_q, so = quantize_linear(at["out_proj_kernel"])
        w1_q, s1 = quantize_linear(lp["mlp"]["fc1_kernel"])
        w2_q, s2 = quantize_linear(lp["mlp"]["fc2_kernel"])
        q["encoder"][name] = {
            "ln_1": lp["ln_1"], "ln_2": lp["ln_2"],
            "wqkv_q": wqkv_q, "sqkv": sqkv, "bqkv": at["in_proj_bias"],
            "wo_q": wo_q, "so": so, "bo": at["out_proj_bias"],
            "w1_q": w1_q, "s1": s1, "b1": lp["mlp"]["fc1_bias"],
            "w2_q": w2_q, "s2": s2, "b2": lp["mlp"]["fc2_bias"],
        }
    return q


def collect_activation_caps(params, images, *, patch_size: int,
                            num_heads: int, num_class_tokens: int = 1,
                            num_registers: int = 0, ln_eps: float = 1e-5,
                            percentile: float = 99.9):
    """Percentile activation calibration for the w8a8 engines.

    Runs a pure-jnp fp32 forward mirroring the quant engine's structure and
    records the ``percentile`` of |activation| at the four quantized sites
    per layer (attention LN output, attention output, MLP LN output, gelu
    output). Returns a static nested tuple (hashable, baked into the
    kernels as constant scales): caps[i] = ((attn_ln, attn_out),
    (mlp_ln, mlp_h)). Standard post-training-quantization recipe: clipping
    outliers at a high percentile beats letting them inflate the dynamic
    per-token scale (PAPERS.md ViT quantization survey).
    """
    from peekvit_tpu.ops.attention import attention_core

    cast = lambda t: t.astype(jnp.float32)  # noqa: E731
    tokens, d = _embed(params, images, patch_size, num_class_tokens,
                       num_registers, cast)
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])

    def pct(x):
        return float(jnp.percentile(jnp.abs(x.astype(jnp.float32)),
                                    percentile))

    caps = []
    for i in _layer_ids(enc):
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        ln1 = _layer_norm(tokens, cast(lp["ln_1"]["scale"]),
                          cast(lp["ln_1"]["bias"]), ln_eps)
        c_a1 = pct(ln1)
        qkv = ln1 @ cast(at["in_proj_kernel"]) + cast(at["in_proj_bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = attention_core(q, k, v, num_heads)
        c_a2 = pct(attn)
        tokens = tokens + attn @ cast(at["out_proj_kernel"]) + cast(
            at["out_proj_bias"])
        ln2 = _layer_norm(tokens, cast(lp["ln_2"]["scale"]),
                          cast(lp["ln_2"]["bias"]), ln_eps)
        c_m1 = pct(ln2)
        h = jax.nn.gelu(ln2 @ cast(lp["mlp"]["fc1_kernel"])
                        + cast(lp["mlp"]["fc1_bias"]))
        c_m2 = pct(h)
        tokens = tokens + h @ cast(lp["mlp"]["fc2_kernel"]) + cast(
            lp["mlp"]["fc2_bias"])
        caps.append(((c_a1, c_a2), (c_m1, c_m2)))
    return tuple(caps)


def collect_residualvit_activation_stats(
        params, images, budget=1.0, *, patch_size: int, num_heads: int,
        num_class_tokens: int = 1, num_registers: int = 0,
        gate_temp: float = 1.0, gate_bias: float = 0.0,
        budget_token="learnable", percentile: float = 99.9):
    """Calibration pass for the RESIDUAL w8a8 engine (VERDICT r2 #4):
    mirrors residualvit_forward_fused's gate + masked-LN structure in fp32
    and returns ``(caps, smoothing)`` — the percentile |activation| caps at
    the four quantized sites per layer, and SmoothQuant per-channel
    equalization vectors for the two LN-output sites. Calibrate at the
    budget you serve (default 1.0 — masking only removes tokens, so
    full-budget stats bound every sparser budget)."""
    from peekvit_tpu.ops.attention import attention_core

    cast = lambda t: t.astype(jnp.float32)  # noqa: E731
    c = num_class_tokens
    tokens, d = _embed(params, images, patch_size, c, num_registers, cast)
    b = tokens.shape[0]
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])

    bcast = jnp.broadcast_to(jnp.asarray(budget, jnp.float32),
                             (b,))[:, None, None]
    if budget_token == "learnable":
        btok = cast(params["learnable_budget_token_1"]) * bcast
    elif budget_token == "learnable_interpolate":
        btok = (cast(params["learnable_budget_token_1"]) * bcast
                + cast(params["learnable_budget_token_2"]) * (1.0 - bcast))
    else:
        btok = jnp.broadcast_to(bcast, (b, 1, d))
    tokens = jnp.concatenate([tokens, jnp.broadcast_to(btok, (b, 1, d))],
                             axis=1)
    s = c + num_registers

    def pct(x):
        return float(jnp.percentile(jnp.abs(x), percentile))

    def ln(x, pr, eps):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * cast(pr["scale"]) \
            + cast(pr["bias"])

    caps = []
    smoothing = []
    for i in _layer_ids(enc):
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        img = tokens[:, s:-1]
        gp = lp["residual_gate"]["projection"]
        sig = jax.nn.sigmoid(
            (img @ cast(gp["kernel"]) + cast(gp["bias"])) / gate_temp
            + gate_bias)
        if budget_token == "learnable":
            bg = lp["budget_token_gate"]
            thr = jax.nn.sigmoid(tokens[:, -1:] @ cast(bg["kernel"])
                                 + cast(bg["bias"]))
            mask = jax.nn.relu(sig - thr)
        else:
            mask = jax.nn.relu(sig - (1.0 - jnp.mean(tokens[:, -1:])))
        ones = jnp.ones((b, 1, 1), jnp.float32)
        fwd_mask = jnp.concatenate(
            [jnp.ones((b, s, 1), jnp.float32), mask, ones], axis=1)
        tokens = jnp.concatenate(
            [tokens[:, :s], mask * img, tokens[:, -1:]], axis=1)

        ln1 = ln(tokens, lp["ln_1"], 1e-6) * fwd_mask
        c_a1 = pct(ln1)
        s1 = _smoothing_vec(ln1, at["in_proj_kernel"])
        qkv = ln1 @ cast(at["in_proj_kernel"]) + cast(at["in_proj_bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = attention_core(q, k, v, num_heads)
        c_a2 = pct(attn)
        tokens = tokens + (attn @ cast(at["out_proj_kernel"])
                           + cast(at["out_proj_bias"])) * fwd_mask
        ln2 = ln(tokens, lp["ln_2"], 1e-6) * fwd_mask
        c_m1 = pct(ln2)
        s2 = _smoothing_vec(ln2, lp["mlp"]["fc1_kernel"])
        h = jax.nn.gelu(ln2 @ cast(lp["mlp"]["fc1_kernel"])
                        + cast(lp["mlp"]["fc1_bias"]))
        c_m2 = pct(h)
        tokens = tokens + h @ cast(lp["mlp"]["fc2_kernel"]) + cast(
            lp["mlp"]["fc2_bias"])
        caps.append(((c_a1, c_a2), (c_m1, c_m2)))
        smoothing.append((s1, s2))
    return tuple(caps), smoothing


# Explicit allowlist for calibrated QAT (ADVICE r4 #5: no name-substring /
# attribute sniffing — a future family missing the sniffed markers would
# silently calibrate with the wrong collector). Exactly the classes whose
# quantized matmuls are the four per-encoder-layer fake-quant sites.
_QAT_PLAIN_FAMILIES = ("VisionTransformer", "RankVisionTransformer")
_QAT_RESIDUAL_FAMILIES = ("ResidualVisionTransformer",
                          "EEResidualVisionTransformer")


def _qat_family(module) -> str:
    """'plain' | 'residual', or a NotImplementedError for every class not
    in the explicit registry (MAE/EncDec decoders, MoE expert stacks,
    A-ViT ACT blocks, PCT — their quantized matmuls fall outside the four
    calibrated per-encoder-layer sites the fake-quant counters assign)."""
    name = type(module).__name__
    if name in _QAT_PLAIN_FAMILIES:
        return "plain"
    if name in _QAT_RESIDUAL_FAMILIES:
        return "residual"
    raise NotImplementedError(
        "calibrated qat ('static' / smoothed) supports exactly "
        f"{_QAT_PLAIN_FAMILIES + _QAT_RESIDUAL_FAMILIES}; got {name} "
        "(decoders / expert stacks / ACT blocks quantize outside the four "
        "calibrated per-encoder-layer sites)")


def collect_qat_caps(model, images, *, percentile: float = 99.9,
                     budget: float = 1.0):
    """Static-caps calibration for ``Trainer(qat='static')``, dispatched
    by the explicit family registry (the same collectors the int8 engine
    uses):

    - plain ViT / RankViT: :func:`collect_activation_caps` at full token
      count (ranking only removes tokens — full-budget stats bound every
      sparser budget, same argument as the int8+drop engine).
    - ResidualViT family (gated encoders, no decoder):
      :func:`collect_residualvit_activation_stats` at ``budget``.

    Caps here are calibrated on the UNSMOOTHED params — the engine's
    ``calib_static_caps`` mode without SmoothQuant. To train against the
    engine's *default* calibrated grid (SmoothQuant baked in), use
    :func:`collect_qat_calibration` and pass both results to the Trainer.
    """
    module = model.module
    images = jnp.asarray(images)
    if _qat_family(module) == "residual":
        caps, _ = collect_residualvit_activation_stats(
            model.params, images, budget,
            patch_size=module.patch_size, num_heads=module.num_heads,
            num_class_tokens=getattr(module, "num_class_tokens", 1),
            num_registers=getattr(module, "num_registers", 0),
            gate_temp=module.gate_temp, gate_bias=module.gate_bias,
            budget_token=module.add_budget_token, percentile=percentile)
        return caps
    return collect_activation_caps(
        model.params, images,
        patch_size=module.patch_size, num_heads=module.num_heads,
        num_class_tokens=getattr(module, "num_class_tokens", 1),
        num_registers=getattr(module, "num_registers", 0),
        ln_eps=getattr(module, "ln_eps", 1e-5), percentile=percentile)


def collect_qat_calibration(model, images, *, percentile: float = 99.9,
                            budget: float = 1.0, alpha: float = 0.5):
    """SmoothQuant-aware calibration for ``Trainer(qat='static',
    qat_smoothing=...)`` — returns ``(caps, smoothing)`` computed exactly
    the way the engine's default calibrated mode does (VERDICT r4 #7):
    smoothing vectors from the raw params, then static caps collected on
    the SMOOTHED copy (``InferenceEngine(quantized=True, calib_images=,
    calib_static_caps=True)`` order of operations, so the trained grid ==
    the served grid). The fake-quant hooks divide the LN-output
    activations by ``s`` and scale the weight rows by ``s`` at trace time
    (ops/fake_quant.py), matching the engine's baked-in fold."""
    module = model.module
    images = jnp.asarray(images)
    if _qat_family(module) == "residual":
        kw = dict(
            patch_size=module.patch_size, num_heads=module.num_heads,
            num_class_tokens=getattr(module, "num_class_tokens", 1),
            num_registers=getattr(module, "num_registers", 0),
            gate_temp=module.gate_temp, gate_bias=module.gate_bias,
            budget_token=module.add_budget_token, percentile=percentile)
        _, smoothing = collect_residualvit_activation_stats(
            model.params, images, budget, **kw)
        smoothed = smooth_vit_params(model.params, smoothing)
        caps, _ = collect_residualvit_activation_stats(
            smoothed, images, budget, **kw)
        return caps, tuple(smoothing)
    geom = dict(
        patch_size=module.patch_size, num_heads=module.num_heads,
        num_class_tokens=getattr(module, "num_class_tokens", 1),
        num_registers=getattr(module, "num_registers", 0),
        ln_eps=getattr(module, "ln_eps", 1e-5))
    smoothing = compute_smoothing_vectors(model.params, images,
                                          alpha=alpha, **geom)
    smoothed = smooth_vit_params(model.params, smoothing)
    caps = collect_activation_caps(smoothed, images,
                                   percentile=percentile, **geom)
    return caps, tuple(smoothing)


def compute_smoothing_vectors(params, images, *, patch_size: int,
                              num_heads: int, num_class_tokens: int = 1,
                              num_registers: int = 0, ln_eps: float = 1e-5,
                              alpha: float = 0.5):
    """SmoothQuant-style per-channel equalization vectors (PAPERS.md; the
    standard fix for transformer OUTLIER CHANNELS under w8a8): for each
    layer's two LN-output quantization sites, s_j = |act_j|max^alpha /
    |W_j:|max^(1-alpha). Dividing the LN affine by s and multiplying the
    following weight's rows by s is EXACT in fp and moves the outlier
    magnitude from the (hard, per-token-quantized) activations into the
    (easy, per-channel-quantized) weights."""
    from peekvit_tpu.ops.attention import attention_core

    cast = lambda t: t.astype(jnp.float32)  # noqa: E731
    tokens, d = _embed(params, images, patch_size, num_class_tokens,
                       num_registers, cast)
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])

    def svec(act, w):
        return _smoothing_vec(act, w, alpha)

    smoothing = []
    for i in _layer_ids(enc):
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        ln1 = _layer_norm(tokens, cast(lp["ln_1"]["scale"]),
                          cast(lp["ln_1"]["bias"]), ln_eps)
        s1 = svec(ln1, at["in_proj_kernel"])
        qkv = ln1 @ cast(at["in_proj_kernel"]) + cast(at["in_proj_bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = attention_core(q, k, v, num_heads)
        tokens = tokens + attn @ cast(at["out_proj_kernel"]) + cast(
            at["out_proj_bias"])
        ln2 = _layer_norm(tokens, cast(lp["ln_2"]["scale"]),
                          cast(lp["ln_2"]["bias"]), ln_eps)
        s2 = svec(ln2, lp["mlp"]["fc1_kernel"])
        h = jax.nn.gelu(ln2 @ cast(lp["mlp"]["fc1_kernel"])
                        + cast(lp["mlp"]["fc1_bias"]))
        tokens = tokens + h @ cast(lp["mlp"]["fc2_kernel"]) + cast(
            lp["mlp"]["fc2_bias"])
        smoothing.append((s1, s2))
    return smoothing


def _smoothing_vec(act, w, alpha: float = 0.5):
    a = jnp.max(jnp.abs(act.astype(jnp.float32).reshape(-1, act.shape[-1])),
                axis=0)
    wmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)
    s = (jnp.maximum(a, 1e-5) ** alpha) / (jnp.maximum(wmax, 1e-5)
                                           ** (1.0 - alpha))
    return np.asarray(jnp.clip(s, 1e-2, 1e4), np.float32)


def smooth_vit_params(params, smoothing):
    """Bake equalization vectors into a COPY of the fp param tree:
    ln.scale/bias /= s and W rows *= s — exact in fp (see
    compute_smoothing_vectors); the quantizer then sees tame activations."""
    params = jax.tree.map(lambda x: np.array(x, np.float32), params)
    enc = params["encoder"]
    for li, i in enumerate(_layer_ids(enc)):
        lp = enc[f"layers_{i}"]
        s1, s2 = smoothing[li]
        lp["ln_1"]["scale"] /= s1
        lp["ln_1"]["bias"] /= s1
        lp["self_attention"]["in_proj_kernel"] *= s1[:, None]
        lp["ln_2"]["scale"] /= s2
        lp["ln_2"]["bias"] /= s2
        lp["mlp"]["fc1_kernel"] *= s2[:, None]
    return jax.tree.map(jnp.asarray, params)


def vit_forward_quant(qparams, images, *, patch_size: int, num_heads: int,
                      num_class_tokens: int = 1, num_registers: int = 0,
                      ln_eps: float = 1e-5, compute_dtype=jnp.bfloat16,
                      interpret: bool = False, caps=None,
                      noise_layer: Optional[int] = None,
                      noise_type: str = "gaussian", noise_value=None,
                      noise_rng=None) -> jax.Array:
    """int8 (w8a8) eval forward from quantize_vit_params output.

    Applies the same VMEM-budget guards as the bf16 path (itemsize=1 for
    int8 weights): over-budget layers run the XLA w8a8 fallback instead of
    OOMing the Pallas kernel (ViT-L/H scale)."""
    from peekvit_tpu.ops.pallas.quant_blocks import (
        quant_attention_block,
        quant_attention_block_xla,
        quant_layer_block,
        quant_mlp_block,
        quant_mlp_block_xla,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    enc = qparams["encoder"]
    if "_embed_special" in qparams:
        # pos-embedding / conv-bias pre-folded at engine build, same as
        # the bf16 engine (prepare_engine_params fold_ln=True — for quant
        # trees only the embed fold applies; the LN fold needs fp weights)
        tokens, d = _embed_posfolded(qparams, images, patch_size, cast)
    else:
        tokens, d = _embed(qparams, images, patch_size, num_class_tokens,
                           num_registers, cast)
        tokens = tokens + cast(enc["pos_embedding"])
    mlp_dim = enc[f"layers_{_layer_ids(enc)[0]}"]["w1_q"].shape[-1]
    fuse_layer = _layer_fusable(d, mlp_dim, itemsize=1)
    fuse_attn = _attn_fusable(d, itemsize=1)
    fuse_mlp = _mlp_fusable(d, mlp_dim, itemsize=1)

    # NOTE: a one-dispatch int8 encoder (the quant analogue of
    # encoder_layers_one_call) measured NEUTRAL on v5e (6457 vs 6472
    # img/s dynamic, 6622 vs 6647 static): the bf16 one-call win is
    # weight-STREAMING recovery, and int8 weights (7 MB/layer) already
    # stream hidden under the halved-matmul layer time. Not shipped.

    for li, i in enumerate(_layer_ids(enc)):
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        lp = enc[f"layers_{i}"]
        acaps = caps[li][0] if caps else None
        mcaps = caps[li][1] if caps else None
        if fuse_layer:
            tokens = quant_layer_block(
                tokens, cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                lp["wqkv_q"], lp["sqkv"], cast(lp["bqkv"]),
                lp["wo_q"], lp["so"], cast(lp["bo"]),
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                lp["w1_q"], lp["s1"], cast(lp["b1"]),
                lp["w2_q"], lp["s2"], cast(lp["b2"]),
                num_heads, ln_eps, interpret, 1, caps[li] if caps else None,
            )
            continue
        if fuse_attn:
            tokens = quant_attention_block(
                tokens, cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                lp["wqkv_q"], lp["sqkv"], cast(lp["bqkv"]),
                lp["wo_q"], lp["so"], cast(lp["bo"]),
                num_heads, ln_eps, interpret, 2, acaps,
            )
        else:
            tokens = quant_attention_block_xla(
                tokens, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["wqkv_q"], lp["sqkv"], lp["bqkv"],
                lp["wo_q"], lp["so"], lp["bo"], num_heads, ln_eps,
                caps=acaps,
            )
        if fuse_mlp:
            tokens = quant_mlp_block(
                tokens, cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                lp["w1_q"], lp["s1"], cast(lp["b1"]),
                lp["w2_q"], lp["s2"], cast(lp["b2"]),
                ln_eps, interpret, 2, mcaps,
            )
        else:
            tokens = quant_mlp_block_xla(
                tokens, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                lp["w1_q"], lp["s1"], lp["b1"],
                lp["w2_q"], lp["s2"], lp["b2"], ln_eps, caps=mcaps,
            )
    return _classify(qparams, tokens, num_class_tokens, cast, ln_eps)


def rankvit_forward_fused(params, images, *, budget: float, patch_size: int,
                          num_heads: int, rankvit_layers: tuple,
                          num_class_tokens: int = 1, ln_eps: float = 1e-5,
                          compute_dtype=jnp.bfloat16,
                          interpret: bool = False,
                          noise_layer: Optional[int] = None,
                          noise_type: str = "gaussian", noise_value=None,
                          noise_rng=None) -> jax.Array:
    """RankViT eval forward with PHYSICAL token dropping.

    The linen RankViT is jit-stable across budgets (mask + key_mask algebra,
    one compile for all budgets). This engine is the other point in the
    design space (SURVEY.md §8 'static padded shapes ... one compile per
    budget value is acceptable for eval sweeps'): ``budget`` is static, so
    each ranked layer keeps ``ceil(n_alive * budget)`` tokens via a real
    top-k gather and every later matmul shrinks. Logits match the masked
    path exactly: excluded keys can't influence the class token, which is
    all the head reads.
    """
    from peekvit_tpu.ops.pallas.fused_attention import (
        fold_ln_into_weights,
        fused_attention_block,
        fused_layer_block_folded,
        fused_mlp_block,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    c = num_class_tokens
    enc = params["encoder"]
    if "_embed_special" in params:
        tokens, d = _embed_posfolded(params, images, patch_size, cast)
    else:
        tokens, d = _embed(params, images, patch_size, c, 0, cast)
        tokens = tokens + cast(enc["pos_embedding"])

    mlp_dim = enc[f"layers_{_layer_ids(enc)[0]}"]["mlp"]["fc1_kernel"].shape[-1]
    fuse_layer = _layer_fusable(d, mlp_dim)
    for i in _layer_ids(enc):
        # noise precedes the rank update (linen order); engine noise is
        # restricted to noise_layer <= first ranked layer so the token
        # layout still matches linen's (InferenceEngine guards this)
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        if i in rankvit_layers and budget < 1.0:
            n_alive = tokens.shape[1] - c
            # f32 product + ceil matches the linen _rank_update (and the
            # padded engine) bit-for-bit at boundary budgets; f64 math.ceil
            # could keep one extra token when the f32/f64 products straddle
            # an integer (ADVICE r2)
            n_keep = int(np.ceil(np.float32(n_alive) * np.float32(budget)))
            img = tokens[:, c:]
            norms = jnp.linalg.norm(img.astype(jnp.float32), axis=-1)
            _, idx = jax.lax.top_k(norms, n_keep)
            kept = jnp.take_along_axis(img, idx[..., None], axis=1)
            tokens = jnp.concatenate([tokens[:, :c], kept], axis=1)
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        if fuse_layer and tokens.shape[1] >= _MERGED_MIN_TOKENS:
            fq = lp.get("_folded_qkv")
            if fq is not None:
                wqkv, bqkv = cast(fq["kernel"]), cast(fq["bias"])
                f1 = lp["_folded_fc1"]
                w1, b1 = cast(f1["kernel"]), cast(f1["bias"])
            else:
                wqkv, bqkv = fold_ln_into_weights(
                    cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                    cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]))
                w1, b1 = fold_ln_into_weights(
                    cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                    cast(lp["mlp"]["fc1_kernel"]),
                    cast(lp["mlp"]["fc1_bias"]))
            tokens = fused_layer_block_folded(
                tokens, wqkv, bqkv,
                cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
                w1, b1,
                cast(lp["mlp"]["fc2_kernel"]), cast(lp["mlp"]["fc2_bias"]),
                num_heads, ln_eps, interpret,
            )
        else:  # few tokens: split kernels amortize weight DMA better
            tokens = fused_attention_block(
                tokens,
                cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]),
                cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
                num_heads, ln_eps, interpret,
            )
            tokens = fused_mlp_block(
                tokens,
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                cast(lp["mlp"]["fc1_kernel"]), cast(lp["mlp"]["fc1_bias"]),
                cast(lp["mlp"]["fc2_kernel"]), cast(lp["mlp"]["fc2_bias"]),
                ln_eps, interpret,
            )
    return _classify(params, tokens, c, cast, ln_eps)


def rankvit_forward_padded(params, images, budget, *, patch_size: int,
                           num_heads: int, rankvit_layers: tuple,
                           max_budget: float, num_class_tokens: int = 1,
                           ln_eps: float = 1e-5, compute_dtype=jnp.bfloat16,
                           interpret: bool = False,
                           noise_layer: Optional[int] = None,
                           noise_type: str = "gaussian", noise_value=None,
                           noise_rng=None) -> jax.Array:
    """Single-compile physical token drop (the SURVEY §8 north-star design).

    ``budget`` is a TRACED scalar — the whole sweep over budgets in
    (0, max_budget] shares one compilation. Each ranked layer gathers the
    top ``keep_max = ceil(n_alive * max_budget)`` tokens by norm (static
    shape), and a scalar ``num_keep = ceil(n_valid * budget)`` marks the
    tail invalid via an iota < num_keep mask. Invalid tokens are zeroed,
    excluded as attention keys (keymasked_attention_block — the additive
    -inf semantics of the linen RankViT, rankvit.py:39-81), and ranked
    with -inf norms so they can never re-enter. Logits match the linen
    masked path: excluded keys cannot influence the class token.
    """
    import math

    from peekvit_tpu.ops.pallas.fused_attention import (
        fold_ln_into_weights,
        fused_layer_block_folded,
        keymasked_layer_block_folded,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    c = num_class_tokens
    enc = params["encoder"]
    if "_embed_special" in params:
        tokens, d = _embed_posfolded(params, images, patch_size, cast)
    else:
        tokens, d = _embed(params, images, patch_size, c, 0, cast)
        tokens = tokens + cast(enc["pos_embedding"])
    b = tokens.shape[0]

    n_img = tokens.shape[1] - c          # static buffer length (img tokens)
    n_valid = jnp.float32(n_img)         # traced count of VALID img tokens
    valid = None                         # (B, n_img) in {0,1}; None = all

    for i in _layer_ids(enc):
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        if i in rankvit_layers:
            keep_max = min(int(math.ceil(n_img * max_budget)), n_img)
            img = tokens[:, c:]
            norms = jnp.linalg.norm(img.astype(jnp.float32), axis=-1)
            if valid is not None:
                neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
                norms = jnp.where(valid > 0, norms, neg)
            _, idx = jax.lax.top_k(norms, keep_max)  # static k
            kept = jnp.take_along_axis(img, idx[..., None], axis=1)
            # same ceil(alive * budget) cascade as the linen _rank_update
            num_keep = jnp.ceil(n_valid * jnp.asarray(budget, jnp.float32))
            ranks = jax.lax.broadcasted_iota(jnp.float32, (b, keep_max), 1)
            valid = (ranks < num_keep).astype(jnp.float32)
            kept = kept * valid[..., None].astype(kept.dtype)
            tokens = jnp.concatenate([tokens[:, :c], kept], axis=1)
            n_img = keep_max
            n_valid = num_keep
        if not _layer_fusable(d, lp["mlp"]["fc1_kernel"].shape[-1]):
            raise NotImplementedError(
                "padded RankViT engine needs the merged-kernel weight "
                "budget (use the exact-drop or linen path for models "
                "beyond ViT-L scale)")
        fq = lp.get("_folded_qkv")
        if fq is not None:
            wqkv, bqkv = cast(fq["kernel"]), cast(fq["bias"])
            f1 = lp["_folded_fc1"]
            w1, b1 = cast(f1["kernel"]), cast(f1["bias"])
        else:
            wqkv, bqkv = fold_ln_into_weights(
                cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]))
            w1, b1 = fold_ln_into_weights(
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                cast(lp["mlp"]["fc1_kernel"]), cast(lp["mlp"]["fc1_bias"]))
        wargs = (
            wqkv, bqkv,
            cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
            w1, b1,
            cast(lp["mlp"]["fc2_kernel"]), cast(lp["mlp"]["fc2_bias"]),
        )
        if valid is None:
            tokens = fused_layer_block_folded(
                tokens, *wargs, num_heads, ln_eps, interpret)
        else:
            km = jnp.concatenate(
                [jnp.ones((b, c), jnp.float32), valid], axis=1
            ).reshape(b, 1, c + n_img).astype(compute_dtype)
            tokens = keymasked_layer_block_folded(
                tokens, km, *wargs, num_heads, ln_eps, interpret)
    return _classify(params, tokens, c, cast, ln_eps)


def rankvit_forward_padded_quant(qparams, images, budget, *,
                                 patch_size: int, num_heads: int,
                                 rankvit_layers: tuple, max_budget: float,
                                 num_class_tokens: int = 1,
                                 ln_eps: float = 1e-5,
                                 compute_dtype=jnp.bfloat16,
                                 interpret: bool = False,
                                 caps=None,
                                 noise_layer: Optional[int] = None,
                                 noise_type: str = "gaussian",
                                 noise_value=None,
                                 noise_rng=None) -> jax.Array:
    """Single-compile padded physical drop, int8 w8a8 (the §8 north-star
    knob composed with the 2x-int8 MXU rate): same traced-budget padded
    top-k cascade as rankvit_forward_padded, with every layer running the
    merged int8 kernel (key exclusion via quant_keymasked_layer_block)."""
    from peekvit_tpu.ops.pallas.quant_blocks import (
        quant_keymasked_layer_block,
        quant_layer_block,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    c = num_class_tokens
    tokens, d = _embed(qparams, images, patch_size, c, 0, cast)
    b = tokens.shape[0]
    enc = qparams["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])

    n_img = tokens.shape[1] - c
    n_valid = jnp.float32(n_img)
    valid = None

    for li, i in enumerate(_layer_ids(enc)):
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        lp = enc[f"layers_{i}"]
        if not _layer_fusable(d, lp["w1_q"].shape[-1], itemsize=1):
            # same guard as the bf16 padded path: over-budget layers would
            # die in an opaque Mosaic scoped-vmem error at compile time
            raise NotImplementedError(
                "padded int8 RankViT engine needs the merged-kernel weight "
                "budget (use the exact-drop path for models beyond ViT-L "
                "scale)")
        if i in rankvit_layers:
            keep_max = min(int(np.ceil(n_img * max_budget)), n_img)
            img = tokens[:, c:]
            norms = jnp.linalg.norm(img.astype(jnp.float32), axis=-1)
            if valid is not None:
                neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
                norms = jnp.where(valid > 0, norms, neg)
            _, idx = jax.lax.top_k(norms, keep_max)
            kept = jnp.take_along_axis(img, idx[..., None], axis=1)
            num_keep = jnp.ceil(n_valid * jnp.asarray(budget, jnp.float32))
            ranks = jax.lax.broadcasted_iota(jnp.float32, (b, keep_max), 1)
            valid = (ranks < num_keep).astype(jnp.float32)
            kept = kept * valid[..., None].astype(kept.dtype)
            tokens = jnp.concatenate([tokens[:, :c], kept], axis=1)
            n_img = keep_max
            n_valid = num_keep
        wargs = (
            cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
            lp["wqkv_q"], lp["sqkv"], cast(lp["bqkv"]),
            lp["wo_q"], lp["so"], cast(lp["bo"]),
            cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
            lp["w1_q"], lp["s1"], cast(lp["b1"]),
            lp["w2_q"], lp["s2"], cast(lp["b2"]),
        )
        lcaps = caps[li] if caps else None
        if valid is None:
            tokens = quant_layer_block(
                tokens, *wargs, num_heads, ln_eps, interpret, 1, lcaps)
        else:
            km = jnp.concatenate(
                [jnp.ones((b, c), jnp.float32), valid], axis=1
            ).reshape(b, 1, c + n_img).astype(compute_dtype)
            tokens = quant_keymasked_layer_block(
                tokens, km, *wargs, num_heads, ln_eps, interpret, 1, lcaps)
    return _classify(qparams, tokens, c, cast, ln_eps)


def rankvit_forward_quant(qparams, images, *, budget: float, patch_size: int,
                          num_heads: int, rankvit_layers: tuple,
                          num_class_tokens: int = 1, ln_eps: float = 1e-5,
                          compute_dtype=jnp.bfloat16,
                          interpret: bool = False, caps=None,
                          noise_layer: Optional[int] = None,
                          noise_type: str = "gaussian", noise_value=None,
                          noise_rng=None) -> jax.Array:
    """int8 w8a8 + physical token dropping: the sparse serving fast path.

    Composes rankvit_forward_fused's static top-k gather with the int8
    quant blocks — every ranked layer shrinks the matmuls AND they run at
    the MXU's 2x int8 rate."""
    import math

    from peekvit_tpu.ops.pallas.quant_blocks import (
        quant_attention_block,
        quant_attention_block_xla,
        quant_layer_block,
        quant_mlp_block,
        quant_mlp_block_xla,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    c = num_class_tokens
    tokens, d = _embed(qparams, images, patch_size, c, 0, cast)
    enc = qparams["encoder"]
    mlp_dim = enc[f"layers_{_layer_ids(enc)[0]}"]["w1_q"].shape[-1]
    fuse_layer = _layer_fusable(d, mlp_dim, itemsize=1)
    fuse_attn = _attn_fusable(d, itemsize=1)
    fuse_mlp = _mlp_fusable(d, mlp_dim, itemsize=1)
    tokens = tokens + cast(enc["pos_embedding"])

    for li, i in enumerate(_layer_ids(enc)):
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        if i in rankvit_layers and budget < 1.0:
            n_alive = tokens.shape[1] - c
            n_keep = int(np.ceil(np.float32(n_alive) * np.float32(budget)))
            img = tokens[:, c:]
            norms = jnp.linalg.norm(img.astype(jnp.float32), axis=-1)
            _, idx = jax.lax.top_k(norms, n_keep)
            kept = jnp.take_along_axis(img, idx[..., None], axis=1)
            tokens = jnp.concatenate([tokens[:, :c], kept], axis=1)
        lp = enc[f"layers_{i}"]
        acaps = caps[li][0] if caps else None
        mcaps = caps[li][1] if caps else None
        if fuse_layer and tokens.shape[1] >= _MERGED_MIN_TOKENS:
            tokens = quant_layer_block(
                tokens, cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                lp["wqkv_q"], lp["sqkv"], cast(lp["bqkv"]),
                lp["wo_q"], lp["so"], cast(lp["bo"]),
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                lp["w1_q"], lp["s1"], cast(lp["b1"]),
                lp["w2_q"], lp["s2"], cast(lp["b2"]),
                num_heads, ln_eps, interpret, 1, caps[li] if caps else None,
            )
            continue
        if fuse_attn:
            tokens = quant_attention_block(
                tokens, cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                lp["wqkv_q"], lp["sqkv"], cast(lp["bqkv"]),
                lp["wo_q"], lp["so"], cast(lp["bo"]),
                num_heads, ln_eps, interpret, 2, acaps,
            )
        else:
            tokens = quant_attention_block_xla(
                tokens, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["wqkv_q"], lp["sqkv"], lp["bqkv"],
                lp["wo_q"], lp["so"], lp["bo"], num_heads, ln_eps,
                caps=acaps,
            )
        if fuse_mlp:
            tokens = quant_mlp_block(
                tokens, cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                lp["w1_q"], lp["s1"], cast(lp["b1"]),
                lp["w2_q"], lp["s2"], cast(lp["b2"]),
                ln_eps, interpret, 2, mcaps,
            )
        else:
            tokens = quant_mlp_block_xla(
                tokens, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                lp["w1_q"], lp["s1"], lp["b1"],
                lp["w2_q"], lp["s2"], lp["b2"], ln_eps, caps=mcaps,
            )
    return _classify(qparams, tokens, c, cast, ln_eps)


def _routed_moe_mlp(z, gating, experts, cast, capacity_factor: float):
    """Top-1 ROUTED MoE MLP dispatch (VERDICT r4 #2): compute each token's
    expert ONCE instead of the reference's dense every-expert execution
    (/root/reference/models/moevit.py:49-61 pays E x FLOPs for a one-hot
    combine).

    TPU-shaped dispatch — gather-only, no (T, d) scatter: tokens sort by
    expert id (stable lax.sort), per-expert segments gather into an
    (E, cap) buffer with ``cap = ceil(T/E * capacity_factor)`` rows each,
    the experts run as ONE batched einsum over the leading expert axis
    (XLA maps it to full-size MXU matmuls), and each token gathers its
    own row back. The eval gate is one_hot(argmax) (ops/gates.py
    GumbelSoftmax eval semantics), so the routed result equals the dense
    combine EXACTLY whenever every expert's load fits its capacity;
    overflow tokens (lowest priority = latest in token order, the GShard
    position-in-expert convention) contribute zero instead of their
    expert output — measured as an overflow rate, not a silent error
    (tests/test_moe_routed.py). Gate math stays fp32: argmax selection is
    discontinuous and bf16 near-ties would swap whole expert outputs."""
    b, n, d = z.shape
    t = b * n
    e_total = experts["fc1_kernel"].shape[0]
    cap = int(np.ceil(t / e_total * capacity_factor))
    zf = z.reshape(t, d)
    gp = gating["gate"]
    scores = (zf.astype(jnp.float32) @ gp["kernel"].astype(
        jnp.float32).reshape(d, e_total)
        + gp["bias"].astype(jnp.float32).reshape(e_total))
    eid = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (T,)

    order = jnp.argsort(eid, stable=True)                # tokens by expert
    counts = jnp.bincount(eid, length=e_total)           # (E,)
    offsets = jnp.cumsum(counts) - counts                # exclusive
    # buffer slot (e, c) <- sorted position offsets[e] + c (c < counts[e])
    cidx = jax.lax.broadcasted_iota(jnp.int32, (e_total, cap), 1)
    slot_valid = cidx < counts[:, None]
    src = jnp.where(slot_valid, offsets[:, None] + cidx, 0)
    buf = jnp.take(zf, jnp.take(order, src.reshape(-1)), axis=0)
    buf = jnp.where(slot_valid.reshape(-1)[:, None], buf,
                    jnp.zeros((), buf.dtype)).reshape(e_total, cap, d)

    h = jax.nn.gelu(
        jnp.einsum("ecd,edm->ecm", buf, cast(experts["fc1_kernel"]))
        + cast(experts["fc1_bias"])[:, None, :], approximate=False)
    out = jnp.einsum("ecm,emd->ecd", h, cast(experts["fc2_kernel"])) \
        + cast(experts["fc2_bias"])[:, None, :]

    # token t's row: rank within its expert = position in sorted order
    # minus the expert's segment offset (inverse perm via an int scatter)
    inv = jnp.zeros((t,), jnp.int32).at[order].set(
        jnp.arange(t, dtype=jnp.int32))
    rank = inv - offsets[eid]
    tok_valid = rank < cap
    flat = out.reshape(e_total * cap, d)
    idx = jnp.clip(eid * cap + rank, 0, e_total * cap - 1)
    combined = jnp.where(tok_valid[:, None], jnp.take(flat, idx, axis=0),
                         jnp.zeros((), flat.dtype))
    return combined.reshape(b, n, d).astype(z.dtype)


def moevit_forward_fused(params, images, *, patch_size: int,
                         num_heads: int, mlp_moes=None, attn_moes=None,
                         num_layers: int = 0, ln_eps: float = 1e-5,
                         compute_dtype=jnp.bfloat16,
                         interpret: bool = False,
                         routed_capacity: Optional[float] = None,
                         routed_min_experts: int = 3,
                         noise_layer: Optional[int] = None,
                         noise_type: str = "gaussian", noise_value=None,
                         noise_rng=None) -> jax.Array:
    """Fused eval forward for VisionTransformerMoE (VERDICT r2 #5).

    Single-expert sublayers run the merged folded Pallas layer (or the
    split fused kernels when only one sublayer is standard); MoE sublayers
    run the reference's DENSE top-1 combine (moevit.py:49-61,84-96) in XLA
    — every expert computes, a one-hot argmax gate (eval GumbelSoftmax
    semantics, ops/gates.py) selects via einsum 'ebsd,bse->bsd', which XLA
    maps to batched MXU matmuls. Classifier reads token 0 only (the MoE
    model's quirk, moevit.py:300-311).

    ``routed_capacity`` (VERDICT r4 #2, opt-in): MLP-MoE sublayers switch
    to top-1 capacity dispatch (:func:`_routed_moe_mlp`) — one expert's
    FLOPs per token instead of E x. Attention MoEs stay dense even when
    routed: every expert's K/V must span ALL tokens (a token attends over
    the whole sequence under its own expert's projections), so routing
    could only thin the per-token q/out-proj while keeping E full K/V
    sweeps — no engine win at the reference's scales."""
    from peekvit_tpu.ops.attention import attention_core
    from peekvit_tpu.ops.pallas.fused_attention import (
        fold_ln_into_weights,
        fused_attention_block,
        fused_layer_block_folded,
        fused_mlp_block,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    x = cast(images)
    wconv = cast(params["conv_proj"]["kernel"])
    d = wconv.shape[-1]
    tokens = _patchify(x, patch_size) @ wconv.reshape(-1, d) + cast(
        params["conv_proj"]["bias"])
    b = tokens.shape[0]
    cls = jnp.broadcast_to(cast(params["class_token"]), (b, 1, d))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])
    mlp_moes = tuple(mlp_moes or (1,) * num_layers)
    attn_moes = tuple(attn_moes or (1,) * num_layers)

    def gate_probs(y, gp):
        # gate math in fp32 (like the residual engine's gates): argmax
        # expert selection is discontinuous, so bf16 rounding of near-tied
        # scores would swap a token's entire expert output vs linen
        scores = (y.astype(jnp.float32)
                  @ gp["gate"]["kernel"].astype(jnp.float32)
                  + gp["gate"]["bias"].astype(jnp.float32))
        return jax.nn.one_hot(jnp.argmax(scores, axis=-1), scores.shape[-1],
                              dtype=y.dtype)

    fusable = _layer_fusable(d, _first_mlp_dim_moe(enc))
    for li, i in enumerate(_layer_ids(enc)):
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        lp = enc[f"layers_{i}"]
        at = lp["self_attention"]
        mlp = lp["mlp"]
        attn_single = attn_moes[li] == 1
        mlp_single = mlp_moes[li] == 1
        if attn_single and mlp_single and fusable:
            a0, m0 = at["experts_0"], mlp["experts_0"]
            fq = lp.get("_folded_qkv")
            if fq is not None:
                wqkv, bqkv = cast(fq["kernel"]), cast(fq["bias"])
                f1 = lp["_folded_fc1"]
                w1, b1 = cast(f1["kernel"]), cast(f1["bias"])
            else:
                wqkv, bqkv = fold_ln_into_weights(
                    cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                    cast(a0["in_proj_kernel"]), cast(a0["in_proj_bias"]))
                w1, b1 = fold_ln_into_weights(
                    cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                    cast(m0["fc1_kernel"]), cast(m0["fc1_bias"]))
            tokens = fused_layer_block_folded(
                tokens, wqkv, bqkv,
                cast(a0["out_proj_kernel"]), cast(a0["out_proj_bias"]),
                w1, b1, cast(m0["fc2_kernel"]), cast(m0["fc2_bias"]),
                num_heads, ln_eps, interpret)
            continue
        # ---- attention sublayer
        if attn_single and fusable:
            a0 = at["experts_0"]
            tokens = fused_attention_block(
                tokens, cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                cast(a0["in_proj_kernel"]), cast(a0["in_proj_bias"]),
                cast(a0["out_proj_kernel"]), cast(a0["out_proj_bias"]),
                num_heads, ln_eps, interpret)
        else:
            y = _layer_norm(tokens, cast(lp["ln_1"]["scale"]),
                            cast(lp["ln_1"]["bias"]), ln_eps)
            if attn_single:
                a0 = at["experts_0"]
                qkv = y @ cast(a0["in_proj_kernel"]) + cast(a0["in_proj_bias"])
                q, k, v = jnp.split(qkv, 3, axis=-1)
                o = attention_core(q, k, v, num_heads)
                tokens = tokens + (o @ cast(a0["out_proj_kernel"])
                                   + cast(a0["out_proj_bias"]))
            else:
                probs = gate_probs(y, at["gating_network"])
                ex = at["experts"]
                outs = []
                for e in range(attn_moes[li]):  # dense experts (reference)
                    qkv = y @ cast(ex["in_proj_kernel"][e]) + cast(
                        ex["in_proj_bias"][e])
                    q, k, v = jnp.split(qkv, 3, axis=-1)
                    o = attention_core(q, k, v, num_heads)
                    outs.append(o @ cast(ex["out_proj_kernel"][e])
                                + cast(ex["out_proj_bias"][e]))
                combined = jnp.einsum("ebsd,bse->bsd", jnp.stack(outs), probs)
                tokens = tokens + combined
        # ---- MLP sublayer
        if mlp_single and fusable:
            m0 = mlp["experts_0"]
            tokens = fused_mlp_block(
                tokens, cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                cast(m0["fc1_kernel"]), cast(m0["fc1_bias"]),
                cast(m0["fc2_kernel"]), cast(m0["fc2_bias"]),
                ln_eps, interpret)
        else:
            z = _layer_norm(tokens, cast(lp["ln_2"]["scale"]),
                            cast(lp["ln_2"]["bias"]), ln_eps)
            if mlp_single:
                m0 = mlp["experts_0"]
                h = jax.nn.gelu(z @ cast(m0["fc1_kernel"])
                                + cast(m0["fc1_bias"]), approximate=False)
                tokens = tokens + (h @ cast(m0["fc2_kernel"])
                                   + cast(m0["fc2_bias"]))
            elif (routed_capacity is not None
                  and mlp_moes[li] >= routed_min_experts):
                # routed top-1 dispatch: one expert's FLOPs per token
                # instead of the reference's dense E x (opt-in engine
                # mode; exact when every expert load fits capacity).
                # Layers below routed_min_experts stay dense: routed
                # rows ~= cf*T vs dense E*T plus ~1.4 ms of dispatch
                # (sort+gathers, measured round 5), so small-E layers
                # would pay MORE routed than dense
                tokens = tokens + _routed_moe_mlp(
                    z, mlp["gating_network"], mlp["experts"], cast,
                    routed_capacity)
            else:
                probs = gate_probs(z, mlp["gating_network"])
                ex = mlp["experts"]
                h = jax.nn.gelu(
                    jnp.einsum("bnd,edm->ebnm", z, cast(ex["fc1_kernel"]))
                    + cast(ex["fc1_bias"])[:, None, None, :],
                    approximate=False)
                outs = jnp.einsum("ebnm,emd->ebnd", h, cast(ex["fc2_kernel"])
                                  ) + cast(ex["fc2_bias"])[:, None, None, :]
                tokens = tokens + jnp.einsum("ebsd,bse->bsd", outs, probs)

    # final LN on token 0 only, then head (moevit classifier quirk)
    cls = _layer_norm(tokens[:, :1], cast(enc["ln"]["scale"]),
                      cast(enc["ln"]["bias"]), ln_eps)[:, 0]
    logits = cls @ cast(params["head"]["kernel"]) + cast(
        params["head"]["bias"])
    return logits.astype(jnp.float32)


def _first_mlp_dim_moe(enc) -> int:
    lp = enc[f"layers_{_layer_ids(enc)[0]}"]["mlp"]
    if "experts_0" in lp:
        return lp["experts_0"]["fc1_kernel"].shape[-1]
    return lp["experts"]["fc1_kernel"].shape[-1]


def quantize_moevit_params(params):
    """int8 tree for VisionTransformerMoE (VERDICT r3 #8): every expert's
    four mats go symmetric per-output-channel int8 (stacked experts keep
    their leading E axis with (E, 1, out) scales); gating networks, LNs,
    embed and head stay fp."""
    from peekvit_tpu.ops.pallas.quant_blocks import quantize_linear

    def q_stacked(w):  # (E, in, out) -> int8 + (E, 1, out) scales
        w = w.astype(jnp.float32)
        scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return wq, scale

    q = {"conv_proj": params["conv_proj"],
         "class_token": params["class_token"], "head": params["head"],
         "encoder": {"pos_embedding": params["encoder"]["pos_embedding"],
                     "ln": params["encoder"]["ln"]}}
    for name, lp in params["encoder"].items():
        if not name.startswith("layers_"):
            continue
        at, mlp = lp["self_attention"], lp["mlp"]
        qat = {}
        if "experts_0" in at:
            a0 = at["experts_0"]
            qat["wqkv_q"], qat["sqkv"] = quantize_linear(a0["in_proj_kernel"])
            qat["bqkv"] = a0["in_proj_bias"]
            qat["wo_q"], qat["so"] = quantize_linear(a0["out_proj_kernel"])
            qat["bo"] = a0["out_proj_bias"]
        else:
            ex = at["experts"]
            qat["wqkv_q"], qat["sqkv"] = q_stacked(ex["in_proj_kernel"])
            qat["bqkv"] = ex["in_proj_bias"]
            qat["wo_q"], qat["so"] = q_stacked(ex["out_proj_kernel"])
            qat["bo"] = ex["out_proj_bias"]
            qat["gating_network"] = at["gating_network"]
        qmlp = {}
        if "experts_0" in mlp:
            m0 = mlp["experts_0"]
            qmlp["w1_q"], qmlp["s1"] = quantize_linear(m0["fc1_kernel"])
            qmlp["b1"] = m0["fc1_bias"]
            qmlp["w2_q"], qmlp["s2"] = quantize_linear(m0["fc2_kernel"])
            qmlp["b2"] = m0["fc2_bias"]
        else:
            ex = mlp["experts"]
            qmlp["w1_q"], qmlp["s1"] = q_stacked(ex["fc1_kernel"])
            qmlp["b1"] = ex["fc1_bias"]
            qmlp["w2_q"], qmlp["s2"] = q_stacked(ex["fc2_kernel"])
            qmlp["b2"] = ex["fc2_bias"]
            qmlp["gating_network"] = mlp["gating_network"]
        q["encoder"][name] = {"ln_1": lp["ln_1"], "ln_2": lp["ln_2"],
                              "self_attention": qat, "mlp": qmlp}
    return q


def moevit_forward_quant(qparams, images, *, patch_size: int,
                         num_heads: int, mlp_moes=None, attn_moes=None,
                         num_layers: int = 0, ln_eps: float = 1e-5,
                         compute_dtype=jnp.bfloat16,
                         interpret: bool = False,
                         noise_layer: Optional[int] = None,
                         noise_type: str = "gaussian", noise_value=None,
                         noise_rng=None) -> jax.Array:
    """int8 (w8a8) eval forward for VisionTransformerMoE (VERDICT r3 #8).

    Single-expert sublayers run the merged int8 Pallas kernels; MoE
    sublayers keep the reference's DENSE top-1 combine (moevit.py:49-61)
    with every expert's matmuls in int8 via the XLA w8a8 path
    (quant_blocks._quant_linear_xla) — gate math stays fp32 (argmax expert
    selection is discontinuous, so quantization noise on near-tied scores
    would swap whole expert outputs)."""
    from peekvit_tpu.ops.attention import attention_core
    from peekvit_tpu.ops.pallas.quant_blocks import (
        _quant_linear_xla,
        quant_attention_block,
        quant_layer_block,
        quant_mlp_block,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    x = cast(images)
    wconv = cast(qparams["conv_proj"]["kernel"])
    d = wconv.shape[-1]
    tokens = _patchify(x, patch_size) @ wconv.reshape(-1, d) + cast(
        qparams["conv_proj"]["bias"])
    b = tokens.shape[0]
    cls = jnp.broadcast_to(cast(qparams["class_token"]), (b, 1, d))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    enc = qparams["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])
    mlp_moes = tuple(mlp_moes or (1,) * num_layers)
    attn_moes = tuple(attn_moes or (1,) * num_layers)

    def gate_probs(y, gp):
        scores = (y.astype(jnp.float32)
                  @ gp["gate"]["kernel"].astype(jnp.float32)
                  + gp["gate"]["bias"].astype(jnp.float32))
        return jax.nn.one_hot(jnp.argmax(scores, axis=-1), scores.shape[-1],
                              dtype=jnp.float32)

    ids = _layer_ids(enc)
    mlp_dim = (enc[f"layers_{ids[0]}"]["mlp"]["w1_q"].shape[-1])
    fusable = _layer_fusable(d, mlp_dim, itemsize=1)
    for li, i in enumerate(ids):
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        lp = enc[f"layers_{i}"]
        at, mlp = lp["self_attention"], lp["mlp"]
        attn_single = attn_moes[li] == 1
        mlp_single = mlp_moes[li] == 1
        if attn_single and mlp_single and fusable:
            tokens = quant_layer_block(
                tokens, cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                at["wqkv_q"], at["sqkv"], cast(at["bqkv"]),
                at["wo_q"], at["so"], cast(at["bo"]),
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                mlp["w1_q"], mlp["s1"], cast(mlp["b1"]),
                mlp["w2_q"], mlp["s2"], cast(mlp["b2"]),
                num_heads, ln_eps, interpret, 1, None,
            )
            continue
        # ---- attention sublayer
        if attn_single and fusable:
            tokens = quant_attention_block(
                tokens, cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                at["wqkv_q"], at["sqkv"], cast(at["bqkv"]),
                at["wo_q"], at["so"], cast(at["bo"]),
                num_heads, ln_eps, interpret, 2, None,
            )
        else:
            y = _layer_norm(tokens, cast(lp["ln_1"]["scale"]),
                            cast(lp["ln_1"]["bias"]), ln_eps)
            if attn_single:
                qkv = _quant_linear_xla(y, at["wqkv_q"], at["sqkv"],
                                        at["bqkv"]).astype(compute_dtype)
                q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
                o = attention_core(q_, k_, v_, num_heads)
                tokens = tokens + _quant_linear_xla(
                    o, at["wo_q"], at["so"], at["bo"]).astype(tokens.dtype)
            else:
                probs = gate_probs(y, at["gating_network"])
                outs = []
                for e in range(attn_moes[li]):  # dense experts (reference)
                    qkv = _quant_linear_xla(
                        y, at["wqkv_q"][e], at["sqkv"][e],
                        at["bqkv"][e]).astype(compute_dtype)
                    q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
                    o = attention_core(q_, k_, v_, num_heads)
                    outs.append(_quant_linear_xla(
                        o, at["wo_q"][e], at["so"][e], at["bo"][e]))
                combined = jnp.einsum("ebsd,bse->bsd", jnp.stack(outs),
                                      probs)
                tokens = tokens + combined.astype(tokens.dtype)
        # ---- MLP sublayer
        if mlp_single and fusable:
            tokens = quant_mlp_block(
                tokens, cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                mlp["w1_q"], mlp["s1"], cast(mlp["b1"]),
                mlp["w2_q"], mlp["s2"], cast(mlp["b2"]),
                ln_eps, interpret, 2, None,
            )
        else:
            z = _layer_norm(tokens, cast(lp["ln_2"]["scale"]),
                            cast(lp["ln_2"]["bias"]), ln_eps)
            if mlp_single:
                h = jax.nn.gelu(_quant_linear_xla(
                    z, mlp["w1_q"], mlp["s1"], mlp["b1"]),
                    approximate=False).astype(compute_dtype)
                tokens = tokens + _quant_linear_xla(
                    h, mlp["w2_q"], mlp["s2"],
                    mlp["b2"]).astype(tokens.dtype)
            else:
                probs = gate_probs(z, mlp["gating_network"])
                outs = []
                for e in range(mlp_moes[li]):
                    h = jax.nn.gelu(_quant_linear_xla(
                        z, mlp["w1_q"][e], mlp["s1"][e], mlp["b1"][e]),
                        approximate=False).astype(compute_dtype)
                    outs.append(_quant_linear_xla(
                        h, mlp["w2_q"][e], mlp["s2"][e], mlp["b2"][e]))
                combined = jnp.einsum("ebsd,bse->bsd", jnp.stack(outs),
                                      probs)
                tokens = tokens + combined.astype(tokens.dtype)

    cls_out = _layer_norm(tokens[:, :1], cast(enc["ln"]["scale"]),
                          cast(enc["ln"]["bias"]), ln_eps)[:, 0]
    logits = cls_out @ cast(qparams["head"]["kernel"]) + cast(
        qparams["head"]["bias"])
    return logits.astype(jnp.float32)


def adavit_forward_fused(params, images, *, patch_size: int,
                         num_heads: int, num_layers: int,
                         num_class_tokens: int = 1, num_registers: int = 0,
                         act_eps: float = 0.01, gate_scale: float = 10.0,
                         gate_center: float = 30.0, ln_eps: float = 1e-5,
                         compute_dtype=jnp.bfloat16,
                         interpret: bool = False) -> jax.Array:
    """Fused eval forward for A-ViT (VERDICT r2 #5): the ACT carry algebra
    (cumulative halting c, remainder R, active mask — reference
    adavit.py:140-219 as modeled in models/adavit.py) runs in XLA on (B, N)
    state while each layer's block executes as ONE merged Pallas kernel
    with the A-ViT LN(x*a)*a masking (avit_layer_block). The scan-stacked
    block params (leading layer axis) are sliced per layer — a static
    unroll, matching the linen nn.scan numerics."""
    from peekvit_tpu.ops.pallas.fused_attention import avit_layer_block

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    tokens, d = _embed(params, images, patch_size, num_class_tokens,
                       num_registers, cast)
    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])
    bp = enc["blocks"]["block"]  # leading (num_layers, ...) axis
    b, n, _ = tokens.shape
    f32 = jnp.float32

    out = tokens
    output = jnp.zeros_like(tokens)
    c = jnp.zeros((b, n), f32)
    R = jnp.ones((b, n), f32)
    active = jnp.ones((b, n), f32)

    for l in range(num_layers):
        lw = jax.tree.map(lambda leaf: leaf[l], bp)
        at = lw["self_attention"]
        a3 = active[..., None]
        x_in = out * a3.astype(out.dtype)
        x_new = avit_layer_block(
            x_in, a3.astype(compute_dtype),
            cast(lw["ln_1"]["scale"]), cast(lw["ln_1"]["bias"]),
            cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]),
            cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
            cast(lw["ln_2"]["scale"]), cast(lw["ln_2"]["bias"]),
            cast(lw["mlp"]["fc1_kernel"]), cast(lw["mlp"]["fc1_bias"]),
            cast(lw["mlp"]["fc2_kernel"]), cast(lw["mlp"]["fc2_bias"]),
            num_heads, ln_eps, interpret,
        )
        h = jax.nn.sigmoid(x_new[:, :, 0].astype(f32) * gate_scale
                           - gate_center)
        if l == num_layers - 1:  # every remaining token halts
            h = jnp.ones_like(h)
        block_out = x_new * a3.astype(out.dtype)
        c = c + h
        reached = ((c > 1.0 - act_eps).astype(f32)) * active
        delta1 = block_out * (R * reached)[..., None].astype(out.dtype)
        not_reached = (c < 1.0 - act_eps).astype(f32)
        R = R - not_reached * h
        delta2 = block_out * (h * not_reached)[..., None].astype(out.dtype)
        active = not_reached
        output = output + delta1 + delta2
        out = x_new

    return _classify({"encoder": enc, "head": params["head"]}, output,
                     num_class_tokens, cast, ln_eps)


def quantize_residualvit_params(params):
    """Residual variant of quantize_vit_params: gate projections,
    budget-token params and LNs stay fp; the four big mats go int8."""
    q = quantize_vit_params(params)
    for name, lp in params["encoder"].items():
        if name.startswith("early_exit_heads_"):
            q["encoder"][name] = lp  # EE heads: tiny, stay fp
            continue
        if not name.startswith("layers_"):
            continue
        q["encoder"][name]["residual_gate"] = lp["residual_gate"]
        if "budget_token_gate" in lp:
            q["encoder"][name]["budget_token_gate"] = lp["budget_token_gate"]
    for key in ("learnable_budget_token_1", "learnable_budget_token_2"):
        if key in params:
            q[key] = params[key]
    return q


def residualvit_forward_quant(qparams, images, budget, *, patch_size: int,
                              num_heads: int, num_class_tokens: int = 1,
                              num_registers: int = 0, gate_temp: float = 1.0,
                              gate_bias: float = 0.0,
                              budget_token: Any = "learnable",
                              compute_dtype=jnp.bfloat16,
                              interpret: bool = False,
                              pmean_axis: Optional[str] = None,
                              caps=None,
                              early_exits: bool = False,
                              noise_layer: Optional[int] = None,
                              noise_type: str = "gaussian", noise_value=None,
                              noise_rng=None):
    """int8 (w8a8) ResidualViT eval forward — the gated model's quantized
    serving path; gate math identical to residualvit_forward_fused.
    Over-VMEM-budget layers fall back to the XLA w8a8 masked path.
    ``caps``: optional static percentile calibration from
    collect_residualvit_activation_stats (same layout as the plain engine's)."""
    from peekvit_tpu.ops.pallas.quant_blocks import (
        quant_attention_block_xla,
        quant_masked_attention_block,
        quant_masked_layer_block,
        quant_masked_mlp_block,
        quant_mlp_block_xla,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    c = num_class_tokens
    tokens, d = _embed(qparams, images, patch_size, c, num_registers, cast)
    b = tokens.shape[0]
    enc = qparams["encoder"]
    mlp_dim = enc[f"layers_{_layer_ids(enc)[0]}"]["w1_q"].shape[-1]
    fuse_layer = _layer_fusable(d, mlp_dim, itemsize=1)
    fuse_attn = _attn_fusable(d, itemsize=1)
    fuse_mlp = _mlp_fusable(d, mlp_dim, itemsize=1)
    tokens = tokens + cast(enc["pos_embedding"])

    budget_vec = jnp.broadcast_to(
        jnp.asarray(budget, jnp.float32), (b,))[:, None, None]
    bcast = budget_vec.astype(compute_dtype)
    if budget_token == "learnable":
        btok = cast(qparams["learnable_budget_token_1"]) * bcast
    elif budget_token == "learnable_interpolate":
        # two lerped embeddings (reference residualvit.py:552-585)
        btok = (cast(qparams["learnable_budget_token_1"]) * bcast
                + cast(qparams["learnable_budget_token_2"]) * (1.0 - bcast))
    elif budget_token:
        btok = jnp.broadcast_to(bcast, (b, 1, d))
    else:
        raise NotImplementedError("residual quant engine needs a budget token")
    btok = jnp.broadcast_to(btok, (b, 1, d))
    tokens = jnp.concatenate([tokens, btok], axis=1)
    s = c + num_registers
    exits = []

    for li, i in enumerate(_layer_ids(enc)):
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        lp = enc[f"layers_{i}"]
        acaps = caps[li][0] if caps else None
        mcaps = caps[li][1] if caps else None
        img = tokens[:, s:-1]
        gp = lp["residual_gate"]["projection"]
        logits_g = img.astype(jnp.float32) @ gp["kernel"].astype(jnp.float32) \
            + gp["bias"].astype(jnp.float32)
        sig = jax.nn.sigmoid(logits_g / gate_temp + gate_bias)
        if budget_token == "learnable":
            bg = lp["budget_token_gate"]
            thr = jax.nn.sigmoid(
                tokens[:, -1:].astype(jnp.float32) @ bg["kernel"].astype(
                    jnp.float32) + bg["bias"].astype(jnp.float32))
            mask = jax.nn.relu(sig - thr)
        else:
            cur_b = jnp.mean(tokens[:, -1:].astype(jnp.float32))
            if pmean_axis is not None:  # WHOLE-batch mean spans the mesh
                cur_b = jax.lax.pmean(cur_b, pmean_axis)
            mask = jax.nn.relu(sig - (1.0 - cur_b))
        mask = mask.astype(compute_dtype)

        ones = jnp.ones((b, 1, 1), compute_dtype)
        fwd_mask = jnp.concatenate(
            [jnp.ones((b, s, 1), compute_dtype), mask, ones], axis=1)
        tokens = jnp.concatenate(
            [tokens[:, :s], mask * img, tokens[:, -1:]], axis=1)

        if fuse_layer:
            tokens = quant_masked_layer_block(
                tokens, fwd_mask,
                cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                lp["wqkv_q"], lp["sqkv"], cast(lp["bqkv"]),
                lp["wo_q"], lp["so"], cast(lp["bo"]),
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                lp["w1_q"], lp["s1"], cast(lp["b1"]),
                lp["w2_q"], lp["s2"], cast(lp["b2"]),
                num_heads, 1e-6, interpret, 1,
                caps[li] if caps else None,
            )
            if early_exits:
                ln_p = enc[f"early_exit_heads_{i}_ln"]
                hd_p = enc[f"early_exit_heads_{i}_head"]
                cls_i = _layer_norm(tokens[:, :c], cast(ln_p["scale"]),
                                    cast(ln_p["bias"]), 1e-5)[:, 0]
                exits.append((cls_i @ cast(hd_p["kernel"])
                              + cast(hd_p["bias"])).astype(jnp.float32))
            continue
        if fuse_attn:
            tokens = quant_masked_attention_block(
                tokens, fwd_mask,
                cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
                lp["wqkv_q"], lp["sqkv"], cast(lp["bqkv"]),
                lp["wo_q"], lp["so"], cast(lp["bo"]),
                num_heads, 1e-6, interpret, 2, acaps,
            )
        else:
            tokens = quant_attention_block_xla(
                tokens, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["wqkv_q"], lp["sqkv"], lp["bqkv"],
                lp["wo_q"], lp["so"], lp["bo"], num_heads, 1e-6,
                mask=fwd_mask, caps=acaps,
            )
        if fuse_mlp:
            tokens = quant_masked_mlp_block(
                tokens, fwd_mask,
                cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
                lp["w1_q"], lp["s1"], cast(lp["b1"]),
                lp["w2_q"], lp["s2"], cast(lp["b2"]),
                1e-6, interpret, 2, mcaps,
            )
        else:
            tokens = quant_mlp_block_xla(
                tokens, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                lp["w1_q"], lp["s1"], lp["b1"],
                lp["w2_q"], lp["s2"], lp["b2"], 1e-6, mask=fwd_mask,
                caps=mcaps,
            )
        if early_exits:
            # per-layer LN -> Dense exit heads on the class tokens (fp —
            # tiny next to the blocks; eeresidualvit.py:75-76 semantics)
            ln_p = enc[f"early_exit_heads_{i}_ln"]
            hd_p = enc[f"early_exit_heads_{i}_head"]
            cls_i = _layer_norm(tokens[:, :c], cast(ln_p["scale"]),
                                cast(ln_p["bias"]), 1e-5)[:, 0]
            exits.append((cls_i @ cast(hd_p["kernel"])
                          + cast(hd_p["bias"])).astype(jnp.float32))

    final = _classify(qparams, tokens, c, cast, ln_eps=1e-5)
    if early_exits:
        return tuple(exits) + (final,)
    return final


def residualvit_forward_fused(params, images, budget, *, patch_size: int,
                              num_heads: int, num_class_tokens: int = 1,
                              num_registers: int = 0, gate_temp: float = 1.0,
                              gate_bias: float = 0.0,
                              budget_token: Any = "learnable",
                              compute_dtype=jnp.bfloat16,
                              interpret: bool = False,
                              pmean_axis: Optional[str] = None,
                              early_exits: bool = False,
                              recon: bool = False,
                              decoder_num_heads: Optional[int] = None,
                              compact_caps: Optional[tuple] = None,
                              noise_layer: Optional[int] = None,
                              noise_type: str = "gaussian", noise_value=None,
                              noise_rng=None):
    """Fused ResidualViT eval forward (sigmoid gates, 'attention+mlp' skip —
    the mode every shipped config uses, SURVEY.md §7.6).

    Also serves the EE variant: with ``early_exits=True`` the param tree's
    per-layer LN->Dense exit heads (eeresidualvit.py:75-76 semantics) run
    on the class tokens after every layer and the return value is the
    linen-shaped tuple ``(exit_0, ..., exit_{L-1}, final)``.

    And the EncDec variant: with ``recon=True`` the ViT decoder
    (models/vitdecoder.py; reference encdecresidualvit.py:329-339) runs on
    the post-final-LN image tokens with the LAST block's gate mask —
    mask-token substitution via ``sigmoid(mask*100)``, decoder pos-emb,
    plain blocks on the fused stack, channel-major unpatchify — and the
    return value is the linen-shaped ``(logits, recon NHWC, mask_img)``.

    ``budget`` is a traced scalar: the whole sweep shares one compilation.
    Per block: gate in XLA (a Dense(1) on img tokens + budget/threshold
    shift, reference residualvit.py:58-69,210-213), then the masked fused
    kernels apply the mask*LN trick (:249-260) with gated tokens staying
    exactly zero. Block LN eps is 1e-6 (§7.12); the final encoder LN is
    the default 1e-5.

    ``compact_caps`` (VERDICT r4 #1 — TOKEN COMPACTION, the opt-in mode
    that turns gate sparsity into wall-clock): a per-layer tuple of
    STATIC image-token capacities. After each gate, the top ``cap`` image
    tokens BY GATE VALUE are physically gathered (jax.lax.top_k on the
    fp32 mask, reference-stable tie-break) and the buffer shrinks to
    ``s + cap + 1`` — every later matmul runs on the compacted width.
    Slots beyond the survivor count carry mask 0, exactly how the
    reference treats gated-off tokens (mask*LN zeroes their qkv input,
    so their attention keys/values are the pure BIAS terms — identical
    across every gated-off token; residualvit.py:249-260). The buffer
    also carries one PHANTOM zero slot whose exp term the masked kernels
    weight by the dropped count (``_attn_scores_pv(kweight=)``): count x
    one-identical-term reproduces the (N - cap) dropped tokens'
    attention contribution EXACTLY. Remaining divergences vs the exact
    masked path: (a) positive-gate tokens beyond the capacity are
    dropped (lowest-gate first, an overflow the parity bench measures),
    and (b) a dropped token that would RE-ENTER at a later layer (gate
    re-opens on its frozen private value) re-enters here with the
    phantom's generic zero-token state instead. Approximate serving
    mode, int8-style: agreement rates are measured per budget in
    benchmarks/parity_agreement.json. ``budget`` stays traced (capacity
    is the static knob). Incompatible with ``recon`` (compaction loses
    token positions the decoder needs) and engine noise (layout changes
    under the NoiseBlock) — the engine guards both.
    """
    from peekvit_tpu.ops.pallas.fused_attention import (
        masked_attention_block,
        masked_layer_block,
        masked_mlp_block,
    )

    cast = lambda t: t.astype(compute_dtype)  # noqa: E731
    c = num_class_tokens
    tokens, d = _embed(params, images, patch_size, c, num_registers, cast)
    b = tokens.shape[0]

    enc = params["encoder"]
    tokens = tokens + cast(enc["pos_embedding"])  # budget token excluded

    budget_vec = jnp.broadcast_to(
        jnp.asarray(budget, jnp.float32), (b,))[:, None, None]
    bcast = budget_vec.astype(compute_dtype)
    if budget_token == "learnable":
        btok = cast(params["learnable_budget_token_1"]) * bcast
    elif budget_token == "learnable_interpolate":
        # two lerped embeddings (reference residualvit.py:552-585)
        btok = (cast(params["learnable_budget_token_1"]) * bcast
                + cast(params["learnable_budget_token_2"]) * (1.0 - bcast))
    elif budget_token:
        btok = jnp.broadcast_to(bcast, (b, 1, d))
    else:
        raise NotImplementedError("fused residualvit engine needs a budget token")
    btok = jnp.broadcast_to(btok, (b, 1, d))
    s = c + num_registers  # special tokens at the front
    n_img_orig = tokens.shape[1] - s
    # compaction carries one PHANTOM zero slot between the image tokens
    # and the budget token: its key-exp term is weighted by the dropped
    # count in the masked kernels, standing in exactly for the removed
    # gated-off tokens' (identical) bias keys/values
    phantom = (compact_caps is not None
               and min(int(cc) for cc in compact_caps) < n_img_orig)
    tail = 2 if phantom else 1
    if phantom:
        tokens = jnp.concatenate(
            [tokens, jnp.zeros((b, 1, d), tokens.dtype), btok], axis=1)
    else:
        tokens = jnp.concatenate([tokens, btok], axis=1)
    exits = []
    last_mask = None

    for i in _layer_ids(enc):
        tokens = _inject_noise(tokens, i, noise_layer, noise_type,
                               noise_value, noise_rng)
        lp = enc[f"layers_{i}"]
        # ---- gate (XLA: Dense(1) + shift; reference :58-69,154-165)
        img = tokens[:, s:-tail]
        gp = lp["residual_gate"]["projection"]
        logits = img.astype(jnp.float32) @ gp["kernel"].astype(jnp.float32) \
            + gp["bias"].astype(jnp.float32)
        sig = jax.nn.sigmoid(logits / gate_temp + gate_bias)
        if budget_token == "learnable":
            bg = lp["budget_token_gate"]
            thr = jax.nn.sigmoid(
                tokens[:, -1:].astype(jnp.float32) @ bg["kernel"].astype(
                    jnp.float32) + bg["bias"].astype(jnp.float32))
            mask = jax.nn.relu(sig - thr)
        else:
            # scalar mean over the WHOLE batch's (evolving) budget token —
            # reference quirk (residualvit.py:208), kept for parity
            cur_b = jnp.mean(tokens[:, -1:].astype(jnp.float32))
            if pmean_axis is not None:  # WHOLE batch = across the dp mesh
                cur_b = jax.lax.pmean(cur_b, pmean_axis)
            mask = jax.nn.relu(sig - (1.0 - cur_b))
        if compact_caps is not None:
            cap = int(compact_caps[_layer_ids(enc).index(i)])
            if cap < img.shape[1]:
                # physical compaction: keep the top-cap tokens by gate
                # value (ties by lowest index — lax.top_k is stable, same
                # tie-break as the rank engines); surplus slots arrive
                # with mask 0 and become zero-value bias-key tokens below,
                # the reference's own gated-off representation
                scores = mask[..., 0]  # fp32 (B, n_img)
                _, idx = jax.lax.top_k(scores, cap)
                img = jnp.take_along_axis(img, idx[..., None], axis=1)
                mask = jnp.take_along_axis(mask, idx[..., None], axis=1)
        last_mask = mask  # fp32 (B, N_img, 1): what linen's aux stores
        mask = mask.astype(compute_dtype)  # (B, N_img, 1)

        ones = jnp.ones((b, 1, 1), compute_dtype)
        if phantom:
            # phantom slot: mask 0 (a gated-off token), value carried
            fwd_mask = jnp.concatenate(
                [jnp.ones((b, s, 1), compute_dtype), mask,
                 jnp.zeros((b, 1, 1), compute_dtype), ones], axis=1)
            tokens = jnp.concatenate(
                [tokens[:, :s], mask * img, tokens[:, -2:]], axis=1)
            ph_mult = float(n_img_orig - img.shape[1])
            ph_idx = s + img.shape[1]
        else:
            fwd_mask = jnp.concatenate(
                [jnp.ones((b, s, 1), compute_dtype), mask, ones], axis=1)
            tokens = jnp.concatenate(
                [tokens[:, :s], mask * img, tokens[:, -1:]], axis=1)
            ph_mult, ph_idx = 0.0, -1

        at = lp["self_attention"]
        wargs = (
            cast(lp["ln_1"]["scale"]), cast(lp["ln_1"]["bias"]),
            cast(at["in_proj_kernel"]), cast(at["in_proj_bias"]),
            cast(at["out_proj_kernel"]), cast(at["out_proj_bias"]),
            cast(lp["ln_2"]["scale"]), cast(lp["ln_2"]["bias"]),
            cast(lp["mlp"]["fc1_kernel"]), cast(lp["mlp"]["fc1_bias"]),
            cast(lp["mlp"]["fc2_kernel"]), cast(lp["mlp"]["fc2_bias"]),
        )
        if compact_caps is None or tokens.shape[1] >= _MERGED_MIN_TOKENS:
            tokens = masked_layer_block(
                tokens, fwd_mask, *wargs, num_heads, 1e-6, interpret,
                1, ph_mult, ph_idx)
        else:
            # few tokens after compaction: the split masked kernels
            # amortize weight DMA better (same threshold as the rank
            # engines' merged/split choice; measured at the 107-token
            # compact@0.5 buffer: split 7,536 vs merged 7,398 img/s —
            # the dense path keeps the merged kernel unconditionally,
            # its numerics being the pinned parity reference). mi=1: at
            # the compacted buffer's odd token counts Mosaic cannot
            # lower the (mi, n, 1) -> (mi*n, 1) mask fold for mi > 1
            # ("unsupported shape cast")
            tokens = masked_attention_block(
                tokens, fwd_mask, *wargs[:6], num_heads, 1e-6, interpret,
                1, ph_mult, ph_idx)
            tokens = masked_mlp_block(
                tokens, fwd_mask, *wargs[6:], 1e-6, interpret, 1)
        if early_exits:
            ln_p = enc[f"early_exit_heads_{i}_ln"]
            hd_p = enc[f"early_exit_heads_{i}_head"]
            cls = _layer_norm(tokens[:, :c], cast(ln_p["scale"]),
                              cast(ln_p["bias"]), 1e-5)[:, 0]
            exits.append((cls @ cast(hd_p["kernel"])
                          + cast(hd_p["bias"])).astype(jnp.float32))

    if recon:
        # final LN over ALL tokens (the linen encoder's trailing LN,
        # residualvit.py model :321): it feeds both the head and the
        # decoder's image-token slice
        tokens = _layer_norm(tokens, cast(enc["ln"]["scale"]),
                             cast(enc["ln"]["bias"]), 1e-5)
        cls = jnp.sum(tokens[:, :c], axis=1)
        final = (cls @ cast(params["head"]["kernel"])
                 + cast(params["head"]["bias"])).astype(jnp.float32)
        dp = params["decoder"]
        img_tokens = tokens[:, s:-1]  # strip specials + budget token
        m = jax.nn.sigmoid(last_mask * 100.0).astype(compute_dtype)
        dec = (img_tokens * m
               + cast(dp["mask_token"]) * (1.0 - m)
               + cast(dp["pos_embedding"]))
        dh = num_heads if decoder_num_heads is None else decoder_num_heads
        dec = _encoder_stack(dp["encoder"], dec, dh, 1e-5, cast, interpret)
        dec = _layer_norm(dec, cast(dp["encoder"]["ln"]["scale"]),
                          cast(dp["encoder"]["ln"]["bias"]), 1e-5)
        rec = (dec @ cast(dp["head"]["kernel"]) + cast(dp["head"]["bias"]))
        rec = _unpatchify_cmajor(rec, patch_size).astype(jnp.float32)
        # mask upscaled to image resolution (1 channel, viz artifact)
        p = patch_size
        n_img = m.shape[1]
        h = int(round(n_img ** 0.5))
        mp = jnp.broadcast_to(m.astype(jnp.float32), (b, n_img, p * p))
        mask_img = mp.reshape(b, h, h, p, p).transpose(0, 1, 3, 2, 4)
        mask_img = mask_img.reshape(b, h * p, h * p)[..., None]
        return final, rec, mask_img

    final = _classify(params, tokens, c, cast, ln_eps=1e-5)
    if early_exits:
        return tuple(exits) + (final,)
    return final


class InferenceEngine:
    """Jitted fused eval forward bound to a built Model (plain ViT family).

    RankViT compilation modes:
    - default: EXACT physical drop — shapes shrink to ceil(n*budget) per
      ranked layer, one compiled fn per distinct budget value (SURVEY §8
      allows per-budget compiles for eval sweeps; fastest per budget).
    - ``max_budget=<float>``: SINGLE-COMPILE padded drop — static keep
      lengths sized for ``max_budget``, budget a traced operand; any budget
      in (0, max_budget] reuses one compilation (the §8 north-star design;
      the right mode for serving with a varying budget knob).
    """

    @staticmethod
    def _is_residual_module(module) -> bool:
        return type(module).__name__ in (
            "ResidualVisionTransformer",
            "EEResidualVisionTransformer",
            "ResidualVisionTransformerWithDecoder",
        )

    def _compact_caps_for(self, capacity):
        """Per-layer static image-token capacities for ``compact`` mode:
        ceil(capacity * N) rounded UP to a sublane multiple of 8 (free
        slack — the masked kernels tile rows in groups of 8 anyway),
        clamped to N. ``capacity`` is one float for every layer (the
        reference's gates are independent per layer — no rank cascade —
        so a single capacity bounds each layer's survivors) or a
        per-layer SCHEDULE (sequence of fractions, e.g. decreasing with
        depth the way trained gates sparsify; a layer whose capacity
        exceeds the current compacted width is simply a no-op — the
        buffer never grows back). Returns None when every capacity
        covers every token — the engine then runs the EXACT dense masked
        path (bitwise with ``compact=None``)."""
        module = self._module
        n_img = (module.image_size // module.patch_size) ** 2

        def one(c):
            return min(n_img,
                       max(8, -8 * (-int(np.ceil(float(c) * n_img)) // 8)))

        if isinstance(capacity, (tuple, list)):
            if len(capacity) != module.num_layers:
                raise ValueError(
                    f"compact= schedule has {len(capacity)} entries for a "
                    f"{module.num_layers}-layer model")
            caps = tuple(one(c) for c in capacity)
            if all(c >= n_img for c in caps):
                return None
            return caps
        cap = one(capacity)
        if cap >= n_img:
            return None
        return (cap,) * module.num_layers

    def _compact_fn_for(self, b: float):
        """Compact-auto mode: one compiled fn per budget, capacity
        min(1, budget + slack) (lazy; shared by __call__ and the bundle
        exporter)."""
        if b not in self._compact_fns:
            caps = self._compact_caps_for(min(1.0, b + self._compact_slack))
            self._compact_fns[b] = self._jit_noise(
                functools.partial(residualvit_forward_fused,
                                  compact_caps=caps,
                                  **self._compact_common),
                n_scalar_args=1)
        return self._compact_fns[b]

    def _jit(self, raw, n_scalar_args: int = 0):
        """jit the raw forward; with ``mesh``, shard-map it data-parallel.

        Pallas calls are not GSPMD-partitionable, so multi-chip serving maps
        the kernel over the mesh's data axis explicitly (shard_map): params
        replicated, batch split, any trailing scalar operands replicated.
        Batch size must divide the data-axis size.
        """
        if self._mesh is None:
            return jax.jit(raw)
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from peekvit_tpu.parallel.mesh import DATA_AXIS

        in_specs = (P(), P(DATA_AXIS)) + (P(),) * n_scalar_args
        return jax.jit(shard_map(
            raw, mesh=self._mesh, in_specs=in_specs,
            out_specs=P(DATA_AXIS), check_rep=False,
        ))

    def _jit_noise(self, fwd, n_scalar_args: int = 0):
        """Like _jit, but when the model carries a NoiseBlock
        (module.noise_layer) the compiled fn takes two extra trailing
        operands (noise_value, noise_rng) and injects the noise before
        layer ``noise_layer`` exactly like the linen encoder (VERDICT r3
        #5: noise sweeps stay on the engine path)."""
        if self._noise is None:
            return self._jit(fwd, n_scalar_args)
        nl, nt = self._noise
        base = functools.partial(fwd, noise_layer=nl, noise_type=nt)

        def with_noise(params, images, *rest):
            scalars, nv, nr = rest[:-2], rest[-2], rest[-1]
            return base(params, images, *scalars, noise_value=nv,
                        noise_rng=nr)

        return self._jit(with_noise, n_scalar_args + 2)

    def __init__(self, model, compute_dtype=jnp.bfloat16,
                 interpret: Optional[bool] = None, quantized: bool = False,
                 max_budget: Optional[float] = None,
                 calib_images=None, calib_percentile: float = 99.9,
                 calib_static_caps: bool = False,
                 mesh=None, ee_outputs: bool = False,
                 recon_outputs: bool = False,
                 compact: Any = None, compact_slack: float = 0.0,
                 routed: Any = None, routed_min_experts: int = 3):
        module = model.module
        self._module = module
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self._routed = 2.0 if routed is True else (
            float(routed) if routed is not None else None)
        if routed is not None:
            if type(module).__name__ != "VisionTransformerMoE":
                raise NotImplementedError(
                    "routed= (top-1 capacity dispatch) applies to "
                    "VisionTransformerMoE engines only")
            if quantized:
                raise NotImplementedError(
                    "routed= is bf16-only: the int8 MoE engine quantizes "
                    "per expert stack and has no routed dispatch variant "
                    "(serve dense int8 or routed bf16)")
            if self._routed <= 0:
                raise ValueError("routed= capacity factor must be > 0")
        self._compact = compact
        self._compact_auto = compact is True
        self._compact_slack = float(compact_slack)
        if compact is not None:
            if not self._is_residual_module(module):
                raise NotImplementedError(
                    "compact= (token-compaction serving) applies to the "
                    "ResidualViT family — other families either have no "
                    "gates or already drop physically (RankViT)")
            if quantized or recon_outputs or mesh is not None and \
                    mesh.shape.get("model", 1) > 1:
                raise NotImplementedError(
                    "compact= is a bf16 single-program mode: int8 would "
                    "redefine the calibrated grid per capacity, the recon "
                    "decoder needs token positions compaction discards, "
                    "and the TP partial kernels have no compacted "
                    "variants (serve those dense or data-parallel)")
            if getattr(module, "noise_layer", None) is not None:
                raise NotImplementedError(
                    "compact= changes the token layout under the "
                    "NoiseBlock; run noise sweeps on the exact masked "
                    "engine")
        self._noise = None
        if getattr(module, "noise_layer", None) is not None:
            self._noise = (int(module.noise_layer),
                           getattr(module, "noise_type", "gaussian"))
        if ee_outputs and type(module).__name__ != \
                "EEResidualVisionTransformer":
            raise NotImplementedError(
                "ee_outputs=True needs an EEResidualVisionTransformer")
        if recon_outputs and type(module).__name__ not in (
                "MAEVisionTransformer",
                "ResidualVisionTransformerWithDecoder"):
            raise NotImplementedError(
                "recon_outputs=True needs a model with a reconstruction "
                "decoder (MAE or EncDec-Residual)")
        if (quantized and max_budget is not None
                and not getattr(module, "rankvit_layers", None)):
            raise ValueError(
                "max_budget= (single-compile padded drop) with "
                "quantized=True applies to RankViT models only")
        self._mesh = mesh
        self._rank_layers = tuple(getattr(module, "rankvit_layers", ()) or ())
        if (self._noise is not None and self._rank_layers
                and self._noise[0] > min(self._rank_layers)):
            raise NotImplementedError(
                "engine noise must precede the first ranked layer (the "
                "physical drop changes the token layout the NoiseBlock "
                "samples over); use the linen path for a later noise_layer")
        self._residual = self._is_residual_module(module)
        # Every budget-token mode except 'learnable' derives the gate
        # threshold from a WHOLE-BATCH mean of the (image-mixed) budget
        # token, so outputs for one image depend on its batchmates —
        # serving layers must not zero-pad such batches (serving.py
        # refuses; the dp mesh path pmean's instead).
        self._batch_coupled = bool(
            self._residual
            and getattr(module, "add_budget_token", False)
            not in (False, None, "learnable"))
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # TENSOR-PARALLEL serving (parallel/tp_serving.py): a mesh
            # with a model axis > 1 splits one forward's compute across
            # chips (head-sharded attention + Megatron MLP partial
            # kernels, one psum per sublayer) — the latency analogue of
            # the data-parallel throughput path below. Composes with dp:
            # the data axis still shards the batch.
            if ((type(module).__name__ not in ("VisionTransformer",
                                               "RankVisionTransformer")
                 and not self._residual)
                    or quantized or max_budget is not None
                    or self._noise is not None or recon_outputs):
                raise NotImplementedError(
                    "tensor-parallel serving (mesh model axis > 1) covers "
                    "the bf16 plain/Rank VisionTransformer and ResidualViT-"
                    "family engines; serve other families / modes "
                    "data-parallel (make_mesh(n_model=1))")
            from peekvit_tpu.parallel.tp_serving import tp_serving_engine

            self.params, make_fn = tp_serving_engine(
                model, mesh, compute_dtype=compute_dtype,
                interpret=interpret, ee_outputs=bool(ee_outputs))
            self._fn = make_fn(None)
            if self._rank_layers:
                # exact physical drop over the TP schedule: one compiled
                # fn per budget (built lazily in __call__)
                self._rank_fns = {}
                self._rank_builder = make_fn
            return
        if type(module).__name__ == "AdaptiveVisionTransformer":
            if quantized or max_budget is not None:
                raise NotImplementedError(
                    "the A-ViT engine is bf16-only by design: int8 would "
                    "quantize the halting-score inputs feeding the hard "
                    "ACT threshold c > 1-eps (token depths flip vs linen), "
                    "and the merged avit-mode masked kernels have no quant "
                    "variants (COMPONENTS.md)")
            if self._noise is not None:
                raise NotImplementedError(
                    "A-ViT applies noise inside the scanned ACT step with a "
                    "per-step make_rng split; use the linen path for A-ViT "
                    "noise sweeps")
            self.params = prepare_engine_params(model.params, compute_dtype)
            self._fn = self._jit(functools.partial(
                adavit_forward_fused,
                patch_size=module.patch_size,
                num_heads=module.num_heads,
                num_layers=module.num_layers,
                num_class_tokens=getattr(module, "num_class_tokens", 1),
                num_registers=getattr(module, "num_registers", 0),
                act_eps=module.eps,
                gate_scale=module.gate_scale,
                gate_center=module.gate_center,
                compute_dtype=compute_dtype,
                interpret=interpret,
            ))
            return
        if type(module).__name__ == "MAEVisionTransformer":
            # MAE shuffles tokens only in TRAINING (reference
            # maevit.py:221): the eval engine runs the full sequence, so
            # encoder AND decoder_blocks ride the merged kernels /
            # one-dispatch path. Default output = logits (like EncDec);
            # recon_outputs=True serves the (logits, reconstruction)
            # tuple of the model's logits_recon contract.
            if quantized or max_budget is not None:
                raise NotImplementedError(
                    "the MAE engine is bf16 eval only (no quantized / "
                    "max_budget modes; the model takes no budget)")
            self.params = prepare_engine_params(model.params, compute_dtype,
                                                fold_ln=True)
            self._fn = self._jit(functools.partial(
                maevit_forward_fused,
                patch_size=module.patch_size,
                num_heads=module.num_heads,
                num_decoder_heads=module.num_decoder_heads,
                num_class_tokens=getattr(module, "num_class_tokens", 1),
                num_registers=getattr(module, "num_registers", 0),
                compute_dtype=compute_dtype,
                interpret=interpret,
                recon=bool(recon_outputs),
            ))
            return
        if type(module).__name__ in ("PointCloudTransformer",
                                     "RankPointCloudTransformer"):
            # PCT blocks are structurally ViT blocks: the merged folded
            # kernels / one-dispatch encoder apply as-is; the gather-free
            # ARPE kernel replaces the top_k + neighbor-gather front end
            # (ops/pallas/pct_embed.py) and the BN classifier head runs
            # XLA in running-stats mode. RankPCT serves with PHYSICAL
            # token drop, one compiled fn per budget (rankpct_forward_
            # fused; ranking flags are read at engine build — call
            # enable_ranking() before constructing the engine).
            if quantized or max_budget is not None or self._noise is not None:
                raise NotImplementedError(
                    "the PCT engine is bf16 eval only (no quantized / "
                    "max_budget / noise modes)")
            if getattr(module, "num_registers", 0):
                raise NotImplementedError(
                    "PCT engine: num_registers > 0 not supported (the "
                    "reference PCT config never sets it)")
            bstats = (model.state or {}).get("batch_stats")
            if bstats is None:
                raise NotImplementedError(
                    "PCT engine needs the model's batch_stats collection")
            self.params = prepare_pct_engine_params(
                model.params, bstats, compute_dtype)
            common = dict(
                num_heads=module.num_heads,
                num_points=module.num_points,
                compute_dtype=compute_dtype,
                interpret=interpret,
            )
            if type(module).__name__ == "RankPointCloudTransformer":
                ranking = tuple(module.ranking_enabled
                                or (False,) * module.num_layers)
                self._rank_layers = tuple(
                    i for i, r in enumerate(ranking) if r)
                self._rank_common = dict(common, ranking=ranking)
                self._rank_fwd = rankpct_forward_fused
                self._rank_fns = {}
                # no-budget path: ranking blocks never fire (linen ditto)
                self._fn = self._jit(functools.partial(
                    rankpct_forward_fused, budget=None, ranking=ranking,
                    **common))
                return
            self._fn = self._jit(functools.partial(
                pct_forward_fused, **common))
            return
        if type(module).__name__ == "VisionTransformerMoE":
            if max_budget is not None:
                raise NotImplementedError(
                    "max_budget= (padded rank drop) does not apply to MoE")
            if quantized:
                self.params = prepare_engine_params(
                    quantize_moevit_params(model.params), compute_dtype)
                self._fn = self._jit_noise(functools.partial(
                    moevit_forward_quant,
                    patch_size=module.patch_size,
                    num_heads=module.num_heads,
                    mlp_moes=(tuple(module.mlp_moes)
                              if module.mlp_moes else None),
                    attn_moes=(tuple(module.attn_moes)
                               if module.attn_moes else None),
                    num_layers=module.num_layers,
                    compute_dtype=compute_dtype,
                    interpret=interpret,
                ))
                return
            self.params = prepare_engine_params(model.params, compute_dtype,
                                                fold_ln=True)
            self._fn = self._jit_noise(functools.partial(
                moevit_forward_fused,
                patch_size=module.patch_size,
                num_heads=module.num_heads,
                mlp_moes=tuple(module.mlp_moes) if module.mlp_moes else None,
                attn_moes=(tuple(module.attn_moes)
                           if module.attn_moes else None),
                num_layers=module.num_layers,
                compute_dtype=compute_dtype,
                interpret=interpret,
                routed_capacity=self._routed,
                routed_min_experts=int(routed_min_experts),
            ))
            return
        if self._residual:
            layers = module.residual_layers or ["attention+mlp"] * module.num_layers
            if (set(layers) != {"attention+mlp"}
                    or module.gate_type != "sigmoid"
                    or module.add_input
                    or not module.add_budget_token):
                raise NotImplementedError(
                    "fused ResidualViT engine supports the shipped-config "
                    "mode: sigmoid gates, attention+mlp skip, budget token, "
                    "add_input=False (SURVEY.md §7.6)")
            # EE variant: classification serves the FINAL logits; pass
            # ee_outputs=True for the linen-shaped (exits..., final) tuple.
            # EncDec variant: classification logits by default; pass
            # recon_outputs=True for the linen-shaped (logits, recon,
            # mask_img) tuple with the decoder on the fused stack.
            is_ee = type(module).__name__ == "EEResidualVisionTransformer"
            if ee_outputs and not is_ee:
                raise NotImplementedError(
                    "ee_outputs=True needs an EEResidualVisionTransformer")
            if recon_outputs and quantized:
                raise NotImplementedError(
                    "recon_outputs=True is bf16-only: the int8 residual "
                    "path has no quantized decoder blocks")
            common = dict(
                patch_size=module.patch_size,
                num_heads=module.num_heads,
                num_class_tokens=getattr(module, "num_class_tokens", 1),
                num_registers=getattr(module, "num_registers", 0),
                gate_temp=module.gate_temp,
                gate_bias=module.gate_bias,
                budget_token=module.add_budget_token,
                compute_dtype=compute_dtype,
                interpret=interpret,
            )
            if mesh is not None and module.add_budget_token not in (
                    "learnable",):
                # the reference's WHOLE-batch budget-token mean must span
                # the data axis, not each shard
                from peekvit_tpu.parallel.mesh import DATA_AXIS

                common["pmean_axis"] = DATA_AXIS
            if quantized:
                # calibration = SmoothQuant per-channel equalization baked
                # into the (fp) weights, dynamic per-row scales by default;
                # static percentile caps only on request (measured: caps
                # from a small calib set clip unseen activations and lose
                # to dynamic scales once smoothing has tamed the outliers)
                caps = None
                qsource = model.params
                if calib_images is not None:
                    stats_caps, smoothing = (
                        collect_residualvit_activation_stats(
                            model.params, jnp.asarray(calib_images),
                            percentile=calib_percentile,
                            **{k: common[k] for k in (
                                "patch_size", "num_heads",
                                "num_class_tokens", "num_registers",
                                "gate_temp", "gate_bias", "budget_token")}))
                    qsource = smooth_vit_params(model.params, smoothing)
                    if calib_static_caps:
                        caps, _ = collect_residualvit_activation_stats(
                            qsource, jnp.asarray(calib_images),
                            percentile=calib_percentile,
                            **{k: common[k] for k in (
                                "patch_size", "num_heads",
                                "num_class_tokens", "num_registers",
                                "gate_temp", "gate_bias", "budget_token")})
                self.params = prepare_engine_params(
                    quantize_residualvit_params(qsource), compute_dtype)
                self._fn = self._jit_noise(functools.partial(
                    residualvit_forward_quant, caps=caps,
                    early_exits=bool(ee_outputs), **common),
                    n_scalar_args=1)
            else:
                if recon_outputs:
                    common["recon"] = True
                    common["decoder_num_heads"] = (
                        getattr(module, "decoder_num_heads", None)
                        or module.num_heads)
                self.params = prepare_engine_params(model.params,
                                                    compute_dtype)
                if self._compact_auto:
                    # per-budget capacity min(1, budget + slack): one
                    # compiled fn per distinct budget (like the rank
                    # exact-drop mode), built lazily in __call__
                    self._compact_common = dict(
                        common, early_exits=bool(ee_outputs))
                    self._compact_fns = {}
                    self._fn = None
                    return
                if compact is not None:
                    common["compact_caps"] = self._compact_caps_for(compact)
                self._fn = self._jit_noise(functools.partial(
                    residualvit_forward_fused,
                    early_exits=bool(ee_outputs), **common), n_scalar_args=1)
            return
        if quantized:
            # optional calibration (ViT and RankViT engines): SmoothQuant
            # per-channel equalization baked into the weights (exact in
            # fp), then static percentile activation caps on the SMOOTHED
            # model — the pair that survives pretrained outlier channels
            # (tests/test_full_scale.py realistic fixture)
            caps = None
            qsource = model.params
            if calib_images is not None:
                geom = dict(
                    patch_size=module.patch_size,
                    num_heads=module.num_heads,
                    num_class_tokens=getattr(module, "num_class_tokens", 1),
                    num_registers=getattr(module, "num_registers", 0),
                    ln_eps=getattr(module, "ln_eps", 1e-5),
                )
                smoothing = compute_smoothing_vectors(
                    model.params, jnp.asarray(calib_images), **geom)
                qsource = smooth_vit_params(model.params, smoothing)
                if calib_static_caps:
                    # static caps skip the per-row absmax pass but clip
                    # activations the calib set never saw — opt-in only
                    caps = collect_activation_caps(
                        qsource, jnp.asarray(calib_images),
                        percentile=calib_percentile, **geom)
            self.params = prepare_engine_params(
                quantize_vit_params(qsource), compute_dtype, fold_ln=True)
            if self._rank_layers:
                # int8 + physical token drop: one jitted fn per budget
                # (caps calibrated at full token count; a high percentile
                # transfers across budgets since dropping only removes
                # low-norm tokens)
                self._rank_common = dict(
                    patch_size=module.patch_size,
                    num_heads=module.num_heads,
                    rankvit_layers=self._rank_layers,
                    num_class_tokens=getattr(module, "num_class_tokens", 1),
                    ln_eps=getattr(module, "ln_eps", 1e-5),
                    compute_dtype=compute_dtype,
                    interpret=interpret,
                    caps=caps,
                )
                self._rank_fns = {}
                self._rank_fwd = rankvit_forward_quant
                self._fn = None
                if max_budget is not None:
                    # single-compile padded drop, int8: budget is traced
                    self._rank_max_budget = float(max_budget)
                    self._fn = self._jit_noise(functools.partial(
                        rankvit_forward_padded_quant,
                        max_budget=float(max_budget), **self._rank_common,
                    ), n_scalar_args=1)
                return
            self._fn = self._jit_noise(functools.partial(
                vit_forward_quant,
                patch_size=module.patch_size,
                num_heads=module.num_heads,
                num_class_tokens=getattr(module, "num_class_tokens", 1),
                num_registers=getattr(module, "num_registers", 0),
                ln_eps=getattr(module, "ln_eps", 1e-5),
                compute_dtype=compute_dtype,
                interpret=interpret,
                caps=caps,
            ))
            return
        common = dict(
            patch_size=module.patch_size,
            num_heads=module.num_heads,
            num_class_tokens=getattr(module, "num_class_tokens", 1),
            ln_eps=getattr(module, "ln_eps", 1e-5),
            compute_dtype=compute_dtype,
            interpret=interpret,
        )
        if self._rank_layers:
            self._rank_common = dict(common, rankvit_layers=self._rank_layers)
            self._rank_fns = {}  # budget -> jitted fn (static shapes)
            self._fn = None
            if max_budget is not None:
                # single-compile padded drop: budget is a traced operand
                self._rank_max_budget = float(max_budget)
                self._fn = self._jit_noise(functools.partial(
                    rankvit_forward_padded, max_budget=float(max_budget),
                    **self._rank_common,
                ), n_scalar_args=1)
        else:
            self._fn = self._jit_noise(functools.partial(
                vit_forward_fused,
                num_registers=getattr(module, "num_registers", 0),
                **common,
            ))
        self.params = prepare_engine_params(model.params, compute_dtype,
                                            fold_ln=True)

    def __call__(self, images, budget: Optional[float] = None,
                 noise_value=None, noise_rng=None) -> jax.Array:
        extra = ()
        if self._noise is not None:
            # defaults match the linen eval step's rngs={'noise': key(0)}
            extra = (jnp.float32(0.0 if noise_value is None
                                 else noise_value),
                     noise_rng if noise_rng is not None
                     else jax.random.key(0))
        elif noise_value is not None:
            raise ValueError(
                "engine was built without a noise layer (model.noise_args); "
                "noise_value= has no effect here")
        if self._mesh is not None:
            from peekvit_tpu.parallel.mesh import DATA_AXIS

            axis = self._mesh.shape[DATA_AXIS]
            if images.shape[0] % axis:
                raise ValueError(
                    f"batch size {images.shape[0]} must divide the mesh's "
                    f"'{DATA_AXIS}' axis size {axis} for data-parallel "
                    "serving (shard_map splits the batch evenly)")
        if getattr(self, "_residual", False):
            b = 1.0 if budget is None else budget
            if getattr(self, "_compact_auto", False):
                return self._compact_fn_for(float(b))(
                    self.params, images, jnp.float32(b), *extra)
            return self._fn(self.params, images, jnp.float32(b), *extra)
        if self._rank_layers:
            b = 1.0 if budget is None else float(budget)
            if getattr(self, "_rank_max_budget", None) is not None:
                if b > self._rank_max_budget + 1e-9:
                    raise ValueError(
                        f"budget {b} exceeds the engine's static "
                        f"max_budget {self._rank_max_budget}"
                    )
                return self._fn(self.params, images, jnp.float32(b), *extra)
            if b not in self._rank_fns:
                if getattr(self, "_rank_builder", None) is not None:
                    # TP serving: the builder returns a shard-mapped fn
                    self._rank_fns[b] = self._rank_builder(b)
                else:
                    fwd = getattr(self, "_rank_fwd", rankvit_forward_fused)
                    self._rank_fns[b] = self._jit_noise(functools.partial(
                        fwd, budget=b, **self._rank_common
                    ))
            return self._rank_fns[b](self.params, images, *extra)
        return self._fn(self.params, images, *extra)
