"""Train-step throughput A/B: linen vs split-kernel vs MERGED-layer VJP.

VERDICT r3 #6: the round-3 merged-kernel finding (the two-kernel split pays
a (B, N, D) HBM round trip per layer) applies equally to training, and the
round-1 fused train path additionally lets XLA materialize the
(B, N, mlp_dim) gelu input for the backward. This script measures, on the
real chip, the full train step (fwd + bwd + adam update) for ViT-B/16 @224:

  - linen:  Trainer's default flax path, fp32 master / fp32 compute
  - split:  training/fused.vit_forward_trainable(merged=False) — custom-VJP
            attention kernel + XLA MLP, bf16 compute (the round-1 path)
  - merged: merged=True — ops/pallas/fused_layer_vjp, ONE kernel per
            direction, weight grads accumulated in VMEM

Writes benchmarks/train_step.json. Timing uses
bench.device_train_seconds_per_step: an on-device fori_loop carrying
(params, opt_state) so every iteration is a real optimizer step on the
previous iteration's weights, with the GRAD-CONSUMING carry — without it,
XLA exploits cross-iteration scheduling freedom a host-dispatched train
loop never has and every variant reads ~8-12% slow (the round-4
methodology fix; artifact pinned by benchmarks/train_decomp.py's
scheduling_artifact_ms).
"""

from __future__ import annotations

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import device_train_seconds_per_step, peak_flops  # noqa: E402
from peekvit_tpu.models.registry import build_model  # noqa: E402
from peekvit_tpu.utils.flops_count import analytic_macs  # noqa: E402


def main(batch: int = 256, reps: int = 10, sections=("vit", "residual")):
    from peekvit_tpu.training.fused import vit_forward_trainable

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr, flush=True)
    on_tpu = jax.default_backend() == "tpu"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_step.json")

    model = build_model(
        "vit",
        dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
             hidden_dim=768, mlp_dim=3072, num_classes=1000),
    )
    tx = optax.adam(1e-3)
    params = model.params
    opt_state = tx.init(params)
    x = jax.random.normal(jax.random.key(0), (batch, 224, 224, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000)

    def update_fn(grads, o, p):
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2

    def make_vg(fwd):
        def loss_fn(pp, x_):
            logits = fwd(pp, x_)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        return jax.value_and_grad(loss_fn)

    apply_fn = model.apply_fn()

    def linen_fwd(p, x_):
        logits, _ = apply_fn(p, x_, None, None,
                             {"noise": jax.random.key(0)}, train=True)
        return logits

    fused = functools.partial(
        vit_forward_trainable, patch_size=16, num_heads=12,
        interpret=not on_tpu)

    variants = {
        "linen_fp32": make_vg(linen_fwd),
        "split_bf16": make_vg(
            functools.partial(fused, merged=False, save_qkv=False)),
        "split_saveqkv_bf16": make_vg(
            functools.partial(fused, merged=False, save_qkv=True)),
        "split_remat_bf16": make_vg(
            functools.partial(fused, merged=False, remat=True)),
        "merged_bf16": make_vg(functools.partial(fused, merged=True)),
        "hybrid_bf16": make_vg(functools.partial(fused, merged="hybrid")),
    }
    out = {"batch": batch, "model": "vit_b16_224", "step": "fwd+bwd+adam"}
    if os.path.exists(path) and sections != ("vit", "residual"):
        with open(path) as f:  # partial rerun: merge into existing
            out.update(json.load(f))
    secs = {}
    if "vit" in sections:
        for name, vg in variants.items():
            s = device_train_seconds_per_step(vg, update_fn, params,
                                              opt_state, x, reps=reps)
            secs[name] = s
            out[f"{name}_ms"] = round(s * 1e3, 3)
            out[f"{name}_img_s"] = round(batch / s, 1)
            print(f"{name}: {s * 1e3:.2f} ms/step = {batch / s:.0f} img/s",
                  file=sys.stderr, flush=True)

    # --- gated ResidualViT fine-tune step (bs 128): the masked custom-VJP
    # block, recompute-style vs save_qkv (which also kills the second
    # full-attention recompute the masked backward pays for dm)
    from peekvit_tpu.training.fused import (residualvit_forward_trainable,
                                            sample_budgets)

    rmodel = build_model("residualvit", dict(
        image_size=224, patch_size=16, num_layers=12, num_heads=12,
        hidden_dim=768, mlp_dim=3072, num_classes=1000,
        residual_layers=["attention+mlp"] * 12, gate_type="sigmoid",
        add_budget_token="learnable"))
    rbatch = 128
    rx = jax.random.normal(jax.random.key(4), (rbatch, 224, 224, 3),
                           jnp.float32)
    ry = jax.random.randint(jax.random.key(5), (rbatch,), 0, 1000)
    bvec = sample_budgets(rmodel.module, jax.random.key(6), rbatch)
    ropt = tx.init(rmodel.params)

    def make_res_vg(save_qkv):
        def loss_fn(pp, x_):
            logits, aux = residualvit_forward_trainable(
                pp, x_, bvec, patch_size=16, num_heads=12,
                interpret=not on_tpu, save_qkv=save_qkv)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, ry).mean()
            sparsity = sum(jnp.mean(m) for m in aux["masks"].values())
            return ce + 1e-4 * sparsity

        return jax.value_and_grad(loss_fn)

    if "residual" in sections:
        for name, sq in (("residual_recompute", False),
                         ("residual_saveqkv", True)):
            s = device_train_seconds_per_step(
                make_res_vg(sq), update_fn, rmodel.params, ropt, rx,
                reps=reps)
            out[f"{name}_ms"] = round(s * 1e3, 3)
            out[f"{name}_img_s"] = round(rbatch / s, 1)
            print(f"{name}: {s * 1e3:.2f} ms/step = {rbatch / s:.0f} img/s",
                  file=sys.stderr, flush=True)

    if secs:
        best = min(v for k, v in secs.items() if k != "linen_fp32")
        best_name = next(k for k, v in secs.items() if v == best)
        out["best"] = best_name
        out["best_vs_linen"] = round(secs["linen_fp32"] / best, 3)
        out["best_vs_split"] = round(secs["split_bf16"] / best, 3)
        # train-step roofline: 3x the forward FLOPs (fwd + 2 matmul passes
        # in bwd), ignoring the optimizer's elementwise sweep
        flops_step = 3 * 2.0 * analytic_macs(model.module) * batch
        out["best_vs_train_roofline"] = round(
            (flops_step / best) / peak_flops(dev), 4)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sections=tuple(sys.argv[1:]) or ("vit", "residual"))
