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

Writes benchmarks/train_step.json. Timing uses the same on-device
fori_loop subtraction as bench.py (the axon tunnel acks dispatches early),
with (params, opt_state) as the loop carry so every iteration is a real
optimizer step on the previous iteration's weights.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import peak_flops  # noqa: E402
from peekvit_tpu.models.registry import build_model  # noqa: E402
from peekvit_tpu.utils.flops_count import analytic_macs  # noqa: E402


def _timed_loop(step, params, opt_state, x, y, reps: int = 10):
    """Seconds per train step: jitted fori_loop carrying (params, opt),
    (loop(N+1) - loop(1)) / N, min-of-3 per sample (see bench.py)."""

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(carry, xy, n):
        def body(i, c):
            p, o, s = c
            x_, y_ = xy
            # data-dependent perturbation keeps iterations serialized
            p2, o2, loss = step(p, o, x_.at[0, 0, 0, 0].add(s * 0), y_)
            return p2, o2, loss

        p, o, loss = jax.lax.fori_loop(0, n, body,
                                       (carry[0], carry[1], jnp.float32(0.0)))
        return loss

    def timed(n, samples: int = 3):
        float(loop((params, opt_state), (x, y), n))
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            float(loop((params, opt_state), (x, y), n))
            best = min(best, time.time() - t0)
        return best

    t1 = timed(1)
    tn = timed(reps + 1)
    return (tn - t1) / reps


def main(batch: int = 256, reps: int = 10):
    from peekvit_tpu.training.fused import vit_forward_trainable

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr, flush=True)
    on_tpu = jax.default_backend() == "tpu"

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

    def make_step(fwd):
        def step(p, o, x_, y_):
            def loss_fn(pp):
                logits = fwd(pp, x_)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y_).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, loss

        return step

    apply_fn = model.apply_fn()

    def linen_fwd(p, x_):
        logits, _ = apply_fn(p, x_, None, None,
                             {"noise": jax.random.key(0)}, train=True)
        return logits

    fused = functools.partial(
        vit_forward_trainable, patch_size=16, num_heads=12,
        interpret=not on_tpu)

    variants = {
        "linen_fp32": make_step(linen_fwd),
        "split_bf16": make_step(functools.partial(fused, merged=False)),
        "split_remat_bf16": make_step(
            functools.partial(fused, merged=False, remat=True)),
        "merged_bf16": make_step(functools.partial(fused, merged=True)),
        "hybrid_bf16": make_step(functools.partial(fused, merged="hybrid")),
    }
    out = {"batch": batch, "model": "vit_b16_224", "step": "fwd+bwd+adam"}
    secs = {}
    for name, step in variants.items():
        s = _timed_loop(step, params, opt_state, x, y, reps=reps)
        secs[name] = s
        out[f"{name}_ms"] = round(s * 1e3, 3)
        out[f"{name}_img_s"] = round(batch / s, 1)
        print(f"{name}: {s * 1e3:.2f} ms/step = {batch / s:.0f} img/s",
              file=sys.stderr, flush=True)

    best = min((v for k, v in secs.items() if k != "linen_fp32"),
               default=None)
    best_name = next(k for k, v in secs.items() if v == best)
    out["best"] = best_name
    out["best_vs_linen"] = round(secs["linen_fp32"] / best, 3)
    out["best_vs_split"] = round(secs["split_bf16"] / best, 3)
    # train-step roofline: 3x the forward FLOPs (fwd + 2 matmul passes in
    # bwd), ignoring the optimizer's elementwise sweep
    flops_step = 3 * 2.0 * analytic_macs(model.module) * batch
    out["best_vs_train_roofline"] = round(
        (flops_step / best) / peak_flops(dev), 4)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_step.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
