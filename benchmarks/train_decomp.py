"""Train-step decomposition for the shipped SPLIT fused path (ViT-B/16
bs256, v5e-1): where do the 240 ms/step go?

Phases timed separately (each as its own on-device fori_loop, bench.py
method):

  fwd_only      the differentiable forward + CE loss (no grad)
  fwd_bwd       value_and_grad (grads materialized, no optimizer)
  full_step     value_and_grad + adam update (the shipped step)
  eval_engine   the inference engine forward (for reference: the fwd-only
                overhead vs the serving path = custom-VJP bookkeeping +
                saved activations)

Writes benchmarks/train_decomp.json with the deltas:
  bwd_ms   = fwd_bwd - fwd_only       (backward incl. recompute)
  adam_ms  = full_step - fwd_bwd      (optimizer + step structure)

Round-4 findings pinned by this script (v5e, 86.6M params):
  - adam_ms ~ 28, ~10x the optimizer's pure HBM-traffic bound (~2.9 ms).
    It is NOT adam math: optax.flatten (one contiguous vector) and a
    hand-fused one-pass adam both measure the same, and plain SGD still
    pays ~20 ms (sgd_step_ms below) for a ~1 GB traffic bound (~1.3 ms).
  - It is NOT loop-invariant-cast hoisting either: a forward with
    per-iteration-perturbed params costs the same 64 ms as with invariant
    params (x*0/x+0 are NOT float-foldable, so the dependency is real).
  - Remaining attribution: materializing the full 344 MB grad tree as a
    fusion boundary + the while-loop carry of ~1 GB of optimizer state.
    Without per-op profiling through the axon tunnel this is the floor
    of what the harness can separate.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from bench import device_seconds_per_iter, peak_flops
from peekvit_tpu.models.registry import build_model
from peekvit_tpu.training.fused import vit_forward_trainable
from peekvit_tpu.utils.flops_count import analytic_macs


def main(batch: int = 256):
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr, flush=True)
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
    fwd = functools.partial(vit_forward_trainable, patch_size=16,
                            num_heads=12, merged=False)

    def loss_fn(p, x_):
        return optax.softmax_cross_entropy_with_integer_labels(
            fwd(p, x_), y).mean()

    def run_fwd(args, xx, carry):
        p, _ = args
        return loss_fn(p, xx.at[0, 0, 0, 0].add((carry * 0).astype(
            xx.dtype)))

    def run_fwd_bwd(args, xx, carry):
        p, _ = args
        loss, grads = jax.value_and_grad(loss_fn)(
            p, xx.at[0, 0, 0, 0].add((carry * 0).astype(xx.dtype)))
        # consume every grad ELEMENT: reading one element per leaf lets
        # XLA slice-simplify weight-grad matmuls away (measured: the
        # one-element form reads ~28 ms faster — that delta is skipped
        # backward work, not optimizer cost); a g*0 form would DCE the
        # whole backward
        consume = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda g: jnp.sum(g.astype(jnp.float32)), grads),
            jnp.float32(0.0))
        return loss + consume * 1e-30

    out = {"batch": batch}
    secs = {}
    for name, fn in (("fwd_only", run_fwd), ("fwd_bwd", run_fwd_bwd)):
        t = min(device_seconds_per_iter(fn, ((params, opt_state), x),
                                        reps=8) for _ in range(2))
        secs[name] = t
        out[name + "_ms"] = round(t * 1e3, 2)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)

    # full step: carry params/opt through the loop (real consecutive steps)
    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(carry, xy, n):
        def body(i, c):
            p, o, s = c
            x_, y_ = xy
            loss, grads = jax.value_and_grad(loss_fn)(
                p, x_.at[0, 0, 0, 0].add(s * 0))
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, loss

        _, _, loss = jax.lax.fori_loop(0, n, body,
                                       (carry[0], carry[1],
                                        jnp.float32(0.0)))
        return loss

    def timed(n, samples=3):
        float(loop((params, opt_state), (x, y), n))
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            float(loop((params, opt_state), (x, y), n))
            best = min(best, time.time() - t0)
        return best

    t1 = timed(1)
    tn = timed(9)
    secs["full_step"] = (tn - t1) / 8
    out["full_step_ms"] = round(secs["full_step"] * 1e3, 2)
    print(json.dumps({"full_step": out["full_step_ms"]}), flush=True)

    # flattened-optimizer variant: optax.flatten(adam) runs the update on
    # ONE contiguous vector instead of ~150 leaves (suspected cause of the
    # 28 ms adam delta: per-leaf unfused elementwise chains)
    txf = optax.flatten(optax.adam(1e-3))
    opt_f = txf.init(params)

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop_f(carry, xy, n):
        def body(i, c):
            p, o, s = c
            x_, y_ = xy
            loss, grads = jax.value_and_grad(loss_fn)(
                p, x_.at[0, 0, 0, 0].add(s * 0))
            updates, o2 = txf.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, loss

        _, _, loss = jax.lax.fori_loop(0, n, body,
                                       (carry[0], carry[1],
                                        jnp.float32(0.0)))
        return loss

    def timed_f(n, samples=3):
        float(loop_f((params, opt_f), (x, y), n))
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            float(loop_f((params, opt_f), (x, y), n))
            best = min(best, time.time() - t0)
        return best

    secs["full_step_flat"] = (timed_f(9) - timed_f(1)) / 8
    out["full_step_flat_ms"] = round(secs["full_step_flat"] * 1e3, 2)
    out["adam_flat_ms"] = round(
        (secs["full_step_flat"] - secs["fwd_bwd"]) * 1e3, 2)
    print(json.dumps({"full_step_flat": out["full_step_flat_ms"]}),
          flush=True)

    # SGD variant: isolates the optimizer-agnostic step-structure cost
    txs = optax.sgd(1e-3)
    opt_s = txs.init(params)

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop_s(carry, xy, n):
        def body(i, c):
            p, o, s = c
            x_, y_ = xy
            loss, grads = jax.value_and_grad(loss_fn)(
                p, x_.at[0, 0, 0, 0].add(s * 0))
            updates, o2 = txs.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, loss

        _, _, loss = jax.lax.fori_loop(0, n, body,
                                       (carry[0], carry[1],
                                        jnp.float32(0.0)))
        return loss

    def timed_s(n, samples=3):
        float(loop_s((params, opt_s), (x, y), n))
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            float(loop_s((params, opt_s), (x, y), n))
            best = min(best, time.time() - t0)
        return best

    secs["full_step_sgd"] = (timed_s(9) - timed_s(1)) / 8
    out["sgd_step_ms"] = round(secs["full_step_sgd"] * 1e3, 2)
    out["sgd_delta_ms"] = round(
        (secs["full_step_sgd"] - secs["fwd_bwd"]) * 1e3, 2)
    print(json.dumps({"full_step_sgd": out["sgd_step_ms"]}), flush=True)

    out["bwd_ms"] = round((secs["fwd_bwd"] - secs["fwd_only"]) * 1e3, 2)
    out["adam_ms"] = round((secs["full_step"] - secs["fwd_bwd"]) * 1e3, 2)
    flops_fwd = 2.0 * analytic_macs(model.module) * batch
    out["fwd_vs_roofline"] = round(
        flops_fwd / secs["fwd_only"] / peak_flops(dev), 4)
    out["step_vs_3x_roofline"] = round(
        3 * flops_fwd / secs["full_step"] / peak_flops(dev), 4)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_decomp.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
