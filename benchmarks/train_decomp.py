"""Train-step decomposition for the shipped SPLIT fused path (ViT-B/16
bs256, v5e-1): where do the ms/step go?

Phases timed separately (each as its own on-device fori_loop, bench.py
method):

  fwd_only         the differentiable forward + CE loss (no grad)
  fwd_bwd          value_and_grad (grads materialized, no optimizer)
  full_step        fwd + bwd + adam, timed with bench.py's
                   device_train_seconds_per_step (grad-consuming carry)
  sgd_step         same with plain SGD (optimizer-agnostic floor)
  full_step_naive  fwd + bwd + adam with the NAIVE loop (grads straight
                   into the optimizer, loss alone in the carry) — kept as
                   the reproducible measurement-artifact diagnostic

Writes benchmarks/train_decomp.json with the deltas:
  bwd_ms                  = fwd_bwd - fwd_only  (backward incl. recompute)
  adam_ms                 = full_step - fwd_bwd (the optimizer, real cost)
  scheduling_artifact_ms  = full_step_naive - full_step

Round-4 findings pinned by this script (v5e, 86.6M params):
  - The naive-loop "optimizer cost" of ~24-28 ms was a MEASUREMENT
    artifact, not step cost: inside a fori_loop whose carry is only
    (params, opt_state, loss), XLA has cross-iteration scheduling freedom
    a host-dispatched train loop (one donated jit call per step) never
    has, and spends ~19-28 ms/step on it (batch-proportional: +7 ms at
    bs64; optimizer-independent: SGD pays it too; NOT weight processing:
    updating all 86.6M params from real grads in an otherwise-identical
    loop costs < 1 ms; NOT fusion damage alone: an optimization_barrier
    recovers just 5.8 ms). Consuming every grad leaf into the carried
    scalar (bench.device_train_seconds_per_step) pins the serialized
    schedule and the decomposition CLOSES: full_step = fwd_bwd + adam's
    HBM-traffic bound (~2.4 GB => ~3.5 ms), sgd_step = fwd_bwd + ~1 GB.
  - With save_qkv (round-4 session 3 refresh) every phase sits AT its
    floor — the step is fully accounted for:
      fwd 64.2 ms = the eval engine's 53.0 ms (itself 96% of the measured
        MXU ceiling) + ~11 ms of mandatory saved-activation HBM writes
        (per layer: qkv 232 MB + gelu input 310 MB + attention out 78 MB
        + LN saves, ~= 9 GB/step at 819 GB/s v5e HBM);
      bwd 137.1 ms = 2.13x fwd = the recompute-FLOP floor now that only
        the (B,H,N,N) attention logits are recomputed flash-style
        (~0.13x fwd FLOPs; before save_qkv the floor was 2.26x and the
        measured 2.38x left a ~7 ms gap — saving qkv removed both);
      adam 4.2 ms ~= its ~2.4 GB HBM-traffic bound; SGD = fwd_bwd.
    Remaining distance to the 3x-FLOPs roofline (0.666) is the roofline's
    own idealization: it prices neither the save/restore traffic nor the
    recompute FLOPs that ANY memory-feasible transformer training step
    pays.
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

from bench import (device_seconds_per_iter, device_train_seconds_per_step,
                   peak_flops)
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
    params = model.params
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
        # backward work); a g*0 form would DCE the whole backward
        consume = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda g: jnp.sum(g.astype(jnp.float32)), grads),
            jnp.float32(0.0))
        return loss + consume * 1e-30

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    out = {"batch": batch}
    secs = {}
    for name, fn in (("fwd_only", run_fwd), ("fwd_bwd", run_fwd_bwd)):
        t = min(device_seconds_per_iter(fn, ((params, opt_state), x),
                                        reps=8) for _ in range(2))
        secs[name] = t
        out[name + "_ms"] = round(t * 1e3, 2)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)

    # full steps with the grad-consuming carry (see bench.py docstring)
    vg = jax.value_and_grad(loss_fn)
    for name, tx_ in (("full_step", tx), ("sgd_step", optax.sgd(1e-3))):
        o0 = tx_.init(params)

        def update_fn(grads, o, p, tx_=tx_):
            updates, o2 = tx_.update(grads, o, p)
            return optax.apply_updates(p, updates), o2

        t = device_train_seconds_per_step(vg, update_fn, params, o0, x)
        secs[name] = t
        out[name + "_ms"] = round(t * 1e3, 2)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)

    # naive loop (the round-4 measurement artifact, kept reproducible)
    @functools.partial(jax.jit, static_argnums=(2,))
    def loop_naive(carry, xy, n):
        def body(i, c):
            p, o, s = c
            x_, y_ = xy
            loss, grads = vg(p, x_.at[0, 0, 0, 0].add(s * 0))
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, loss

        return jax.lax.fori_loop(0, n, body,
                                 (carry[0], carry[1], jnp.float32(0.0)))[-1]

    def timed(n, samples=3):
        float(loop_naive((params, opt_state), (x, y), n))
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            float(loop_naive((params, opt_state), (x, y), n))
            best = min(best, time.time() - t0)
        return best

    secs["full_step_naive"] = (timed(9) - timed(1)) / 8
    out["full_step_naive_ms"] = round(secs["full_step_naive"] * 1e3, 2)
    print(json.dumps({"full_step_naive": out["full_step_naive_ms"]}),
          flush=True)

    out["bwd_ms"] = round((secs["fwd_bwd"] - secs["fwd_only"]) * 1e3, 2)
    out["adam_ms"] = round((secs["full_step"] - secs["fwd_bwd"]) * 1e3, 2)
    out["sgd_delta_ms"] = round(
        (secs["sgd_step"] - secs["fwd_bwd"]) * 1e3, 2)
    out["scheduling_artifact_ms"] = round(
        (secs["full_step_naive"] - secs["full_step"]) * 1e3, 2)
    flops_fwd = 2.0 * analytic_macs(model.module) * batch
    out["fwd_vs_roofline"] = round(
        flops_fwd / secs["fwd_only"] / peak_flops(dev), 4)
    out["step_vs_3x_roofline"] = round(
        3 * flops_fwd / secs["full_step"] / peak_flops(dev), 4)
    out["step_img_s"] = round(batch / secs["full_step"], 1)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_decomp.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
