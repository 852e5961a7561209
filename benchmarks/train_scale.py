"""Training-step throughput across ViT scales (B/16, L/16, H/14) on v5e-1.

The eval scale sweep (vit_scale.py) pinned the merged-kernel ENGINE at
each scale; this is its training analogue: fwd + bwd + adam through the
shipped SPLIT fused path (custom-VJP attention kernel + XLA MLP,
training/fused.vit_forward_trainable), timed with bench.py's
grad-consuming-carry method (the only loop shape that pins the real
host-dispatched schedule — see device_train_seconds_per_step).

Memory at scale: ViT-H/14 (632M params) carries ~7.6 GB of fp32
master+adam state alone — the fori_loop carry method DOUBLE-BUFFERS that
state (loop carry in + out), which a real host-dispatched donated step
never pays, so H OOMs under the carry method at any batch. The sweep
retries each spec with ``remat=True`` (jax.checkpoint per block: backward
recomputes the block forward, trading ~1/3 more FLOPs for O(L) -> O(1)
activation residency), then a halved batch, then falls back to a
host-dispatched loop over make_fused_train_step (donate_argnums keeps ONE
copy of the state; wall clock synced on a final loss fetch — reported
with ``method: host_loop_donated``), recording what actually ran.
``vs_roofline`` uses the 3x-forward-FLOPs training convention (bwd = 2x
fwd for the matmuls).

Writes benchmarks/train_scale.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import optax

from bench import device_train_seconds_per_step, peak_flops
from peekvit_tpu.models.registry import build_model
from peekvit_tpu.training.fused import vit_forward_trainable
from peekvit_tpu.utils.flops_count import analytic_macs

SCALES = {
    "vit_b16": dict(image_size=224, patch_size=16, num_layers=12,
                    num_heads=12, hidden_dim=768, mlp_dim=3072,
                    num_classes=1000, batch=256),
    "vit_l16": dict(image_size=224, patch_size=16, num_layers=24,
                    num_heads=16, hidden_dim=1024, mlp_dim=4096,
                    num_classes=1000, batch=128),
    "vit_h14": dict(image_size=224, patch_size=14, num_layers=32,
                    num_heads=16, hidden_dim=1280, mlp_dim=5120,
                    num_classes=1000, batch=64),
}


def _measure_one(model, spec, batch: int, remat: bool) -> float:
    x = jax.random.normal(jax.random.key(0), (batch, 224, 224, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000)
    fwd = functools.partial(
        vit_forward_trainable, patch_size=spec["patch_size"],
        num_heads=spec["num_heads"], remat=remat, merged=False)

    def loss_fn(p, x_):
        return optax.softmax_cross_entropy_with_integer_labels(
            fwd(p, x_), y).mean()

    tx = optax.adam(1e-3)
    opt_state = tx.init(model.params)

    def update_fn(grads, o, p):
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2

    return min(
        device_train_seconds_per_step(
            jax.value_and_grad(loss_fn), update_fn, model.params,
            opt_state, x, reps=4)
        for _ in range(2))


def _measure_host_loop(model, spec, batch: int, remat: bool,
                       steps: int = 8) -> float:
    """Wall-clock seconds/step over a host-dispatched DONATED train step
    (one resident copy of params+opt state — the shape a production loop
    actually runs). The axon tunnel acks dispatches before execution, so
    the clock is synced on a final scalar loss fetch; per-step dispatch
    overhead is amortized over ``steps``."""
    import time

    from peekvit_tpu.training.fused import make_fused_train_step

    tx = optax.adam(1e-3)
    step = make_fused_train_step(model, tx, remat=remat, merged=False)
    params = jax.tree.map(jnp.copy, model.params)  # donatable copy
    opt_state = tx.init(params)
    x = jax.random.normal(jax.random.key(0), (batch, 224, 224, 3),
                          jnp.float32)
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000)
    params, opt_state, loss = step(params, opt_state, x, y)  # compile
    float(loss)
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)
    return (time.time() - t0) / steps


def main(only=None):
    assert jax.default_backend() == "tpu", "train scale sweep needs the TPU"
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr, flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_scale.json")
    out = {}
    if only and os.path.exists(path):  # partial rerun: merge into existing
        with open(path) as f:
            out = json.load(f)
    for name, spec in SCALES.items():
        if only and name not in only:
            continue
        spec = dict(spec)
        batch = spec.pop("batch")
        model = build_model("vit", spec)
        n_params = sum(p.size for p in jax.tree.leaves(model.params))
        attempts = [(batch, False, _measure_one),
                    (batch, True, _measure_one),
                    (batch // 2, True, _measure_one),
                    (batch, False, _measure_host_loop),
                    (batch, True, _measure_host_loop),
                    (batch // 2, True, _measure_host_loop),
                    (batch // 4, True, _measure_host_loop)]
        secs = bs = remat = method = None
        for bs_, remat_, fn in attempts:
            try:
                secs = fn(model, spec, bs_, remat_)
                bs, remat = bs_, remat_
                method = ("carry_loop" if fn is _measure_one
                          else "host_loop_donated")
                break
            except Exception as e:
                msg = str(e)
                if "RESOURCE_EXHAUSTED" not in msg and "memory" not in \
                        msg.lower():
                    raise
                print(f"{name} bs={bs_} remat={remat_} {fn.__name__}: "
                      "OOM, retrying", file=sys.stderr, flush=True)
        if secs is None:
            out[name] = {"error": "OOM at all attempts"}
            continue
        roofline3 = peak_flops(dev) / (3 * 2.0 * analytic_macs(model.module))
        out[name] = {
            "batch": bs, "remat": remat, "method": method,
            "params_m": round(n_params / 1e6, 1),
            "step_ms": round(secs * 1e3, 2),
            "img_s": round(bs / secs, 1),
            "vs_3x_roofline": round(bs / secs / roofline3, 4),
        }
        print(json.dumps({name: out[name]}), flush=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(only=set(sys.argv[1:]) or None)
