"""Headline bench: ViT-B/16 eval throughput on one chip.

Prints ONE JSON line:
  {"metric": "vit_b16_eval_throughput", "value": <img/s>,
   "unit": "images/sec/chip", "vs_baseline": <fraction of MXU roofline>}

The reference publishes no numbers (BASELINE.md), so the baseline is the
hardware roofline: peak bf16 MXU FLOPs / analytic model FLOPs-per-image
(utils/flops_count.py). ``vs_baseline`` = measured / roofline.

Timing method: the axon TPU tunnel acks dispatches before execution
(``block_until_ready`` returns immediately), so wall-clock around dispatch
loops measures nothing. Instead N forward passes run *on device* inside one
jitted ``lax.fori_loop`` with a data-dependent carry, synced by fetching a
scalar; per-iteration time = (loop(N) - loop(1)) / (N - 1), which also
cancels the tunnel's scalar-fetch RTT.
"""

from __future__ import annotations

import functools
import json
import sys
import time


# Peak bf16 FLOPs/s per chip (MXU).
PEAK_BF16_FLOPS = {
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}


def peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in PEAK_BF16_FLOPS.items():
        if key in kind:
            return val
    return 197e12  # assume v5e


def device_seconds_per_iter(step_sum_fn, args, reps: int = 20) -> float:
    """Time one on-device iteration of ``step_sum_fn(*args) -> f32 scalar``
    via nested fori_loop timing (see module docstring).

    Each wall-clock sample includes one tunnel scalar-fetch RTT; that noise
    is strictly ADDITIVE, so each of the two samples (loop(1), loop(N+1))
    is taken as the min of 3 fetches — the standard timeit-style estimator
    for positive noise — before the (tN - t1)/N subtraction. Without this,
    RTT jitter divided by N puts a few percent of spread on every
    measurement (observed on the axon tunnel)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, carry):
            return step_sum_fn(*args, carry)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n, samples: int = 3):
        float(loop(args, n))  # compile / warm
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            float(loop(args, n))
            best = min(best, time.time() - t0)
        return best

    t1 = timed(1)
    tn = timed(reps + 1)
    return (tn - t1) / reps


def device_train_seconds_per_step(vg_fn, update_fn, params, opt_state, x,
                                  reps: int = 8, samples: int = 3) -> float:
    """Seconds per optimizer step (fwd + bwd + update) measured on device.

    ``vg_fn(params, x) -> (loss, grads)``; ``update_fn(grads, opt_state,
    params) -> (new_params, new_opt_state)``. The step runs inside a jitted
    ``fori_loop`` carrying (params, opt_state, loss-scalar), timed by the
    same (loop(N+1) - loop(1)) / N subtraction as ``device_seconds_per_iter``.

    Methodology (round 4, pinned by benchmarks/train_decomp.py's
    ``scheduling_artifact_ms``): a naive loop — grads flowing straight into
    the optimizer, loss alone in the carry — gives XLA cross-iteration
    scheduling freedom that a real host-dispatched training loop (one
    donated jit call per step) never has, and XLA uses it BADLY: ViT-B/16
    bs256 measured +19 ms/step with plain SGD and +24 ms with adam, batch-
    proportional (+7 ms at bs64), optimizer-independent, and immune to every
    weight-processing explanation (updating all 86.6M params from real
    grads inside an otherwise-identical loop costs < 1 ms). Consuming every
    grad leaf into the carried scalar — after an ``optimization_barrier`` —
    pins the serialized per-step schedule; the consumed loop closes exactly
    to fwd_bwd + the optimizer's HBM-traffic bound (adam: ~2.4 GB over
    86.6M fp32 params ≈ 3.5 ms). The barrier alone does NOT recover it
    (-5.8 ms of fusion damage only); the consume-sum is load-bearing.
    """
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(carry, n):
        def body(i, c):
            p, o, s = c
            loss, grads = vg_fn(p, x.at[0, 0, 0, 0].add(
                (s * 0).astype(x.dtype)))
            grads = jax.lax.optimization_barrier(grads)
            consume = jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda g: jnp.sum(g.astype(jnp.float32)),
                             grads),
                jnp.float32(0.0))
            p2, o2 = update_fn(grads, o, p)
            return p2, o2, loss + consume * 1e-30

        return jax.lax.fori_loop(
            0, n, body, (carry[0], carry[1], jnp.float32(0.0)))[-1]

    def timed(n):
        float(loop((params, opt_state), n))  # compile / warm
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            float(loop((params, opt_state), n))
            best = min(best, time.time() - t0)
        return best

    t1 = timed(1)
    tn = timed(reps + 1)
    return (tn - t1) / reps


def main(batch_size: int = 256, reps: int = 20, also_bs2048: bool = True):
    import functools

    import jax
    import jax.numpy as jnp

    from peekvit_tpu.inference import prepare_engine_params, vit_forward_fused
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.utils.flops_count import analytic_macs

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr, flush=True)

    model = build_model(
        "vit",
        dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
             hidden_dim=768, mlp_dim=3072, num_classes=1000),
    )
    # bf16 cast, 1-D vectors pre-shaped to (1, k), and the LN affines
    # pre-folded into the qkv/fc1 weights ONCE — the in-graph per-forward
    # fold is two weight-sized fp32 sweeps + a (1,d)@(d,m) matmul per
    # layer per call that XLA cannot hoist (params are jit operands);
    # measured 0.14 ms/layer (see inference.prepare_engine_params)
    params = prepare_engine_params(model.params, jnp.bfloat16, fold_ln=True)
    on_tpu = jax.default_backend() == "tpu"
    fwd = functools.partial(
        vit_forward_fused, patch_size=16, num_heads=12, interpret=not on_tpu
    )

    def step_sum(params, x, carry):
        # loop-carry dependency via the (1, 196, 768) embed bias instead of
        # the input image: `x.at[0,0,0,0].add(bump)` materializes a fresh
        # 77 MB copy of x every timed iteration (~0.19 ms of measurement
        # overhead); bumping the bias costs a 0.3 MB copy and still makes
        # EVERY token of EVERY layer iteration-dependent (so XLA can
        # neither CSE the forward across iterations nor hoist the encoder
        # out of the loop — the bias feeds the embed output directly)
        bump = (carry * 0).astype(params["_embed_img_bias"].dtype)
        p2 = dict(params, _embed_img_bias=params["_embed_img_bias"] + bump)
        return jnp.sum(fwd(p2, x))

    def measure(bs, reps_, rounds: int = 5):
        # median of `rounds` timing passes as the headline: robust to the
        # axon tunnel's few-percent run-to-run interference without the
        # upward bias of best-of-N (ADVICE r2); the max is also reported.
        x = jax.random.normal(jax.random.key(0), (bs, 224, 224, 3),
                              jnp.bfloat16)
        vals = sorted(
            bs / device_seconds_per_iter(step_sum, (params, x), reps_)
            for _ in range(rounds)
        )
        return vals[len(vals) // 2], vals[-1]

    images_per_sec, images_per_sec_best = measure(batch_size, reps)

    flops_per_image = 2.0 * analytic_macs(model.module)
    roofline = peak_flops(dev) / flops_per_image
    result = {
        "metric": "vit_b16_eval_throughput",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / roofline, 4),
        "value_best": round(images_per_sec_best, 1),
        "vs_baseline_best": round(images_per_sec_best / roofline, 4),
    }
    if also_bs2048 and on_tpu:
        # the reference eval recipe names test_batch_size=2048; report it
        # alongside the headline (measured: batch size does not move
        # per-image throughput — the per-layer kernels dominate)
        ips2048, _ = measure(2048, max(4, reps // 4), rounds=3)
        result["value_bs2048"] = round(ips2048, 1)
        result["vs_baseline_bs2048"] = round(ips2048 / roofline, 4)
    if on_tpu:
        # int8 sidecar (VERDICT r4 #3): the serving path that BEATS the
        # bf16 roofline — w8a8 with SmoothQuant + static calibration caps
        # (the engine's throughput mode; its own double-bounded ceiling is
        # benchmarks/int8_ceiling.json). Guarded like the train rider so
        # the bf16 headline survives any quant-path failure.
        try:
            from peekvit_tpu.inference import InferenceEngine

            calib = jax.random.normal(jax.random.key(7),
                                      (32, 224, 224, 3), jnp.float32)
            eng = InferenceEngine(model, quantized=True, calib_images=calib,
                                  calib_static_caps=True)

            def int8_step(params, x, carry):
                # same embed-bias loop-carry as the bf16 step (no 77 MB
                # input copy per timed iteration)
                bump = (carry * 0).astype(params["_embed_img_bias"].dtype)
                p2 = dict(params,
                          _embed_img_bias=params["_embed_img_bias"] + bump)
                return jnp.sum(eng._fn(p2, x))

            x8 = jax.random.normal(jax.random.key(1),
                                   (batch_size, 224, 224, 3), jnp.bfloat16)
            vals = sorted(
                batch_size
                / device_seconds_per_iter(int8_step, (eng.params, x8), reps)
                for _ in range(3))
            int8_ips = vals[len(vals) // 2]
            result["int8_value"] = round(int8_ips, 1)
            result["int8_vs_baseline"] = round(int8_ips / roofline, 4)
            result["int8_variant"] = "w8a8 SmoothQuant + static caps"
            result["int8_parity"] = (
                "approximate serving mode: N=512 top-1 agreement vs fp32 "
                "0.89-0.93 on the adversarial random-init outlier fixture "
                "(a lower bound; top-5 containment >= 0.998, Spearman >= "
                "0.998) — benchmarks/parity_agreement.json")
        except Exception as e:  # pragma: no cover - defensive
            print(f"int8 rider skipped: {e}", file=sys.stderr, flush=True)
        # train throughput rider (ViT-B/16 bs256 fwd+bwd+adam, the shipped
        # split fused path): pins the training number in the driver-run
        # artifact; guarded so the eval headline survives any train-path
        # failure. vs_train_roofline uses the 3x-forward-FLOPs convention.
        try:
            import optax

            from peekvit_tpu.training.fused import vit_forward_trainable

            yt = jax.random.randint(jax.random.key(3), (batch_size,), 0,
                                    1000)

            def loss_fn(p, x):
                logits = vit_forward_trainable(
                    p, x, patch_size=16, num_heads=12, interpret=False)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yt).mean()

            tx = optax.adam(1e-3)
            opt_state = tx.init(model.params)

            def update_fn(grads, o, p):
                updates, o2 = tx.update(grads, o, p)
                return optax.apply_updates(p, updates), o2

            xt = jax.random.normal(jax.random.key(2),
                                   (batch_size, 224, 224, 3), jnp.float32)
            secs = min(
                device_train_seconds_per_step(
                    jax.value_and_grad(loss_fn), update_fn,
                    model.params, opt_state, xt, reps=6)
                for _ in range(2))
            result["train_value"] = round(batch_size / secs, 1)
            result["train_vs_roofline"] = round(
                batch_size / secs / (roofline / 3.0), 4)
        except Exception as e:  # pragma: no cover - defensive
            print(f"train rider skipped: {e}", file=sys.stderr, flush=True)
    print(json.dumps(result))
    return result


def main_with_retries(retries: int = 3, **kw):
    """The axon tunnel occasionally throws a transient FAILED_PRECONDITION;
    retry so the driver's end-of-round bench run survives it."""
    for attempt in range(retries):
        try:
            return main(**kw)
        except Exception as e:  # jax.errors.JaxRuntimeError etc.
            if attempt == retries - 1:
                raise
            print(f"bench attempt {attempt + 1} failed ({e}); retrying",
                  file=sys.stderr, flush=True)
            time.sleep(20)


if __name__ == "__main__":
    main_with_retries()
