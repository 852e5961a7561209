"""Headline bench: ViT-B/16 eval throughput on one chip.

Prints ONE JSON line:
  {"metric": "vit_b16_eval_throughput", "value": <img/s>,
   "unit": "images/sec/chip", "vs_baseline": <fraction of MXU roofline>}

The reference publishes no numbers (BASELINE.md), so the baseline is the
hardware roofline: peak bf16 MXU FLOPs / analytic model FLOPs-per-image
(utils/flops_count.py). ``vs_baseline`` = measured / roofline — the
BASELINE.json target is >= 0.9 on a v5e-1.

Model runs in bfloat16 (params + activations) with fp32 accumulation —
the TPU-native inference configuration.
"""

from __future__ import annotations

import json
import sys
import time


# Peak bf16 FLOPs/s per chip (MXU). v5e ("TPU v5 lite"): 197 TFLOP/s.
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


def main(batch_size: int = 256, reps: int = 30):
    import jax
    import jax.numpy as jnp

    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.utils.flops_count import analytic_macs

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr, flush=True)

    model = build_model(
        "vit",
        dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
             hidden_dim=768, mlp_dim=3072, num_classes=1000),
    )
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), model.params)
    apply_fn = model.apply_fn()

    @jax.jit
    def fwd(params, x):
        logits, _ = apply_fn(params, x, None, None, {}, train=False)
        return logits

    x = jnp.zeros((batch_size, 224, 224, 3), jnp.bfloat16)
    t0 = time.time()
    fwd(params, x).block_until_ready()
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    # warmup + timed reps
    for _ in range(3):
        fwd(params, x).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fwd(params, x)
    out.block_until_ready()
    elapsed = time.time() - t0
    images_per_sec = batch_size * reps / elapsed

    flops_per_image = 2.0 * analytic_macs(model.module)
    roofline = peak_flops(dev) / flops_per_image
    result = {
        "metric": "vit_b16_eval_throughput",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / roofline, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
