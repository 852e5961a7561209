"""Engine throughput across ViT scales (B/16, L/16, H/14) on v5e-1.

The merged-layer kernels keep each layer's weights VMEM-resident up to
the _MERGED_WEIGHT_BYTES_LIMIT budget — ViT-L (25 MB/layer) and ViT-H
(39 MB/layer) both qualify, so the same one-dispatch/merged engine path
serves them; anything larger falls back per-sublayer and then to XLA
(guarded, tested). This sweep pins throughput and roofline fraction per
scale, for both the bf16 engine and the int8 dynamic-quant engine
(`vs_roofline_int8` is still vs the BF16 roofline — >1.0 means the int8
path beats what bf16 hardware could ever do). Writes
benchmarks/vit_scale.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import device_seconds_per_iter, peak_flops
from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models.registry import build_model
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


def main():
    assert jax.default_backend() == "tpu", "scale sweep needs the TPU"
    dev = jax.devices()[0]
    out = {}
    for name, spec in SCALES.items():
        spec = dict(spec)
        bs = spec.pop("batch")
        model = build_model("vit", spec)
        model.params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                                    model.params)
        x = jax.random.normal(jax.random.key(0), (bs, 224, 224, 3),
                              jnp.bfloat16)
        roofline = peak_flops(dev) / (2.0 * analytic_macs(model.module))
        out[name] = {"batch": bs}
        # bf16 merged/one-dispatch engine + the int8 (dynamic per-row
        # quant) engine — int8 weights are half bf16 so the VMEM-residency
        # guards admit L/H a fortiori; this pins whether the 2x MXU int8
        # rate survives the larger head_dim/mlp shapes
        for tag, kw in (("", {}), ("_int8", dict(quantized=True))):
            eng = InferenceEngine(model, **kw)

            def step(params, xx, carry, fn=eng._fn):
                return jnp.sum(fn(params, xx.at[0, 0, 0, 0].add(
                    (carry * 0).astype(xx.dtype))))

            t = min(device_seconds_per_iter(step, (eng.params, x), reps=10)
                    for _ in range(2))
            out[name]["img_s" + tag] = round(bs / t, 1)
            out[name]["vs_roofline" + tag] = round(bs / t / roofline, 4)
        print(json.dumps({name: out[name]}), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "vit_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
