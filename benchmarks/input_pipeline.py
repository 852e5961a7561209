"""Input-pipeline throughput: can the host feed the train step?

A production framework must answer the end-to-end question — JPEG bytes
on disk -> augmented device batches -> optimizer steps — not just the
device-step rate. This benchmark pins three host-side rates and (on TPU)
the overlapped end-to-end rate:

  native_eval_img_s   C++ whole-batch decode+resize+normalize
                      (peekvit_tpu/native image_pipeline.cpp, one GIL
                      release per batch) — the eval/test recipe
  pil_eval_img_s      the same recipe forced through the PIL fallback
  pil_train_img_s     the training recipe (RandAugment -> Resize ->
                      Normalize; reference data/imagenette.py:34-40) —
                      RandAugment is PIL-only by design
  end_to_end_img_s    DataLoader -> prefetch_to_device -> donated fused
                      train step, wall clock to the final loss fetch

Rates are per-core multiplied out by thread count only where threads can
actually run (this bench environment exposes ONE core — the JSON records
`cores` so the numbers read as img/s/core; production sizing is
  cores_needed = step_img_s / per_core_img_s
e.g. ViT-B/16 at ~1170 img/s training needs ~6-8 cores of the C++ path).

The corpus is synthetic: low-res random RGB upsampled to 500x375 and
JPEG-encoded at quality 87, matching ImageNet-val's file-size and decode
cost profile without shipping data. Cached under /tmp across runs.

Writes benchmarks/input_pipeline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from peekvit_tpu.data import transforms as T
from peekvit_tpu.data.datasets import ImageFolder
from peekvit_tpu.data.loader import DataLoader, prefetch_to_device

ROOT = "/tmp/pv_bench_imagefolder"
N_CLASSES, PER_CLASS = 8, 192  # 1536 images = 6 batches of 256


def build_corpus(root: str = ROOT, n_classes: int = N_CLASSES,
                 per_class: int = PER_CLASS) -> str:
    from PIL import Image

    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return root
    rng = np.random.default_rng(0)
    for c in range(n_classes):
        cdir = os.path.join(root, f"class_{c:02d}")
        os.makedirs(cdir, exist_ok=True)
        for i in range(per_class):
            lo = rng.integers(0, 256, (24, 32, 3), np.uint8)
            img = Image.fromarray(lo).resize((500, 375), Image.BILINEAR)
            img.save(os.path.join(cdir, f"{i:04d}.jpg"), quality=87)
    with open(done, "w") as f:
        f.write("ok")
    return root


def _epoch_rate(loader, skip: int = 1) -> float:
    """img/s over one epoch, excluding the first `skip` batches (pool
    spin-up / page-cache warm)."""
    n = 0
    t0 = None
    for i, (x, y) in enumerate(loader):
        if i + 1 == skip:
            t0 = time.time()
            continue
        if i >= skip:
            n += x.shape[0]
    return n / (time.time() - t0)


def main(batch: int = 256, image_size: int = 224):
    root = build_corpus()
    cores = len(os.sched_getaffinity(0))
    out = {"cores": cores, "batch": batch}

    # --- native C++ batch path (eval recipe) ---
    ds = ImageFolder(root, T.test_transform(image_size))
    nb = ds.native_batch(list(range(4)), num_threads=1)
    out["native_available"] = nb is not None
    if nb is not None:
        loader = DataLoader(ds, batch, shuffle=True,
                            num_workers=max(cores, 1))
        out["native_eval_img_s"] = round(_epoch_rate(loader), 1)
        print(json.dumps({"native_eval_img_s": out["native_eval_img_s"]}),
              flush=True)

    # --- PIL fallback, same recipe ---
    ds_pil = ImageFolder(root, T.test_transform(image_size))
    ds_pil._native_spec = False  # force the PIL path
    loader = DataLoader(ds_pil, batch, shuffle=True,
                        num_workers=max(cores, 1))
    out["pil_eval_img_s"] = round(_epoch_rate(loader), 1)
    print(json.dumps({"pil_eval_img_s": out["pil_eval_img_s"]}), flush=True)

    # --- training recipe (RandAugment is PIL-only) ---
    ds_tr = ImageFolder(root, T.train_transform(image_size))
    loader = DataLoader(ds_tr, batch, shuffle=True,
                        num_workers=max(cores, 1))
    out["pil_train_img_s"] = round(_epoch_rate(loader), 1)
    print(json.dumps({"pil_train_img_s": out["pil_train_img_s"]}),
          flush=True)

    # --- end-to-end on TPU: loader -> device -> donated train step ---
    import jax

    if jax.default_backend() == "tpu":
        import functools

        import jax.numpy as jnp
        import optax

        from peekvit_tpu.models.registry import build_model
        from peekvit_tpu.training.fused import make_fused_train_step

        model = build_model("vit", dict(
            image_size=image_size, patch_size=16, num_layers=12,
            num_heads=12, hidden_dim=768, mlp_dim=3072, num_classes=1000))
        tx = optax.adam(1e-3)
        step = make_fused_train_step(model, tx)
        params, opt_state = model.params, tx.init(model.params)
        # compile once off the clock
        xw = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
        yw = jnp.zeros((batch,), jnp.int32)
        params, opt_state, _ = step(params, opt_state, xw, yw)

        ds_e2e = ImageFolder(root, T.train_transform(image_size))
        loader = DataLoader(ds_e2e, batch, shuffle=True,
                            num_workers=max(cores, 1), drop_last=True)
        n = 0
        t0 = time.time()
        loss = None
        for x, y in prefetch_to_device(loader, size=2):
            params, opt_state, loss = step(params, opt_state, x, y)
            n += batch
        float(loss)  # sync: the tunnel acks dispatches before execution
        out["end_to_end_img_s"] = round(n / (time.time() - t0), 1)
        out["end_to_end_loader_bound"] = bool(
            out["end_to_end_img_s"]
            < 0.8 * 256 / 0.2192)  # step-only rate, train_decomp.json
        print(json.dumps({"end_to_end_img_s": out["end_to_end_img_s"]}),
              flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "input_pipeline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
