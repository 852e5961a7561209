"""Does QAT recover the int8 serving gap at ViT-B scale?

parity_agreement.json pins post-training int8 at 0.89-0.93 top-1
agreement vs fp32 on the outlier-channel fixture. This benchmark
measures what quantization-aware fine-tuning (Trainer(qat=True),
ops/fake_quant.py) buys back, with the confound controlled:

1. ptq rows — the untouched fixture served int8 (dynamic, and
   SmoothQuant-calibrated) vs its own fp32 linen forward;
2. plain_finetune — the fixture fine-tuned K steps on self-distilled
   labels (its own fp32 argmax on synthetic images: the objective is
   "keep computing the same function"), then served int8;
3. qat_finetune — the SAME init, SAME data/steps/lr, fine-tuned through
   the engine's exact fake-quant grid, then served int8.

Row 3 vs row 2 is the QAT effect proper (identical training, only the
rounding in the loss differs); both are evaluated on HELD-OUT images
against their own fp32 forward, so logit-spread drift from fine-tuning
cancels. Writes benchmarks/qat_agreement.json; quoted in BASELINE.md.

Run:  python benchmarks/qat_agreement.py   (~8 min on v5e-1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B16 = dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
           hidden_dim=768, mlp_dim=3072, num_classes=1000)
TRAIN_N, EVAL_N, BATCH, STEPS, LR = 256, 512, 32, 150, 1e-4


def agreement(ref: np.ndarray, got: np.ndarray) -> dict:
    top1 = float((ref.argmax(-1) == got.argmax(-1)).mean())
    top5 = np.argsort(-got, axis=-1)[:, :5]
    in5 = float((top5 == ref.argmax(-1)[:, None]).any(-1).mean())
    return {"top1_agreement": round(top1, 4),
            "ref_top1_in_top5": round(in5, 4)}


def int8_vs_own_fp32(model, eval_images, calib=None,
                     teacher_labels=None) -> dict:
    """int8 engine of ``model`` vs the SAME weights' fp32 linen forward;
    with ``teacher_labels`` also reports each path's accuracy against the
    base fixture's held-out predictions and the QUANT DROP (fp32 acc
    minus int8 acc) — the confound-free QAT measure: fine-tuning itself
    sharpens logits and lifts agreement for any variant, but only less
    rounding-sensitive weights shrink the drop."""
    from peekvit_tpu.inference import InferenceEngine

    on_tpu = jax.default_backend() == "tpu"
    apply_fn = model.apply_fn()

    @jax.jit
    def ref_fwd(params, x):
        with jax.default_matmul_precision("highest"):
            out, _ = apply_fn(params, x, None, None, {}, train=False)
        return out

    eng = InferenceEngine(model, interpret=not on_tpu, quantized=True,
                          calib_images=calib)
    refs, i8s = [], []
    for i in range(0, len(eval_images), 2 * BATCH):
        x = jnp.asarray(eval_images[i:i + 2 * BATCH])
        refs.append(np.asarray(ref_fwd(model.params, x)))
        i8s.append(np.asarray(eng(x)))
    ref, i8 = np.concatenate(refs), np.concatenate(i8s)
    out = agreement(ref, i8)
    if teacher_labels is not None:
        fp_acc = float((ref.argmax(-1) == teacher_labels).mean())
        i8_acc = float((i8.argmax(-1) == teacher_labels).mean())
        out.update(fp32_acc_vs_teacher=round(fp_acc, 4),
                   int8_acc_vs_teacher=round(i8_acc, 4),
                   quant_drop=round(fp_acc - i8_acc, 4))
    return out


def finetune(model, images, labels, qat: bool) -> None:
    from peekvit_tpu.training.optim import Adam
    from peekvit_tpu.training.trainer import Trainer

    t = Trainer(model=model, optimizer=Adam(lr=LR), fused=False, qat=qat)
    step = 0
    while step < STEPS:
        for i in range(0, len(images), BATCH):
            if step >= STEPS:
                break
            m = t.train_step(jnp.asarray(images[i:i + BATCH]),
                             jnp.asarray(labels[i:i + BATCH]),
                             step_idx=step)
            if step % 50 == 0:
                print(json.dumps({"mode": "qat" if qat else "plain",
                                  "step": step,
                                  "loss": round(float(m["total_loss"]), 4)}),
                      flush=True)
            step += 1


def main():
    from peekvit_tpu.models.registry import build_model
    from tests.realistic_weights import make_outlier_vit_params

    rng = np.random.default_rng(42)
    train_x = rng.normal(size=(TRAIN_N, 224, 224, 3)).astype(np.float32)
    eval_x = rng.normal(size=(EVAL_N, 224, 224, 3)).astype(np.float32)

    base = build_model("vit", B16, seed=9)
    base.params = make_outlier_vit_params(base.params, seed=9)

    # self-distillation targets: the fixture's own fp32 predictions
    apply_fn = base.apply_fn()

    @jax.jit
    def fwd(params, x):
        with jax.default_matmul_precision("highest"):
            out, _ = apply_fn(params, x, None, None, {}, train=False)
        return out

    def teacher(images):
        return np.concatenate([
            np.asarray(fwd(base.params, jnp.asarray(images[i:i + 2 * BATCH])))
            .argmax(-1)
            for i in range(0, len(images), 2 * BATCH)]).astype(np.int32)

    labels = teacher(train_x)
    # held-out teacher labels: each variant's fp32 AND int8 accuracies vs
    # these give the quant DROP per variant (the confound-free measure)
    labels_eval = teacher(eval_x)

    results = {"config": {"train_n": TRAIN_N, "eval_n": EVAL_N,
                          "steps": STEPS, "lr": LR, "batch": BATCH,
                          "fixture": "outlier ViT-B/16 seed 9"}}
    results["ptq_dynamic"] = int8_vs_own_fp32(
        base, eval_x, teacher_labels=labels_eval)
    print(json.dumps({"ptq_dynamic": results["ptq_dynamic"]}), flush=True)
    results["ptq_smoothquant"] = int8_vs_own_fp32(
        base, eval_x, calib=train_x[:32], teacher_labels=labels_eval)
    print(json.dumps({"ptq_smoothquant": results["ptq_smoothquant"]}),
          flush=True)

    for mode, qat in (("plain_finetune", False), ("qat_finetune", True)):
        model = build_model("vit", B16, seed=9)
        model.params = jax.tree.map(jnp.copy, base.params)
        finetune(model, train_x, labels, qat=qat)
        results[mode] = int8_vs_own_fp32(model, eval_x,
                                         teacher_labels=labels_eval)
        print(json.dumps({mode: results[mode]}), flush=True)

    path = os.path.join(os.path.dirname(__file__), "qat_agreement.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": path}))
    return results


if __name__ == "__main__":
    main()
