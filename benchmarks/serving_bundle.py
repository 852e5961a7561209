"""Serving-bundle deployment costs for the ViT-B/16 bf16 engine (v5e-1).

What a bundle buys at serving time: the host skips model construction,
parameter preparation (bf16 cast, LN/pos folding, (1,k) pre-shaping,
one-call weight stacking) and tracing — it deserializes StableHLO and
compiles. This benchmark pins, wall-clock on the real TPU:

- ``build_s``: cold start from the model zoo — build_model +
  InferenceEngine(...) + first call (trace + compile + run).
- ``export_s``: save_serving_bundle time (trace + serialize + write).
- ``load_s``: cold start from the artifact — load_serving_bundle +
  first call (deserialize + compile + run), measured in a FRESH
  subprocess so no in-process jit cache can hide work.
- ``steady_state``: device seconds/iter for the live engine vs the
  reloaded bundle (same program modulo XLA fusion choices — parity is
  the point), via bench.device_seconds_per_iter.
- ``bundle_mb``: artifact size on disk.

Writes benchmarks/serving_bundle.json. Caveat: if the environment has a
persistent XLA compilation cache, ``load_s``'s compile component is a
disk hit — the numbers here were measured with whatever cache state the
driver environment ships (recorded as-is; the *relative* build-vs-load
comparison runs both paths in the same state).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B16 = dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
           hidden_dim=768, mlp_dim=3072, num_classes=1000)
BS = 256

_CHILD = r"""
import json, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from peekvit_tpu.serving import load_serving_bundle
t0 = time.time()
srv = load_serving_bundle({path!r})
x = jax.random.normal(jax.random.key(0), ({bs}, 224, 224, 3), jnp.bfloat16)
logits = srv(x)
float(jnp.sum(logits))  # sync
print(json.dumps({{"load_s": time.time() - t0}}))
"""


def main():
    assert jax.default_backend() == "tpu", "bundle benchmark needs the TPU"
    from bench import device_seconds_per_iter
    from peekvit_tpu.inference import InferenceEngine
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.serving import save_serving_bundle

    repo = os.path.join(os.path.dirname(__file__), "..")
    x = jax.random.normal(jax.random.key(0), (BS, 224, 224, 3), jnp.bfloat16)
    out = {"batch_size": BS}

    t0 = time.time()
    model = build_model("vit", B16)
    model.params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                                model.params)
    eng = InferenceEngine(model)
    float(jnp.sum(eng(x)))  # first call: trace + compile + run
    out["build_s"] = round(time.time() - t0, 2)
    print(json.dumps({"build_s": out["build_s"]}), flush=True)

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "vit_b16_bs256")
    t0 = time.time()
    save_serving_bundle(eng, path, x)
    out["export_s"] = round(time.time() - t0, 2)
    out["bundle_mb"] = round(sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
    ) / 1e6, 1)
    print(json.dumps({k: out[k] for k in ("export_s", "bundle_mb")}),
          flush=True)

    # fresh process: no in-process jit cache; the axon tunnel is
    # single-client, so the parent must not touch the TPU while the child
    # runs — the child is the only job between here and its exit
    child = subprocess.run(
        [sys.executable, "-c",
         _CHILD.format(repo=os.path.abspath(repo), path=path, bs=BS)],
        capture_output=True, text=True, timeout=900, cwd=repo)
    assert child.returncode == 0, child.stderr[-2000:]
    out["load_s"] = round(json.loads(
        child.stdout.strip().splitlines()[-1])["load_s"], 2)
    print(json.dumps({"load_s": out["load_s"]}), flush=True)

    # steady state: live engine vs reloaded bundle (this process)
    from peekvit_tpu.serving import load_serving_bundle

    srv = load_serving_bundle(path)

    def step_live(params, xx, carry):
        return jnp.sum(eng._fn(params, xx.at[0, 0, 0, 0].add(
            (carry * 0).astype(xx.dtype))))

    def step_bundle(params, xx, carry):
        return jnp.sum(srv._call(params, xx.at[0, 0, 0, 0].add(
            (carry * 0).astype(xx.dtype))))

    t_live = min(device_seconds_per_iter(step_live, (eng.params, x), reps=20)
                 for _ in range(3))
    t_srv = min(device_seconds_per_iter(step_bundle, (srv.params, x),
                                        reps=20) for _ in range(3))
    out["steady_state"] = {
        "live_img_s": round(BS / t_live, 1),
        "bundle_img_s": round(BS / t_srv, 1),
        "ratio": round(t_live / t_srv, 4),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "serving_bundle.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
