"""Online-serving load test: the HTTP micro-batching host on a real TPU.

Measures what a deployment actually sees — end-to-end request latency
(client -> HTTP -> micro-batcher -> TPU -> response) and sustained
throughput — for the ViT-B/16 bf16 engine exported as a bucketed bundle,
under closed-loop concurrent clients posting single-image requests.
Writes benchmarks/serving_host.json.

Reading the numbers (attribution settled round 5, VERDICT r4 #5): the
per-dispatch breakdown puts ~95%+ of loaded batch time in ``t_fetch`` —
the axon tunnel's device->host result fetch — and the two controls
bound the environment: ``control_device_only_img_s`` (~4.7k, the
on-device engine) vs ``control_fetch_per_batch_img_s`` (~292 — bs64
batches with ONE uncontended result fetch each and no host/HTTP code at
all). Any serving stack on this environment is fetch-bound 16x below
the engine; the committed req/s rows are environment numbers, not host
overhead (host-side concat+deliver is <1 ms/batch; HTTP + client
threads add 1-core CPU contention on top — in-process no-HTTP levels
run ~1.5x the HTTP levels). What IS architecture: the completer pool
overlapping fetches with dispatch (MicroBatcher pipeline_fetches) —
measured 58.0 vs 31.8 req/s against the serial-fetch control at 64
in-process clients. On a PCIe-attached host the same fetch is tens of
microseconds and the engine becomes the bound. The BATCHING results
(fill, dispatches vs requests) are environment-independent: the
micro-batcher turns N concurrent singles into N/bucket engine calls.
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models.registry import build_model
from peekvit_tpu.serving import load_serving_bundle, save_bucketed_bundle
from peekvit_tpu.serving_host import MicroBatcher, build_server

B16 = dict(image_size=224, patch_size=16, num_layers=12, num_heads=12,
           hidden_dim=768, mlp_dim=3072, num_classes=1000)
BUCKETS = (1, 8, 64)
LEVELS = (1, 8, 64)           # closed-loop concurrent clients
REQS_PER_CLIENT = 30


def _post(base, body):
    req = urllib.request.Request(base + "/predict", data=body,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.read()


def run_level(base, body, clients):
    lats, errors = [], [0]
    lock = threading.Lock()

    def client():
        mine, errs = [], 0
        for _ in range(REQS_PER_CLIENT):
            t0 = time.monotonic()
            try:
                _post(base, body)
                mine.append(time.monotonic() - t0)
            except Exception:  # count, keep the closed loop running
                errs += 1
        with lock:
            lats.extend(mine)
            errors[0] += errs

    ts = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.monotonic()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.monotonic() - t0
    lats = np.sort(np.asarray(lats))
    n = len(lats)
    return {
        "clients": clients,
        "requests": n,
        "errors": errors[0],
        "req_per_s": round(n / wall, 1),
        "p50_ms": round(float(lats[n // 2]) * 1e3, 2),
        "p99_ms": round(float(lats[int(n * 0.99) - 1]) * 1e3, 2),
    }


def _breakdown(stats, before):
    """Per-batch ms deltas of the dispatch-cost counters."""
    nb = max(1, stats["batches"] - before["batches"])
    return {f"{k}_per_batch": round(
        (stats[k] - before[k]) / nb, 2)
        for k in ("t_concat_ms", "t_dispatch_ms", "t_fetch_ms",
                  "t_deliver_ms")}


def run_inprocess_level(mb, img, clients, reqs=REQS_PER_CLIENT):
    """Closed-loop clients hitting MicroBatcher.submit DIRECTLY — the
    no-HTTP control separating host/HTTP cost from batcher+engine cost."""
    lats, lock = [], threading.Lock()

    def client():
        mine = []
        for _ in range(reqs):
            t0 = time.monotonic()
            mb.predict(img, timeout=300)
            mine.append(time.monotonic() - t0)
        with lock:
            lats.extend(mine)

    ts = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.monotonic()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.monotonic() - t0
    lats = np.sort(np.asarray(lats))
    n = len(lats)
    return {"clients": clients, "requests": n,
            "req_per_s": round(n / wall, 1),
            "p50_ms": round(float(lats[n // 2]) * 1e3, 2),
            "p99_ms": round(float(lats[int(n * 0.99) - 1]) * 1e3, 2)}


def engine_bound_controls(engine, out):
    """Two upper-bound controls on the SAME loaded bundle:

    - serving-style: batched calls with one device->host fetch per batch
      (what any real host pays; on this environment the axon tunnel's
      fetch RTT dominates it);
    - device-only: the on-device fori_loop rate (no per-batch fetch) —
      the engine capacity the host could approach with fetch overlap.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import device_seconds_per_iter

    bs = max(BUCKETS)
    x = np.asarray(np.random.default_rng(1).normal(
        size=(bs, 224, 224, 3)), np.float32)
    xj = jnp.asarray(x)
    engine(xj)  # warm
    t0 = time.monotonic()
    reps = 20
    for _ in range(reps):
        np.asarray(jax.tree.leaves(engine(xj))[0])
    wall = time.monotonic() - t0
    out["control_fetch_per_batch_img_s"] = round(bs * reps / wall, 1)

    sub = engine._engines[bs]  # the bucket's ServingEngine

    def step(params, xx, carry):
        return jnp.sum(sub._call(params, xx + carry * 0)
                       .astype(jnp.float32))

    t = device_seconds_per_iter(step, (sub.params, xj), reps=20)
    out["control_device_only_img_s"] = round(bs / t, 1)


def main():
    assert jax.default_backend() == "tpu", "serving load test needs the TPU"
    bundle = "/tmp/serving_host_bench_bundle"
    meta_ok = os.path.isfile(os.path.join(bundle, "meta.json"))
    if not meta_ok:
        model = build_model("vit", B16)
        model.params = jax.tree.map(lambda p: p.astype(jnp.bfloat16),
                                    model.params)
        eng = InferenceEngine(model)
        x = jax.random.normal(jax.random.key(0),
                              (max(BUCKETS), 224, 224, 3), jnp.float32)
        print("exporting bucketed bundle...", flush=True)
        save_bucketed_bundle(eng, bundle, x, batch_sizes=BUCKETS)

    mb = MicroBatcher(load_serving_bundle(bundle), max_delay_ms=5.0)
    httpd = build_server(mb, port=0, timeout_s=300)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_port}"

    img = np.asarray(np.random.default_rng(0).normal(
        size=(224, 224, 3)), np.float32)
    buf = io.BytesIO()
    np.save(buf, img)
    body = buf.getvalue()

    # warm every bucket (first XLA compile per geometry)
    for b in BUCKETS:
        bb = io.BytesIO()
        np.save(bb, np.repeat(img[None], b, 0))
        _post(base, bb.getvalue())
    print("warmed", flush=True)

    out = {"buckets": list(BUCKETS), "max_delay_ms": 5.0,
           "model": "vit_b16_bf16_engine", "levels": []}
    for clients in LEVELS:
        before = dict(mb.stats)
        row = run_level(base, body, clients)
        row["dispatches"] = mb.stats["batches"] - before["batches"]
        row["avg_batch_fill"] = round(
            row["requests"] / max(1, row["dispatches"]), 2)
        row.update(_breakdown(mb.stats, before))
        out["levels"].append(row)
        print(json.dumps(row), flush=True)

    # ---- attribution controls (VERDICT r4 #5) -------------------------
    # (a) in-process: same MicroBatcher, no HTTP/client threads posting
    # over sockets — separates HTTP+client cost from batcher+engine cost
    img32 = img.astype(np.float32)
    out["inprocess_levels"] = []
    for clients in LEVELS:
        before = dict(mb.stats)
        row = run_inprocess_level(mb, img32, clients)
        row["dispatches"] = mb.stats["batches"] - before["batches"]
        row["avg_batch_fill"] = round(
            row["requests"] / max(1, row["dispatches"]), 2)
        row.update(_breakdown(mb.stats, before))
        out["inprocess_levels"].append(row)
        print(json.dumps({"inprocess": row}), flush=True)

    # (b) serial-fetch control: pipeline_fetches=0 restores the round-4
    # dispatcher (fetch serialized behind dispatch) — the delta vs the
    # pipelined in-process rows attributes the fetch-overlap win
    mb_serial = MicroBatcher(mb.engine, max_delay_ms=5.0,
                             pipeline_fetches=0)
    before = dict(mb_serial.stats)
    row = run_inprocess_level(mb_serial, img32, max(LEVELS))
    row["dispatches"] = mb_serial.stats["batches"] - before["batches"]
    row.update(_breakdown(mb_serial.stats, before))
    out["inprocess_serial_fetch"] = row
    print(json.dumps({"serial_fetch": row}), flush=True)
    mb_serial.close()

    # (c) engine-bound upper bounds on the same loaded bundle
    engine_bound_controls(mb.engine, out)
    print(json.dumps({k: v for k, v in out.items()
                      if k.startswith("control_")}), flush=True)

    httpd.shutdown()
    httpd.server_close()
    mb.close()
    with open(os.path.join(os.path.dirname(__file__),
                           "serving_host.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
