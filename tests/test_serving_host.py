"""Online serving host: micro-batching semantics + the HTTP surface.

The reference serves from an offline eval loop
(/root/reference/validate/test.py:113-124); these tests pin the
deployment-side contract of peekvit_tpu.serving_host: concurrent
requests coalesce into engine-sized batches, different budgets never
share a batch, results route back to the right caller bitwise, and the
HTTP front end round-trips npy bodies.
"""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peekvit_tpu.inference import InferenceEngine
from peekvit_tpu.models.registry import build_model
from peekvit_tpu.serving import (load_serving_bundle, save_bucketed_bundle,
                                 save_serving_bundle)
from peekvit_tpu.serving_host import MicroBatcher, build_server


def _vit(kind="vit", seed=3, **over):
    spec = dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
                hidden_dim=64, mlp_dim=128, num_classes=7)
    spec.update(over)
    model = build_model(kind, spec, seed=seed)
    model.params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(9), model.params["head"]["kernel"].shape)
    return model


def _x(b=1, seed=0):
    return np.asarray(np.random.default_rng(seed).normal(
        size=(b, 32, 32, 3)), np.float32)


@pytest.fixture(scope="module")
def plain_bundle(tmp_path_factory):
    model = _vit()
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    path = str(tmp_path_factory.mktemp("host") / "plain")
    save_bucketed_bundle(eng, path, _x(4), batch_sizes=(1, 2, 4))
    return path, eng


def test_microbatcher_coalesces_and_routes(plain_bundle):
    """4 concurrent single-image submits -> ONE engine batch; each caller
    gets exactly its own rows, bitwise-equal to a direct engine call."""
    path, eng = plain_bundle
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=200.0)
    try:
        xs = [_x(seed=i) for i in range(4)]
        futs = [mb.submit(x) for x in xs]  # item-shaped also accepted
        outs = [f.result(timeout=60) for f in futs]
        want = np.asarray(eng(jnp.asarray(np.concatenate(xs))))
        for i, out in enumerate(outs):
            assert out.shape == (1, 7)
            np.testing.assert_array_equal(out, want[i:i + 1])
        assert mb.stats["batches"] == 1  # coalesced, not 4 dispatches
        assert mb.stats["requests"] == 4
    finally:
        mb.close()


def test_microbatcher_pads_partial_batches(plain_bundle):
    """3 items at buckets (1,2,4): one padded batch of 4, one pad row."""
    path, eng = plain_bundle
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=150.0)
    try:
        x = _x(b=3, seed=9)
        out = mb.predict(x, timeout=60)
        # padded geometry: inert up to fp rounding (gemm blocking is
        # batch-shape dependent), not bitwise
        np.testing.assert_allclose(out, np.asarray(eng(jnp.asarray(x))),
                                   rtol=0, atol=5e-6)
        assert mb.stats["padded_rows"] == 1
    finally:
        mb.close()


def test_microbatcher_plain_single_geometry_bundle(tmp_path):
    """A plain (non-bucketed) bundle batches too: the batcher pads to its
    one exported geometry."""
    model = _vit(seed=5)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    path = save_serving_bundle(eng, str(tmp_path / "one"), _x(4))
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=50.0)
    try:
        x = _x(seed=2)
        out = mb.predict(x, timeout=60)
        np.testing.assert_allclose(out, np.asarray(eng(jnp.asarray(x))),
                                   rtol=0, atol=5e-6)
        assert mb.stats["padded_rows"] == 3
    finally:
        mb.close()


def test_microbatcher_budget_grouping(tmp_path):
    """Requests with different budgets never share a batch (budget is a
    whole-batch operand); each group matches the engine at its budget."""
    model = _vit("rankvit", rankvit_layers=[1], seed=7)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          max_budget=0.75)
    path = save_bucketed_bundle(eng, str(tmp_path / "rk"), _x(2),
                                batch_sizes=(2, 4))
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=150.0)
    try:
        xa, xb = _x(b=2, seed=1), _x(b=2, seed=2)
        fa = mb.submit(xa, budget=0.5)
        fb = mb.submit(xb, budget=0.25)
        np.testing.assert_array_equal(
            fa.result(60), np.asarray(eng(jnp.asarray(xa), budget=0.5)))
        np.testing.assert_array_equal(
            fb.result(60), np.asarray(eng(jnp.asarray(xb), budget=0.25)))
        assert mb.stats["batches"] == 2
    finally:
        mb.close()


def test_microbatcher_coupled_bundle_no_padding(tmp_path):
    """batch_coupled bundles dispatch requests exactly as submitted:
    exact bucket sizes pass, everything else is rejected at submit."""
    model = build_model(
        "residualvit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=7,
             residual_layers=["attention+mlp"] * 2, gate_type="sigmoid",
             add_budget_token=True),
        seed=11,
    )
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    path = save_bucketed_bundle(eng, str(tmp_path / "cp"), _x(2),
                                batch_sizes=(2,))
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=10.0)
    try:
        x = _x(b=2, seed=3)
        np.testing.assert_array_equal(
            mb.predict(x, budget=0.5, timeout=60),
            np.asarray(eng(jnp.asarray(x), budget=0.5)))
        with pytest.raises(ValueError, match="batch-coupled"):
            mb.submit(_x(seed=4), budget=0.5)
    finally:
        mb.close()


def test_microbatcher_rejects_bad_requests(plain_bundle):
    path, _ = plain_bundle
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=1.0)
    try:
        with pytest.raises(ValueError, match="expected items"):
            mb.submit(np.zeros((16, 16, 3), np.float32))
        with pytest.raises(ValueError, match="split larger"):
            mb.submit(_x(b=5))
        with pytest.raises(ValueError, match="1\\.\\."):
            mb.submit(_x(b=4)[:0])
    finally:
        mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(_x())


def test_microbatcher_overload_cap_and_shedding(plain_bundle):
    """Backpressure: submits beyond max_queue_items raise (HTTP 503), and
    a cancelled Future (caller timed out) is shed before dispatch so
    abandoned work never reaches the engine."""
    import time

    path, _ = plain_bundle
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=300.0,
                      max_queue_items=2)
    try:
        f1 = mb.submit(_x(seed=0))
        f2 = mb.submit(_x(seed=1))
        with pytest.raises(RuntimeError, match="overloaded"):
            mb.submit(_x(seed=2))
        assert mb.stats["rejected"] == 1
        assert f2.cancel()  # pending entry: caller gives up
        assert f1.result(timeout=60).shape == (1, 7)
        deadline = time.monotonic() + 30
        while mb.stats["shed"] < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert mb.stats["shed"] == 1 and f2.cancelled()
    finally:
        mb.close()


def _http(url, data=None, headers=None, method=None):
    req = urllib.request.Request(url, data=data, headers=headers or {},
                                 method=method)
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.headers.get("Content-Type"), \
                resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_http_server_end_to_end(plain_bundle):
    """POST /predict round-trips npy bodies through the batcher; /healthz
    and /stats report; bad input answers 400 without killing the host."""
    path, eng = plain_bundle
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=2.0)
    httpd = build_server(mb, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        status, _, body = _http(f"{base}/healthz")
        assert status == 200 and json.loads(body)["ok"] is True

        x = _x(b=2, seed=8)
        buf = io.BytesIO()
        np.save(buf, x)
        status, ctype, body = _http(f"{base}/predict", data=buf.getvalue(),
                                    method="POST")
        assert status == 200 and ctype == "application/x-npy"
        got = np.load(io.BytesIO(body))
        np.testing.assert_array_equal(got, np.asarray(eng(jnp.asarray(x))))

        bad = io.BytesIO()
        np.save(bad, np.zeros((2, 3), np.float32))
        status, _, body = _http(f"{base}/predict", data=bad.getvalue(),
                                method="POST")
        assert status == 400 and "expected items" in json.loads(body)["error"]

        status, _, body = _http(f"{base}/stats")
        stats = json.loads(body)
        assert status == 200 and stats["requests"] >= 1
        assert stats["buckets"] == [1, 2, 4]

        status, _, _ = _http(f"{base}/nope")
        assert status == 404
    finally:
        httpd.shutdown()
        httpd.server_close()
        mb.close()


def test_http_budget_header(tmp_path):
    model = _vit("rankvit", rankvit_layers=[1], seed=7)
    eng = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True,
                          max_budget=0.75)
    path = save_serving_bundle(eng, str(tmp_path / "rk"), _x(2))
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=2.0)
    httpd = build_server(mb, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        x = _x(b=2, seed=5)
        buf = io.BytesIO()
        np.save(buf, x)
        status, _, body = _http(f"{base}/predict", data=buf.getvalue(),
                                headers={"X-Budget": "0.5"}, method="POST")
        assert status == 200
        np.testing.assert_array_equal(
            np.load(io.BytesIO(body)),
            np.asarray(eng(jnp.asarray(x), budget=0.5)))
        # over the exported cap -> clean 400, not a crashed handler
        status, _, body = _http(f"{base}/predict", data=buf.getvalue(),
                                headers={"X-Budget": "0.9"}, method="POST")
        assert status == 400 and "max_budget" in json.loads(body)["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()
        mb.close()


def test_microbatcher_fetch_pipeline_and_breakdown(plain_bundle):
    """Pipelined result fetches (completer pool) deliver the same results
    as the serial dispatcher, and the per-dispatch cost breakdown
    counters accumulate (VERDICT r4 #5 attribution instrumentation)."""
    path, eng = plain_bundle
    xs = [_x(seed=50 + i) for i in range(6)]
    results = {}
    for fetches in (0, 3):
        mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=20.0,
                          pipeline_fetches=fetches)
        try:
            futs = [mb.submit(x) for x in xs]
            results[fetches] = [f.result(timeout=60) for f in futs]
            stats = dict(mb.stats)
        finally:
            mb.close()
        assert stats["batches"] >= 1
        assert stats["t_dispatch_ms"] > 0.0
        # fetch/deliver timings are recorded by the completer stage too
        assert stats["t_fetch_ms"] >= 0.0
        assert stats["t_deliver_ms"] >= 0.0
    for a, b in zip(results[0], results[3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_microbatcher_pipelined_close_flushes(plain_bundle):
    """close() joins the completer pool: every submitted Future resolves
    even when close races the in-flight fetches."""
    path, _ = plain_bundle
    mb = MicroBatcher(load_serving_bundle(path), max_delay_ms=1.0,
                      pipeline_fetches=2)
    futs = [mb.submit(_x(seed=70 + i)) for i in range(8)]
    mb.close()
    for f in futs:
        assert f.result(timeout=5) is not None
