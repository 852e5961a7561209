"""Online serving host: dynamic micro-batching + an HTTP front end over
an exported serving bundle.

The PyTorch reference serves from the live module inside an offline eval
loop (``/root/reference/validate/test.py:113-124``); this module is the
deployment-side counterpart for the TPU engines: concurrent single-image
(or small-batch) requests coalesce into engine-sized batches so the MXU
always sees the batch geometry it was exported for, instead of one
dispatch per request.

Two layers, both usable on their own:

- :class:`MicroBatcher` — in-process request aggregation.
  ``submit(images[, budget]) -> Future``; a dispatcher thread drains
  same-budget runs of the queue, concatenates them up to the largest
  exported bucket, zero-pads to the smallest bucket that fits (see
  ``serving.BucketedServingEngine`` — pad rows are inert because engine
  inference math is per-image), runs ONE engine call, and slices results
  back per request. Requests with different budgets never share a batch
  (budget is a whole-batch operand for traced-budget bundles).
- :func:`build_server` / the CLI — a threaded HTTP server on top:
  ``POST /predict`` with an ``.npy`` body (one item or a batch; optional
  ``X-Budget`` header) answers with ``.npy`` logits (``.npz`` with
  ``out_0..`` keys for tuple-output bundles); ``GET /healthz`` and
  ``GET /stats`` report liveness and batching counters. stdlib-only, so
  the serving host needs jax + numpy and nothing else, like the bundles.

Batch-coupled models (non-learnable budget-token residual ViTs, whose
gate thresholds take a whole-batch budget-token mean): aggregation
composes requests into one batch exactly like the reference's own
batched eval loop does, but zero-PADDING would inject fake rows into
that mean, so for bundles marked ``batch_coupled`` the batcher only
dispatches exact bucket sizes (export with bucket 1 to serve
request-at-a-time).

CLI::

    python -m peekvit_tpu.serving_host BUNDLE [--port 8390]
        [--max-delay-ms 5] [--timeout-s 60]
"""

from __future__ import annotations

import io
import json
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from peekvit_tpu.serving import load_serving_bundle


class MicroBatcher:
    """Aggregate concurrent requests into engine-sized batches.

    ``engine`` is a loaded bundle (``ServingEngine`` or
    ``BucketedServingEngine``) or anything with the same surface
    (``__call__(images, budget=)``, ``.meta``, ``.batch_sizes``).
    ``max_delay_ms`` bounds how long a request waits for batchmates once
    it is at the head of the queue; a full batch dispatches immediately.
    ``max_queue_items`` is the overload bound: submits beyond it raise
    RuntimeError (the HTTP layer answers 503) instead of growing an
    unbounded backlog the engine can never drain. Requests whose Future
    was cancelled (e.g. an HTTP caller timing out) are shed before
    dispatch, so abandoned work never reaches the device.
    """

    def __init__(self, engine, max_delay_ms: float = 5.0,
                 max_queue_items: Optional[int] = None,
                 pipeline_fetches: int = 4):
        self.engine = engine
        self._buckets = tuple(sorted(engine.batch_sizes))
        self._item_shape = tuple(engine.meta["image_shape"][1:])
        self._coupled = bool(engine.meta.get("batch_coupled"))
        self._max_delay = max_delay_ms / 1000.0
        self._max_items = (8 * self._buckets[-1] if max_queue_items is None
                           else int(max_queue_items))
        self._cv = threading.Condition()
        self._queue = []  # [(rows ndarray, budget, Future)]
        self._queued_items = 0
        self._closed = False
        # Per-dispatch cost breakdown (VERDICT r4 #5): host-side batch
        # assembly, engine DISPATCH (jax returns after enqueue), the
        # device->host result fetch, and future delivery — so a plateau
        # can be attributed (on this environment the axon tunnel's fetch
        # RTT dominates; a PCIe-attached host pays ~none of it).
        self.stats = {"requests": 0, "items": 0, "batches": 0,
                      "padded_rows": 0, "errors": 0, "shed": 0,
                      "rejected": 0, "t_concat_ms": 0.0,
                      "t_dispatch_ms": 0.0, "t_fetch_ms": 0.0,
                      "t_deliver_ms": 0.0}
        self._stats_lock = threading.Lock()
        # Fetch/dispatch OVERLAP: result fetches run on a small completer
        # pool so the dispatcher keeps feeding the device while earlier
        # batches' fetches are still in flight (the fetch is pure wire
        # time — serializing it behind dispatch caps throughput at
        # 1/RTT batches). pipeline_fetches=0 restores the serial path
        # (the bench's attribution control). The semaphore bounds
        # in-flight completions so dispatch cannot run unboundedly ahead.
        self._completers = None
        self._inflight = None
        if pipeline_fetches > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._completers = ThreadPoolExecutor(
                max_workers=pipeline_fetches, thread_name_prefix="mb-fetch")
            self._inflight = threading.Semaphore(2 * pipeline_fetches)
        self._thread = threading.Thread(
            target=self._loop, name="microbatcher", daemon=True)
        self._thread.start()

    def _bump(self, key: str, ms: float) -> None:
        with self._stats_lock:
            self.stats[key] += ms

    # -- client surface ---------------------------------------------------

    def submit(self, images, budget: Optional[float] = None) -> Future:
        """Queue one item (item-shaped) or one batch (batch-shaped);
        returns a Future resolving to the engine outputs for exactly the
        submitted rows (leading axis preserved)."""
        x = np.asarray(images)
        if x.shape == self._item_shape:
            x = x[None]
        if x.shape[1:] != self._item_shape or x.ndim != \
                len(self._item_shape) + 1:
            raise ValueError(
                f"expected items of shape {self._item_shape} (or batches "
                f"of them), got {x.shape}")
        if not 1 <= x.shape[0] <= self._buckets[-1]:
            raise ValueError(
                f"request batch {x.shape[0]} must be 1..{self._buckets[-1]}"
                " (the largest exported bucket) — split larger requests")
        if self._coupled and x.shape[0] not in self._buckets:
            raise ValueError(
                f"this bundle is batch-coupled (whole-batch budget-token "
                f"mean): requests must exactly match a bucket "
                f"{self._buckets} — no padding, no aggregation")
        fut = Future()
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            if self._queued_items + x.shape[0] > self._max_items:
                self.stats["rejected"] += 1
                raise RuntimeError(
                    f"overloaded: {self._queued_items} items queued "
                    f"(max_queue_items={self._max_items}) — retry later")
            self._queue.append((x, budget, fut))
            self._queued_items += x.shape[0]
            self.stats["requests"] += 1
            self.stats["items"] += x.shape[0]
            self._cv.notify_all()
        return fut

    def predict(self, images, budget: Optional[float] = None,
                timeout: Optional[float] = None):
        return self.submit(images, budget=budget).result(timeout)

    def close(self) -> None:
        """Stop accepting work, flush the queue, join the dispatcher and
        any in-flight result fetches."""
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join()
        if self._completers is not None:
            self._completers.shutdown(wait=True)

    # -- dispatcher --------------------------------------------------------

    def _head_run(self):
        """(rows, budget) aggregable at the queue head right now: the
        longest same-budget prefix that fits the largest bucket."""
        budget, n = self._queue[0][1], 0
        for x, b, _ in self._queue:
            if b != budget or n + x.shape[0] > self._buckets[-1]:
                break
            n += x.shape[0]
        return n, budget

    def _shed_cancelled(self):
        """Drop queue entries whose caller gave up (Future cancelled) so
        abandoned work never reaches the device. Lock held by caller."""
        keep = []
        for entry in self._queue:
            if entry[2].cancelled():
                self.stats["shed"] += 1
                self._queued_items -= entry[0].shape[0]
            else:
                keep.append(entry)
        self._queue = keep

    def _loop(self):
        while True:
            with self._cv:
                self._shed_cancelled()
                while not self._queue and not self._closed:
                    self._cv.wait()
                    self._shed_cancelled()
                if not self._queue:
                    return  # closed and drained
                # wait (bounded) for batchmates unless already full;
                # batch-coupled bundles dispatch requests as submitted
                deadline = time.monotonic() + self._max_delay
                while not self._coupled and not self._closed:
                    n, _ = self._head_run()
                    rem = deadline - time.monotonic()
                    if n >= self._buckets[-1] or rem <= 0:
                        break
                    self._cv.wait(rem)
                    self._shed_cancelled()
                    if not self._queue:
                        break
                if not self._queue:
                    continue
                if self._coupled:
                    batch = [self._queue.pop(0)]
                    n = batch[0][0].shape[0]
                    budget = batch[0][1]
                else:
                    n, budget = self._head_run()
                    batch, got = [], 0
                    while got < n:
                        item = self._queue.pop(0)
                        batch.append(item)
                        got += item[0].shape[0]
                self._queued_items -= n
            self._dispatch(batch, n, budget)

    def _dispatch(self, batch, n, budget):
        t0 = time.monotonic()
        try:
            rows = (batch[0][0] if len(batch) == 1
                    else np.concatenate([x for x, _, _ in batch]))
            # pad here so plain single-geometry bundles batch too; the
            # coupled case never reaches this (exact bucket enforced)
            bucket = min(b for b in self._buckets if b >= n)
            if bucket != n:
                rows = np.concatenate(
                    [rows, np.zeros((bucket - n,) + rows.shape[1:],
                                    rows.dtype)])
            t1 = time.monotonic()
            out = self.engine(jnp.asarray(rows), budget=budget)
            t2 = time.monotonic()
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["padded_rows"] += bucket - n
                self.stats["t_concat_ms"] += (t1 - t0) * 1e3
                self.stats["t_dispatch_ms"] += (t2 - t1) * 1e3
        except Exception as e:  # deliver, don't kill the dispatcher
            with self._stats_lock:
                self.stats["errors"] += 1
            for _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
            return
        if self._completers is None:
            self._complete(out, batch)
            return
        self._inflight.acquire()

        def task():
            try:
                self._complete(out, batch)
            finally:
                self._inflight.release()

        self._completers.submit(task)

    def _complete(self, out, batch):
        """Fetch device results and resolve futures (completer stage)."""
        t0 = time.monotonic()
        try:
            leaves, treedef = jax.tree.flatten(out)
            leaves = [np.asarray(v) for v in leaves]
            t1 = time.monotonic()
            off = 0
            for x, _, fut in batch:
                k = x.shape[0]
                if not fut.cancelled():  # caller may have timed out
                    fut.set_result(jax.tree.unflatten(
                        treedef, [v[off:off + k] for v in leaves]))
                off += k
            t2 = time.monotonic()
            self._bump("t_fetch_ms", (t1 - t0) * 1e3)
            self._bump("t_deliver_ms", (t2 - t1) * 1e3)
        except Exception as e:
            with self._stats_lock:
                self.stats["errors"] += 1
            for _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)


def build_server(batcher: MicroBatcher, port: int = 0,
                 timeout_s: float = 60.0, backlog: int = 128):
    """A ``ThreadingHTTPServer`` (bound to 127.0.0.1 — front it with a
    real proxy to expose it) serving ``POST /predict`` / ``GET /healthz``
    / ``GET /stats`` over ``batcher``. Caller runs ``serve_forever()``
    (or ``handle_request()``) and ``server_close()``.

    ``backlog`` raises socketserver's default listen queue of 5, which
    resets connections under concurrent load. A request that times out
    (no result in ``timeout_s``) answers 503 and CANCELS its queue entry
    so the batcher sheds it; an overloaded batcher (queue cap) answers
    503 immediately."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Server(ThreadingHTTPServer):
        request_queue_size = backlog

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet: stats are GET /stats
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True,
                                 "buckets": list(batcher._buckets)})
            elif self.path == "/stats":
                self._json(200, dict(batcher.stats,
                                     buckets=list(batcher._buckets)))
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": f"no route {self.path}"})
                return
            fut = None
            try:
                size = int(self.headers.get("Content-Length", "0"))
                arr = np.load(io.BytesIO(self.rfile.read(size)),
                              allow_pickle=False)
                budget = self.headers.get("X-Budget")
                fut = batcher.submit(
                    arr, budget=None if budget is None else float(budget))
                out = fut.result(timeout_s)
            except (ValueError, TypeError) as e:
                self._json(400, {"error": str(e)})
                return
            except RuntimeError as e:  # queue cap / closed -> back off
                self._json(503, {"error": str(e)})
                return
            except TimeoutError:
                if fut is not None:
                    fut.cancel()  # shed: never run work nobody awaits
                self._json(503, {"error": f"no result in {timeout_s}s"})
                return
            except Exception as e:  # engine failure surfaced via Future
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            leaves = jax.tree.leaves(out)
            buf = io.BytesIO()
            if len(leaves) == 1:
                np.save(buf, np.asarray(leaves[0]))
                ctype = "application/x-npy"
            else:
                np.savez(buf, **{f"out_{i}": np.asarray(v)
                                 for i, v in enumerate(leaves)})
                ctype = "application/x-npz"
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Server(("127.0.0.1", port), Handler)


def _main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Serve an exported bundle over HTTP with dynamic "
                    "micro-batching")
    p.add_argument("bundle")
    p.add_argument("--port", type=int, default=8390)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--timeout-s", type=float, default=60.0)
    p.add_argument("--pipeline-fetches", type=int, default=4,
                   help="completer threads overlapping device->host result "
                        "fetches with dispatch (0 = serial)")
    args = p.parse_args(argv)

    batcher = MicroBatcher(load_serving_bundle(args.bundle),
                           max_delay_ms=args.max_delay_ms,
                           pipeline_fetches=args.pipeline_fetches)
    httpd = build_server(batcher, port=args.port, timeout_s=args.timeout_s)
    print(json.dumps({"serving": f"http://127.0.0.1:{httpd.server_port}",
                      "buckets": list(batcher._buckets),
                      "budget_mode": batcher.engine.meta["budget_mode"]}),
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        batcher.close()


if __name__ == "__main__":
    _main()
