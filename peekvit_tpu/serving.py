"""Deployable serving bundles for compiled inference engines.

A bundle packages, into one directory:

1. the engine's traced computation as serialized StableHLO
   (``jax.export`` — a version-stable format loadable WITHOUT the model
   zoo, config system, or any model-building code on the serving host),
2. the PREPARED parameter tree exactly as the engine computed it at
   build time (bf16-cast, (1, k) pre-shaped vectors, LN affines folded,
   one-call weight stacks, int8 weights + scales — see
   ``inference.prepare_engine_params``), stored as raw bytes in an npz
   with dtypes/shapes in the metadata (numpy cannot natively round-trip
   bfloat16), and
3. ``meta.json`` describing the call signature (batch geometry, budget
   mode, export platform, format version).

The PyTorch reference has no counterpart — it serves from the live
module inside the eval loop (``/root/reference/validate/test.py:113-124``).
This is the TPU-native deployment story: the artifact leaves the
training repo and is servable with jax + numpy alone.

What the bundle does and does not remove: StableHLO is the portable
layer, so XLA still compiles it once per serving process (enable jax's
persistent compilation cache on the host to make that a disk hit across
restarts). What it removes is model construction, parameter preparation
(quantization / calibration / folding / stacking), and tracing — none
of which need to exist on the serving host.

Shapes are static (the engines are static-shape by design — Mosaic
kernels bake the batch geometry), so one traced program serves one batch
size; :func:`save_bucketed_bundle` exports several batch-size buckets in
one artifact and serves ANY batch up to the largest via zero-row padding
(inference math is per-image, so pad rows are inert — except the
batch-coupled non-learnable budget-token residual family, which serves
exact bucket sizes only). A reloaded bundle is a fresh XLA
compilation of the serialized StableHLO: on TPU with bf16 engines its
logits can differ from the live engine at bf16 rounding scale (XLA may
pick different fusion/layout choices for the same program — measured
~0.03 absolute on ViT-B-width logits); the artifact itself is
deterministic across loads, and fp32 interpret-mode bundles round-trip
bitwise (tests/test_serving.py asserts exact equality there). The single-compile padded RankViT
engine (``max_budget=``) is the recommended mode for a budget knob in
serving: its budget is a traced scalar, so ONE bundle serves every
budget below the cap.

Every engined family exports: plain ViT (bf16 + int8), RankViT (exact
drop: one bundle per budget; padded ``max_budget=``: one bundle, traced
budget), ResidualViT / EncDec (traced budget; classification logits),
EE-Residual (``ee_outputs=True`` exports the full (exits..., final)
tuple), MoE (bf16 + int8), A-ViT, PCT, and RankPCT (exact drop, one
bundle per budget — its ``sample_images`` are (B, N, 3) point clouds;
the metadata's ``image_shape`` records whatever batch geometry the
engine was traced at).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# v2 adds dead-leaf pruning ("dead": true param specs, absent from the
# npz); v3 adds bucketed bundles with one SHARED params file (sub-bundle
# meta carries "params_file"). v1/v2 bundles load unchanged.
FORMAT_VERSION = 3
_ENGINE_FILE = "engine.stablehlo"
_PARAMS_FILE = "params.npz"
_META_FILE = "meta.json"


def _flatten(tree, prefix=""):
    """Nested-dict pytree -> {'a/b/c': leaf}. Engine param trees are pure
    string-keyed dicts (prepare_engine_params builds them that way)."""
    out = {}
    for k, v in tree.items():
        if not isinstance(k, str):
            raise TypeError(f"non-string param key {k!r} is not servable")
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _engine_call_for_export(engine, budget, meta):
    """Pick the traced callable + extra scalar operands for ``engine``,
    filling ``meta``'s budget fields. Shared by the single and bucketed
    exporters."""
    if getattr(engine, "_residual", False):
        if getattr(engine, "_compact_auto", False):
            # token-compaction auto mode: the capacity is STATIC per
            # budget, so the bundle serves budgets <= the export budget
            # with the export budget's capacity (budget itself stays a
            # traced operand)
            if budget is None:
                raise ValueError(
                    "a compact-auto residual engine sizes its capacity "
                    "per budget; pass budget= to export a bundle whose "
                    "capacity fits that budget (or build the engine with "
                    "compact=<capacity fraction> for one traced-budget "
                    "bundle)")
            b = float(budget)
            meta["budget_mode"] = "traced"
            meta["max_budget"] = b
            return engine._compact_fn_for(b), (jnp.float32(b),)
        meta["budget_mode"] = "traced"
        meta["max_budget"] = 1.0
        return engine._fn, (jnp.float32(1.0 if budget is None else budget),)
    if getattr(engine, "_rank_layers", ()):
        if getattr(engine, "_rank_max_budget", None) is not None:
            meta["budget_mode"] = "traced"
            meta["max_budget"] = float(engine._rank_max_budget)
            return engine._fn, (jnp.float32(
                engine._rank_max_budget if budget is None else budget),)
        if budget is None:
            raise ValueError(
                "an exact-drop ranking engine compiles one geometry "
                "per budget; pass budget= to export one bundle per "
                "served budget (RankViT engines can instead be built "
                "with max_budget= for a single traced-budget bundle)")
        # build (or reuse) the per-budget jitted fn the engine itself
        # would dispatch to, without running it
        b = float(budget)
        if b not in engine._rank_fns:
            import functools

            from peekvit_tpu.inference import rankvit_forward_fused

            fwd = getattr(engine, "_rank_fwd", rankvit_forward_fused)
            engine._rank_fns[b] = engine._jit_noise(
                functools.partial(fwd, budget=b, **engine._rank_common))
        meta["budget_mode"] = "static"
        meta["budget"] = b
        return engine._rank_fns[b], ()
    return engine._fn, ()


def _export_pruned(engine, fn, x, extras):
    """Trace + serialize one program; identify dead param leaves.

    Dead-leaf pruning: the prepared tree carries redundant weight copies
    by design (per-layer originals + _folded_* + _stacked_layers — the
    live engine keeps all three so every dispatch path works), but the
    TRACED program reads exactly one set. jax.export's
    module_kept_var_idx says which flattened inputs the lowered module
    actually consumes (indices over jax.tree.flatten of the call args,
    params first); everything else is a dead argument whose VALUE never
    matters — store only its aval and rebuild a zeros placeholder at
    load (the wrapper's zeros are DCE'd with the dead argument before
    execution). ViT-B/16 bf16: 443 MB -> ~180 MB on the one-call path.
    """
    exported = jax.export.export(fn)(engine.params, x, *extras)
    flat = _flatten(engine.params)
    ordered = jax.tree.leaves(_unflatten({k: k for k in flat}))
    kept = set(exported.module_kept_var_idx)
    dead = {ordered[i] for i in range(len(ordered)) if i not in kept}
    return exported.serialize(), flat, dead


def _param_specs(flat, dead):
    """meta['params'] entries from device leaves — dtype/shape only, no
    host transfer (dead leaves' bytes are never fetched anywhere)."""
    return {
        k: {"dtype": str(v.dtype), "shape": list(v.shape),
            **({"dead": True} if k in dead else {})}
        for k, v in flat.items()
    }


def _write_params_npz(npz_path, flat, live_keys):
    """Fetch ONLY the live leaves to host and write them (numpy cannot
    natively round-trip bfloat16 — stored as raw bytes, dtype in meta)."""
    raw = {k: np.ascontiguousarray(np.asarray(flat[k]))
           for k in sorted(live_keys)}
    np.savez(npz_path,
             **{k: v.view(np.uint8).reshape(-1) if v.dtype.name == "bfloat16"
                else v for k, v in raw.items()})


def _check_exportable(engine):
    if getattr(engine, "_mesh", None) is not None:
        raise NotImplementedError(
            "serving bundles are single-device artifacts; export the "
            "engine without mesh= and shard at the serving layer")
    if getattr(engine, "_noise", None) is not None:
        raise NotImplementedError(
            "noise-sweep engines are an evaluation tool; build the "
            "engine from a model without noise_args to export it")


def _base_meta(engine, x):
    meta = {
        "format_version": FORMAT_VERSION,
        "platform": jax.default_backend(),
        "image_shape": list(x.shape),
        "image_dtype": str(x.dtype),
        "budget_mode": "none",
    }
    if getattr(engine, "_batch_coupled", False):
        # non-learnable budget-token residual models: gate thresholds use
        # a whole-batch budget-token mean, so one image's outputs depend
        # on its batchmates — serving layers must not zero-pad batches
        meta["batch_coupled"] = True
    return meta


def save_serving_bundle(engine, path: str, sample_images,
                        budget: Optional[float] = None) -> str:
    """Export ``engine`` (an ``inference.InferenceEngine``) called on
    ``sample_images``-shaped batches into a bundle directory at ``path``.

    ``budget`` is REQUIRED for an exact-drop RankViT engine (each budget
    is its own compiled geometry — one bundle per budget) and OPTIONAL
    for padded (``max_budget=``) and ResidualViT engines, whose budget
    is a traced scalar baked into one artifact.
    """
    _check_exportable(engine)
    x = jnp.asarray(sample_images)
    meta = _base_meta(engine, x)
    fn, extras = _engine_call_for_export(engine, budget, meta)
    blob, flat, dead = _export_pruned(engine, fn, x, extras)
    meta["params"] = _param_specs(flat, dead)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ENGINE_FILE), "wb") as f:
        f.write(blob)
    _write_params_npz(os.path.join(path, _PARAMS_FILE), flat,
                      [k for k in flat if k not in dead])
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return path


class ServingEngine:
    """A loaded bundle: ``engine(images[, budget=])`` like the live
    ``InferenceEngine``, from the serialized artifact alone."""

    def __init__(self, call, params, meta):
        self._call = call
        self.params = params
        self.meta = meta

    @property
    def batch_sizes(self) -> tuple:
        """Batch geometries this artifact serves (one for a plain bundle)."""
        return (self.meta["image_shape"][0],)

    def __call__(self, images, budget: Optional[float] = None):
        want = tuple(self.meta["image_shape"])
        if tuple(images.shape) != want:
            raise ValueError(
                f"bundle was exported for image batches of shape {want}, "
                f"got {tuple(images.shape)} — export one bundle per "
                "served batch size (engine shapes are static)")
        mode = self.meta["budget_mode"]
        if mode == "none":
            if budget is not None:
                raise ValueError("bundle has no budget knob")
            return self._call(self.params, jnp.asarray(images))
        if mode == "static":
            if budget is not None and float(budget) != self.meta["budget"]:
                raise ValueError(
                    f"bundle was exported at static budget "
                    f"{self.meta['budget']}; got {budget}")
            return self._call(self.params, jnp.asarray(images))
        b = 1.0 if budget is None else float(budget)
        if b > self.meta["max_budget"] + 1e-9:
            raise ValueError(
                f"budget {b} exceeds the bundle's max_budget "
                f"{self.meta['max_budget']}")
        return self._call(self.params, jnp.asarray(images), jnp.float32(b))


def _tile_batch(x, n: int):
    """First ``n`` rows of ``x``, tiling it if ``n`` exceeds its batch."""
    reps = -(-n // x.shape[0])
    return jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:n]


def save_bucketed_bundle(engine, path: str, sample_images,
                         batch_sizes, budget: Optional[float] = None) -> str:
    """Export one traced program per batch-size BUCKET under ``path``
    (engine shapes are static), sharing ONE ``params.npz`` (the prepared
    tree is batch-size-independent; the stored set is the union of each
    bucket's live leaves, fetched from device once). Each ``b{n}/``
    sub-directory holds that bucket's StableHLO + meta; the top-level
    ``meta.json`` names the buckets. :func:`load_serving_bundle` on
    ``path`` returns a :class:`BucketedServingEngine` that serves ANY
    batch size up to the largest bucket: inputs pad with zero rows to the
    smallest bucket that fits and outputs slice back. Inference math is
    per-image for every engine family EXCEPT residual models with a
    non-``learnable`` budget token (whole-batch budget-token mean in the
    gate threshold) — those export fine but refuse padded calls: only
    exact bucket sizes serve (include bucket 1 to serve request-at-a-time).
    """
    _check_exportable(engine)
    buckets = sorted(set(int(b) for b in batch_sizes))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"batch_sizes must be positive ints: {batch_sizes}")
    x = jnp.asarray(sample_images)
    os.makedirs(path, exist_ok=True)

    # trace every bucket first: the live-leaf set differs per geometry
    # (e.g. small batches dispatch the per-layer kernels, large ones the
    # one-call stacked weights), so the shared npz stores the union
    union_live, per_bucket, flat = set(), {}, None
    sub_meta0 = None
    for n in buckets:
        xb = _tile_batch(x, n)
        meta = _base_meta(engine, xb)
        fn, extras = _engine_call_for_export(engine, budget, meta)
        blob, flat, dead = _export_pruned(engine, fn, xb, extras)
        meta["params"] = _param_specs(flat, dead)
        meta["params_file"] = f"../{_PARAMS_FILE}"
        per_bucket[n] = (blob, meta)
        union_live |= {k for k in flat if k not in dead}
        sub_meta0 = sub_meta0 or meta

    _write_params_npz(os.path.join(path, _PARAMS_FILE), flat, union_live)
    for n, (blob, meta) in per_bucket.items():
        sub = os.path.join(path, f"b{n}")
        os.makedirs(sub, exist_ok=True)
        with open(os.path.join(sub, _ENGINE_FILE), "wb") as f:
            f.write(blob)
        with open(os.path.join(sub, _META_FILE), "w") as f:
            json.dump(meta, f, indent=1)

    meta = {"format_version": FORMAT_VERSION, "buckets": buckets,
            "platform": sub_meta0["platform"],
            "image_shape": [buckets[-1]] + sub_meta0["image_shape"][1:],
            "image_dtype": sub_meta0["image_dtype"],
            "budget_mode": sub_meta0["budget_mode"]}
    for k in ("budget", "max_budget", "batch_coupled"):
        if k in sub_meta0:
            meta[k] = sub_meta0[k]
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return path


class BucketedServingEngine:
    """Several batch-geometry buckets of one exported engine behind a
    single flexible-batch ``__call__``: any batch up to the largest
    bucket runs on the smallest bucket that fits (zero-row padding,
    outputs sliced back to the true batch)."""

    def __init__(self, engines: dict, meta):
        self._engines = dict(sorted(engines.items()))
        self.meta = meta

    @property
    def batch_sizes(self) -> tuple:
        return tuple(self._engines)

    def __call__(self, images, budget: Optional[float] = None):
        x = jnp.asarray(images)
        want = tuple(self.meta["image_shape"][1:])
        if tuple(x.shape[1:]) != want:
            raise ValueError(
                f"bundle serves items of shape {want}, got batches of "
                f"{tuple(x.shape[1:])}")
        n = x.shape[0]
        fit = [b for b in self._engines if b >= n]
        if not fit:
            raise ValueError(
                f"batch {n} exceeds the largest exported bucket "
                f"{max(self._engines)} — split the batch or re-export "
                "with a larger bucket")
        bucket = fit[0]
        if bucket != n:
            if self.meta.get("batch_coupled"):
                raise ValueError(
                    f"batch {n} needs zero-padding to bucket {bucket}, but "
                    "this model's gate thresholds use a whole-batch "
                    "budget-token mean (pad rows would perturb real "
                    "outputs) — send exact bucket sizes "
                    f"{self.batch_sizes}, or export with bucket 1")
            x = jnp.concatenate(
                [x, jnp.zeros((bucket - n,) + x.shape[1:], x.dtype)])
        out = self._engines[bucket](x, budget=budget)
        return jax.tree.map(lambda v: v[:n], out) if bucket != n else out


def load_serving_bundle(path: str, _cache: Optional[dict] = None):
    """Load a bundle saved by :func:`save_serving_bundle` (returns a
    :class:`ServingEngine`) or :func:`save_bucketed_bundle` (returns a
    :class:`BucketedServingEngine`). Needs jax + numpy only — no model
    zoo, no config, no preparation code."""
    import ml_dtypes  # jax dependency, provides the bfloat16 numpy dtype

    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    if "buckets" in meta:
        # one device copy of each shared leaf across all buckets
        cache = {}
        engines = {n: load_serving_bundle(os.path.join(path, f"b{n}"),
                                          _cache=cache)
                   for n in meta["buckets"]}
        return BucketedServingEngine(engines, meta)
    if meta.get("format_version") not in (1, 2, FORMAT_VERSION):
        raise ValueError(
            f"bundle format {meta.get('format_version')} not in (1, 2, "
            f"{FORMAT_VERSION}) (this library)")
    if meta["platform"] != jax.default_backend():
        raise ValueError(
            f"bundle was exported for platform {meta['platform']!r}; this "
            f"process runs {jax.default_backend()!r} (StableHLO lowers "
            "platform-specifically — re-export on the serving platform)")
    with open(os.path.join(path, _ENGINE_FILE), "rb") as f:
        exported = jax.export.deserialize(f.read())
    # v3 bucketed sub-bundles share their parent's params file
    npz = np.load(os.path.join(path, meta.get("params_file", _PARAMS_FILE)))
    flat, dead = {}, {}
    for key, spec in meta["params"].items():
        if spec.get("dead"):
            # pruned dead argument: the module never reads it — only its
            # aval must match. The zeros below are constants inside the
            # jitted wrapper and are DCE'd along with the dead argument.
            dead[key] = (tuple(spec["shape"]), spec["dtype"])
            continue
        if _cache is not None and key in _cache:
            flat[key] = _cache[key]
            continue
        arr = npz[key]
        if spec["dtype"] == "bfloat16":
            arr = arr.view(ml_dtypes.bfloat16).reshape(spec["shape"])
        flat[key] = jnp.asarray(arr)
        if _cache is not None:
            _cache[key] = flat[key]

    if dead:
        def call(params, *rest):
            full = dict(_flatten(params))
            for key, (shape, dtype) in dead.items():
                full[key] = jnp.zeros(shape, dtype)
            return exported.call(_unflatten(full), *rest)
    else:
        call = exported.call
    return ServingEngine(jax.jit(call), _unflatten(flat), meta)


def _main(argv=None):
    """Minimal serving-host CLI::

        python -m peekvit_tpu.serving BUNDLE INPUT.npy \\
            [--budget B] [--out OUT.npy] [--bench N]

    Loads the bundle, runs the .npy batch (which must match the exported
    batch geometry), optionally saves the outputs (.npy, or .npz with
    ``out_0..`` keys for tuple-output bundles) and times N steady-state
    calls. This is the whole deployment surface: no model zoo, config
    system, or preparation code is imported.
    """
    import argparse
    import time

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("bundle")
    p.add_argument("input", help=".npy batch matching meta.image_shape")
    p.add_argument("--budget", type=float, default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--bench", type=int, default=0,
                   help="wall-clock N calls after warmup")
    args = p.parse_args(argv)

    def sync(out):
        # scalar fetch, not block_until_ready: fetching a value always
        # waits for the program, including on remote-transport backends
        # where block_until_ready can be a no-op
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        return out

    srv = load_serving_bundle(args.bundle)
    x = jnp.asarray(np.load(args.input))
    out = sync(srv(x, budget=args.budget))
    leaves = jax.tree.leaves(out)
    info = {"bundle": args.bundle,
            "outputs": [list(v.shape) for v in leaves],
            "budget_mode": srv.meta["budget_mode"]}
    if args.bench:
        t0 = time.time()
        for _ in range(args.bench):
            sync(srv(x, budget=args.budget))
        dt = (time.time() - t0) / args.bench
        info["ms_per_batch"] = round(dt * 1000, 3)
        info["items_per_s"] = round(x.shape[0] / dt, 1)
    if args.out:
        if len(leaves) == 1:
            np.save(args.out, np.asarray(leaves[0]))
        else:
            np.savez(args.out, **{f"out_{i}": np.asarray(v)
                                  for i, v in enumerate(leaves)})
        info["saved"] = args.out
    print(json.dumps(info))
    return info


if __name__ == "__main__":
    _main()
