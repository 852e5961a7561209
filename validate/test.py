"""Eval entry point: budget x noise sweeps with accuracy, effective FLOPs,
throughput and sparsity (reference validate/test.py:35-341).

    python validate/test.py load_from=PATH [overrides...]

``load_from`` may be a checkpoint path, an experiment dir (picks the last
epoch), a list of experiment dirs (cumulative comparison plots), or null
(current experiment dir). Models rebuild from checkpoint metadata when no
model config is given (reference test.py:230-234).

TPU-native details:
- budget and noise are traced operands — the whole sweep reuses ONE
  compiled eval step (the reference re-runs hooked forwards per cell);
- effective FLOPs are computed analytically from the returned masks
  (utils/flops_count.py), replacing the slow ptflops loop and its
  never-reset sparsity accumulator (SURVEY.md §7.17);
- throughput is reported both wall-clock-with-input-pipeline (reference
  test.py:113-124 semantics) and device-only images/sec.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from peekvit_tpu.utils.config import instantiate, load_config, to_plain  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "configs"))
    p.add_argument("--config-name", default="test_config")
    p.add_argument("overrides", nargs="*")
    return p.parse_args(argv)


def validate(model, cfg, dataset, experiment_dir, logger):
    """One experiment's sweep (reference test.py:35-179)."""
    import jax
    import jax.numpy as jnp

    from peekvit_tpu.data.loader import DataLoader, prefetch_to_device
    from peekvit_tpu.training.trainer import _main_logits
    from peekvit_tpu.training.optim import CrossEntropyLoss
    from peekvit_tpu.utils.flops_count import compute_flops, sparsity_per_module

    tcfg = cfg.test
    val_loader = DataLoader(
        dataset.val_dataset, tcfg.test_batch_size,
        num_workers=tcfg.get("num_workers", 8),
    )

    budgets = tcfg.get("budgets") or [1.0]
    if not model.accepts_budget:
        budgets = [None]  # reference budget fallback (test.py:59-65)
    noises = tcfg.get("noises") if cfg.get("noise") else None
    noises = noises or [None]

    if cfg.get("enable_ranking") and hasattr(model.module, "ranking_enabled"):
        model.enable_ranking(True)  # reference test.py:67-69

    apply_fn = model.apply_fn()
    out_fmt = getattr(model.module, "output_format", None)
    criterion = CrossEntropyLoss()

    # fused Pallas engine for the ViT/RankViT/Residual/MoE/A-ViT families
    # (parity-tested in tests/test_inference.py); noise sweeps stay on the
    # engine path too (VERDICT r3 #5) — the engines inject the NoiseBlock
    # in-loop. Falls back to linen when the engine rejects the model/noise
    # combination (A-ViT noise, noise after a ranked layer, odd residual
    # modes).
    engine = None
    if tcfg.get("use_fused_engine", True) and (
        type(model.module).__name__ in
        ("VisionTransformer", "RankVisionTransformer",
         "ResidualVisionTransformer", "VisionTransformerMoE",
         "AdaptiveVisionTransformer", "EEResidualVisionTransformer",
         "ResidualVisionTransformerWithDecoder", "PointCloudTransformer",
         "RankPointCloudTransformer", "MAEVisionTransformer")
    ):
        from peekvit_tpu.inference import InferenceEngine

        try:
            calib = None
            n_calib = int(tcfg.get("calib_images", 0) or 0)
            if tcfg.get("quantized") and n_calib > 0:
                # SmoothQuant (+ optional static caps) calibration drawn
                # from the head of the val set — mirrors the reference's
                # use of the val loader for its FLOPs probe batches
                xs = []
                for bx, _ in val_loader:
                    xs.append(jnp.asarray(bx))
                    if sum(x.shape[0] for x in xs) >= n_calib:
                        break
                calib = jnp.concatenate(xs)[:n_calib]
            # test.tensor_parallel_devices=N: serve TENSOR-parallel over
            # an (all/N, N) mesh — one forward split across N chips
            # (parallel/tp_serving.py); bf16 plain/Rank ViT + ResidualViT
            mesh = None
            tp_n = int(tcfg.get("tensor_parallel_devices", 0) or 0)
            if tp_n > 1:
                from peekvit_tpu.parallel import make_mesh

                mesh = make_mesh(n_model=tp_n)
            # test.compact=true|<capacity float>: ResidualViT token-
            # compaction serving (approximate, VERDICT r4 #1);
            # test.compact_slack raises the per-budget capacity.
            # test.routed=true|<capacity factor>: MoE top-1 routed
            # dispatch instead of the dense every-expert execution.
            compact = tcfg.get("compact")
            if compact is not None and not isinstance(compact, bool):
                try:  # per-layer capacity schedule (list of fractions)
                    compact = tuple(float(c) for c in compact)
                except TypeError:
                    compact = float(compact)
            routed = tcfg.get("routed")
            if routed is not None and not isinstance(routed, bool):
                routed = float(routed)
            engine = InferenceEngine(
                model,
                quantized=tcfg.get("quantized", False),
                max_budget=tcfg.get("engine_max_budget"),
                calib_images=calib,
                calib_percentile=float(tcfg.get("calib_percentile", 99.9)),
                calib_static_caps=bool(tcfg.get("calib_static_caps",
                                                False)),
                mesh=mesh,
                compact=compact or None,
                compact_slack=float(tcfg.get("compact_slack", 0.0)),
                routed=routed or None,
            )
            print("eval path: fused InferenceEngine"
                  + (" (int8 w8a8)" if tcfg.get("quantized") else "")
                  + (" (token compaction)" if compact else "")
                  + (" (routed MoE)" if routed else "")
                  + (f" [calibrated on {n_calib}"
                     + (", static caps]" if tcfg.get("calib_static_caps")
                        else "]") if calib is not None else ""),
                  flush=True)
        except NotImplementedError as e:  # unsupported mode
            print(f"fused engine unavailable ({e}); linen eval path", flush=True)

    @jax.jit
    def eval_step(params, x, y, budget, noise_value):
        out, aux = apply_fn(params, x, budget, noise_value,
                            {"noise": jax.random.key(0)}, train=False)
        logits = _main_logits(out, out_fmt)
        return jnp.sum(jnp.argmax(logits, -1) == y), criterion(logits, y), aux

    results_per_budget: dict = {}
    flops_per_budget: dict = {}
    timings: dict = {}
    device_timings: dict = {}
    sparsities_per_budget: dict = {}

    # optional separate FLOPs/timing batch size (reference test.py:210-227
    # builds a dedicated flops_loader with its own batch size)
    flops_bs = tcfg.get("flops_batch_size")
    flops_batch = None
    if flops_bs:
        fl = DataLoader(dataset.val_dataset, flops_bs,
                        num_workers=tcfg.get("num_workers", 8))
        flops_batch = jnp.asarray(next(iter(fl))[0])

    for b in budgets:
        bb = None if b is None else jnp.float32(b)
        results_per_budget[b] = {}
        for nv in noises:
            nn_ = None if nv is None else jnp.float32(nv)
            total = correct = 0
            # warm up compiles before the timed wall-clock loop so
            # images/sec reflects steady state, not the first trace
            warm = next(iter(prefetch_to_device(iter(val_loader), size=1)))
            if engine is not None:
                _ = engine(warm[0], budget=b, noise_value=nv) \
                    if model.accepts_budget \
                    else engine(warm[0], noise_value=nv)
            else:
                eval_step(model.params, warm[0], warm[1], bb, nn_)
            t0 = time.time()
            for x, y in prefetch_to_device(iter(val_loader), size=2):
                if flops_batch is None:
                    flops_batch = x
                if engine is not None:
                    logits = engine(x, budget=b, noise_value=nv) \
                        if model.accepts_budget else engine(x, noise_value=nv)
                    c = jnp.sum(jnp.argmax(logits, -1) == y)
                else:
                    c, _, _ = eval_step(model.params, x, y, bb, nn_)
                correct += int(c)
                total += int(y.shape[0])
            elapsed = time.time() - t0
            acc = correct / max(total, 1)
            results_per_budget[b][nv] = acc
            logger.log({f"test/budget_{b}/noise_{nv}": acc})
            print(f"budget={b} noise={nv}: acc={acc:.4f} "
                  f"({total / elapsed:.1f} img/s wall)", flush=True)
            if nv == noises[0]:
                timings[b] = total / elapsed  # reference test.py:123-124

        # device-only throughput: N steps inside one jitted fori_loop with a
        # data-dependent carry (block_until_ready is unreliable through the
        # axon tunnel — see bench.py docstring)
        from bench import device_seconds_per_iter

        bs = int(flops_batch.shape[0])
        y0 = jnp.zeros((bs,), jnp.int32)
        if engine is not None:
            # noise-carrying engines take two extra operands; time at the
            # sweep's first noise value (reference test.py times inside the
            # noise loop)
            extra = ()
            if getattr(engine, "_noise", None) is not None:
                nv0 = 0.0 if noises[0] is None else noises[0]
                extra = (jnp.float32(nv0), jax.random.key(0))
            if getattr(engine, "_residual", False):
                if getattr(engine, "_compact_auto", False):
                    # compact auto mode compiles one fn per budget
                    engine(flops_batch, budget=1.0 if b is None else b)
                    eng_fn = engine._compact_fns[
                        float(1.0 if b is None else b)]
                else:
                    eng_fn = engine._fn
                bb_t = jnp.float32(1.0 if b is None else b)

                def step_sum(params, x, carry):
                    return jnp.sum(eng_fn(params, x + carry * 0, bb_t,
                                          *extra))
            else:
                if getattr(engine, "_rank_fns", None) is not None \
                        and b is not None:
                    engine(flops_batch, budget=b)  # per-budget fn cache
                    eng_fn = engine._rank_fns[float(b)]
                else:
                    eng_fn = engine._fn

                def step_sum(params, x, carry):
                    return jnp.sum(eng_fn(params, x + carry * 0, *extra))
        else:
            def step_sum(params, x, carry):
                c, _, _ = eval_step(params, x + carry * 0, y0, bb, None)
                return c.astype(jnp.float32)

        # engine fns run the ENGINE's prepared tree (quantized/pre-folded
        # — the raw fp tree lacks the int8 leaves), linen the model's
        timing_params = engine.params if engine is not None else model.params
        if tcfg.get("profile") and not device_timings:
            # jax.profiler trace of the timed forward at the first budget
            # (SURVEY §5: the TPU-native analogue of the reference's
            # wall-clock-only instrumentation, validate/test.py:113-124)
            trace_dir = os.path.join(experiment_dir, "profile")
            print(f"profiling device loop -> {trace_dir}", flush=True)
            with jax.profiler.trace(trace_dir):
                sec = device_seconds_per_iter(
                    step_sum, (timing_params, flops_batch), reps=5)
        else:
            sec = device_seconds_per_iter(
                step_sum, (timing_params, flops_batch), reps=5)
        device_timings[b] = bs / sec

        if not tcfg.get("skip_flops_count", False):
            flops, params_count = compute_flops(model, flops_batch, budget=b)
            flops_per_budget[b] = flops
            sparsities_per_budget[b] = sparsity_per_module(
                model, flops_batch, budget=b
            )

    # optional deployment export (test.export_bundle=DIR): package the
    # engine the sweep just validated into standalone serving bundles
    # (peekvit_tpu/serving.py; no reference counterpart — the torch
    # reference serves from the live module, reference test.py:113-124)
    bundle_dir = tcfg.get("export_bundle")
    if bundle_dir:
        if engine is None:
            print("export_bundle: no fused engine for this model/mode; "
                  "nothing exported", flush=True)
        else:
            from peekvit_tpu.serving import (save_bucketed_bundle,
                                             save_serving_bundle)

            # test.export_buckets=[1,8,...]: bucketed artifact serving any
            # batch <= max (serving_host pairs with it); default: the
            # sweep's own batch geometry
            buckets = tcfg.get("export_buckets")

            def _export(path, budget=None):
                if buckets:
                    return save_bucketed_bundle(engine, path, flops_batch,
                                                batch_sizes=buckets,
                                                budget=budget)
                return save_serving_bundle(engine, path, flops_batch,
                                           budget=budget)

            try:
                if (getattr(engine, "_rank_fns", None) is not None
                        and getattr(engine, "_rank_max_budget", None)
                        is None):
                    # exact-drop ranking engines compile one geometry per
                    # budget: one bundle per swept budget
                    for b in budgets:
                        p = _export(os.path.join(bundle_dir, f"budget_{b}"),
                                    budget=b)
                        print(f"exported serving bundle: {p}", flush=True)
                else:
                    p = _export(bundle_dir)
                    print(f"exported serving bundle: {p}", flush=True)
            except (NotImplementedError, ValueError) as e:
                # export is best-effort: never lose the completed sweep's
                # results to a deployment-packaging error
                print(f"export_bundle: not exportable ({e})", flush=True)

    summary = {
        "results_per_budget": results_per_budget,
        "flops": flops_per_budget,
        "timings_wall": timings,
        "timings_device": device_timings,
        "sparsities_per_budget": sparsities_per_budget,
    }
    logger.log(summary)
    return summary


def run_test(cfg):
    from peekvit_tpu.data.loader import DataLoader  # noqa: F401 (config check)
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.utils import visualize as viz
    from peekvit_tpu.utils.checkpoint import get_checkpoint_path, load_state
    from peekvit_tpu.utils.checkpoint import make_experiment_directory

    dataset = instantiate(cfg.dataset)

    # resolve experiment dirs (reference test.py:198-205)
    load_from = cfg.get("load_from")
    current_dir = os.path.join(cfg.experiments_dir, cfg.experiment_name)
    if load_from is None:
        experiment_dirs = [current_dir]
    elif isinstance(load_from, str):
        experiment_dirs = [load_from]
    else:
        experiment_dirs = list(load_from)

    all_results = {}
    for experiment_dir in experiment_dirs:
        ckpt = (
            experiment_dir
            if os.path.exists(os.path.join(experiment_dir, "metadata.json"))
            else get_checkpoint_path(experiment_dir)
        )
        if ckpt is None:
            raise FileNotFoundError(f"No checkpoint under {experiment_dir}")
        out_dir = experiment_dir if os.path.isdir(experiment_dir) else current_dir
        make_experiment_directory(out_dir)
        logger = instantiate(cfg.logger, logging_dir=out_dir)

        model = None
        if cfg.get("model"):
            model_cfg = to_plain(cfg.model)
            model_class = model_cfg.pop("_target_").rsplit(".", 1)[-1]
            noise_args = to_plain(cfg.noise) if cfg.get("noise") else None
            model = build_model(model_class, model_cfg, noise_args=noise_args)
        model = load_state(ckpt, model, strict=True)  # reference test.py:52
        if cfg.get("noise") and model.noise_args is None:
            # retrofit a noise block at eval time (reference test.py:76-79)
            from peekvit_tpu.models.registry import build_model as _bm

            model = _bm(
                model.model_class, model.model_args,
                noise_args=to_plain(cfg.noise), params=model.params,
            )

        summary = validate(model, cfg, dataset, experiment_dir, logger)
        all_results[experiment_dir] = summary

        # recap plots (reference test.py:275-289)
        images_dir = os.path.join(out_dir, "images")
        budgets = [b for b in summary["results_per_budget"] if b is not None]
        noises = sorted(
            {n for r in summary["results_per_budget"].values() for n in r},
            key=lambda v: (v is None, v),
        )
        if budgets and len(noises) > 1 and noises != [None]:
            viz.plot_budget_noise_grid(
                {b: summary["results_per_budget"][b] for b in budgets},
                save_path=os.path.join(images_dir, "budget_noise_grid.png"),
            )
        elif budgets:
            accs = [summary["results_per_budget"][b][noises[0]] for b in budgets]
            viz.plot_budget_vs_acc(
                budgets, accs, save_path=os.path.join(images_dir, "budget_vs_acc.png")
            )
            if summary["flops"]:
                viz.plot_flops_vs_acc(
                    [summary["flops"][b] for b in budgets], accs,
                    save_path=os.path.join(images_dir, "flops_vs_acc.png"),
                )
            viz.plot_budget_vs_throughput(
                budgets, [summary["timings_wall"][b] for b in budgets],
                save_path=os.path.join(images_dir, "budget_vs_throughput.png"),
            )
        logger.close()

    # cumulative multi-run plots + log (reference test.py:304-336)
    if cfg.test.get("cumulative_plot") and len(all_results) > 1:
        cum_dir = cfg.test.get("cumulative_plot_dir") or current_dir
        os.makedirs(cum_dir, exist_ok=True)
        run_names = cfg.test.get("run_names") or [
            os.path.basename(d.rstrip("/")) for d in all_results
        ]
        runs = {}
        for name, (d, summary) in zip(run_names, all_results.items()):
            budgets = [b for b in summary["results_per_budget"] if b is not None]
            if not budgets:
                continue
            n0 = sorted(
                next(iter(summary["results_per_budget"].values())),
                key=lambda v: (v is None, v),
            )[0]
            runs[name] = {
                "budgets": budgets,
                "flops": [summary["flops"].get(b, 0) for b in budgets],
                "accuracies": [
                    summary["results_per_budget"][b][n0] for b in budgets
                ],
            }
        if runs:
            colors = cfg.test.get("run_colors")
            color_map = dict(zip(run_names, colors)) if colors else None
            viz.plot_cumulative_runs(
                runs, "budgets", "accuracies",
                save_path=os.path.join(cum_dir, "cumulative_budget_vs_acc.png"),
                run_colors=color_map,
            )
            viz.plot_cumulative_runs(
                runs, "flops", "accuracies",
                save_path=os.path.join(cum_dir, "cumulative_flops_vs_acc.png"),
                run_colors=color_map,
            )
        with open(os.path.join(cum_dir, "cumulative_log.txt"), "a") as f:
            for d, summary in all_results.items():
                f.write(f"{d}: {summary}\n")

    return all_results


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config_dir, args.config_name, args.overrides)
    return run_test(cfg)


if __name__ == "__main__":
    main()
