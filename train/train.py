"""Train entry point (reference train/train.py:34-217).

Usage mirrors the reference's hydra CLI:

    python train/train.py [group=option ...] [key.sub=value ...]
    python train/train.py -m model=vit_tiny,rankvit   # sequential multirun

Composition comes from ``configs/train_config.yaml`` via the native config
system (peekvit_tpu/utils/config.py). The reference's broken default
``train_config_personal`` (SURVEY.md §7.1) is replaced by the shipped
``train_config``; pass ``--config-name NAME`` to use another.
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from peekvit_tpu.utils.config import (  # noqa: E402
    instantiate,
    load_config,
    save_config,
    to_plain,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "configs"))
    p.add_argument("--config-name", default="train_config")
    p.add_argument("-m", "--multirun", action="store_true")
    p.add_argument("overrides", nargs="*")
    return p.parse_args(argv)


def expand_multirun(overrides):
    """hydra --multirun: comma-valued overrides become a cartesian sweep."""
    keys, options = [], []
    for ov in overrides:
        key, _, val = ov.partition("=")
        vals = val.split(",") if "," in val else [val]
        keys.append(key)
        options.append(vals)
    for combo in itertools.product(*options):
        yield [f"{k}={v}" for k, v in zip(keys, combo)]


def train(cfg) -> dict:
    import jax
    import numpy as np

    from peekvit_tpu.data.loader import DataLoader
    from peekvit_tpu.models import topology
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.parallel import make_hybrid_mesh
    from peekvit_tpu.training.trainer import Trainer
    from peekvit_tpu.utils.checkpoint import (
        get_checkpoint_path,
        load_state,
        make_experiment_directory,
        save_state,
    )
    from peekvit_tpu.utils.losses import LossCompose

    # --- multi-host: one flag turns on jax.distributed (ICI within a slice,
    # DCN across slices; the mesh/sharding layer is already multi-chip)
    if cfg.get("distributed"):
        jax.distributed.initialize()
        print(f"process {jax.process_index()}/{jax.process_count()}",
              flush=True)

    # --- debug/tracing hooks (SURVEY.md §5: TPU equivalents of the
    # reference's absent sanitizers — jax_debug_nans + jax.profiler traces)
    if cfg.training.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)

    # --- experiment dir + logger (train.py:42-49)
    experiment_dir = os.path.join(cfg.experiments_dir, cfg.experiment_name)
    checkpoints_dir, images_dir = make_experiment_directory(experiment_dir)
    save_config(cfg, os.path.join(experiment_dir, "config.yaml"))
    logger = instantiate(cfg.logger, logging_dir=experiment_dir) \
        if "logging_dir" not in (cfg.logger or {}) else instantiate(cfg.logger)
    print(f"Experiment dir: {experiment_dir}", flush=True)

    # --- dataset + loaders (train.py:54-57)
    dataset = instantiate(cfg.dataset)
    tr = cfg.training
    # On a multi-host pod each process loads its own 1/world of every epoch
    # (same seeded shuffle everywhere -> disjoint shards; the global batch
    # assembles across hosts through the data-sharded device_put).
    shard = (jax.process_index(), jax.process_count()) \
        if jax.process_count() > 1 else None
    train_loader = DataLoader(
        dataset.train_dataset, tr.train_batch_size, shuffle=True,
        num_workers=tr.get("num_workers", 8), drop_last=True, seed=cfg.seed,
        shard=shard,
    )
    val_loader = DataLoader(
        dataset.val_dataset, tr.eval_batch_size,
        num_workers=tr.get("num_workers", 8),
    )

    # --- model (train.py:60-61): registry build from the config node
    model_cfg = to_plain(cfg.model)
    model_class = model_cfg.pop("_target_").rsplit(".", 1)[-1]
    noise_args = to_plain(cfg.noise) if cfg.get("noise") else None
    model = build_model(
        model_class, model_cfg, noise_args=noise_args,
        remove_layers=tr.get("remove_layers") or None, seed=cfg.seed,
    )

    # --- optional checkpoint load (train.py:64-70)
    if cfg.get("load_from"):
        path = cfg.load_from
        if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "metadata.json")
        ):
            path = get_checkpoint_path(path)
        print(f"Loading from {path}", flush=True)
        model = load_state(path, model, strict=False)

    # --- preemption recovery (utils/preemption.py): resume this experiment
    # from its own last committed checkpoint. A checkpoint tagged
    # ``partial`` (written by the SIGTERM path below) restarts ITS epoch;
    # a periodic one restarts the next.
    start_epoch = 0
    resume_meta = None
    if tr.get("auto_resume") and not cfg.get("load_from"):
        import json as _json

        resume = get_checkpoint_path(experiment_dir)
        if resume:
            with open(os.path.join(resume, "metadata.json")) as f:
                resume_meta = _json.load(f)
            print(f"auto_resume: {resume} (epoch {resume_meta['epoch']}"
                  + (", partial" if resume_meta.get("partial") else "")
                  + ")", flush=True)
            model = load_state(resume, model, strict=True)
            start_epoch = int(resume_meta["epoch"]) + (
                0 if resume_meta.get("partial") else 1)

    if tr.get("reinit_class_tokens"):
        model = topology.reinit_class_tokens(model, seed=cfg.seed)

    # --- losses / optimizer / scheduler (train.py:79-94)
    main_criterion = instantiate(cfg.loss.classification_loss)
    loss_compose = LossCompose(to_plain(cfg.loss.get("additional_losses") or {}))
    optimizer = instantiate(cfg.optimizer)
    scheduler = instantiate(cfg.get("scheduler"))

    pipeline_stages = int(tr.get("pipeline_stages") or 0)
    sp_devices = int(tr.get("sequence_parallel_devices") or 0)
    # pipeline/SP modes own the device layout (a dedicated mesh axis built
    # by the Trainer); otherwise default to data parallelism over every
    # chip — slice-aware on multi-slice pods (grad all-reduce lowers
    # hierarchically: in-slice over ICI, cross-slice over DCN)
    # training.tensor_parallel carves a model axis out of the mesh
    # (training.tensor_parallel_devices chips wide, default 2)
    n_model = 1
    if bool(tr.get("tensor_parallel")):
        n_model = int(tr.get("tensor_parallel_devices") or 2)
    mesh = (make_hybrid_mesh(n_model=n_model)
            if len(jax.devices()) > 1 and pipeline_stages <= 1
            and sp_devices <= 1 else None)

    # --- QAT: ``training.qat: true`` trains against the DYNAMIC int8
    # engine grid; ``training.qat: static`` against the static-caps grid,
    # calibrated here on the first training images (same collectors the
    # engine's calib_static_caps mode uses; knobs training.qat_calib_images
    # / training.qat_percentile)
    qat = tr.get("qat") or False
    qat_caps = None
    qat_smoothing = None
    if qat == "static":
        import numpy as np

        from peekvit_tpu.inference import (
            collect_qat_calibration,
            collect_qat_caps,
        )

        n_calib = int(tr.get("qat_calib_images") or 64)
        calib = []
        for bx, _ in train_loader:
            calib.append(np.asarray(bx))
            if sum(c.shape[0] for c in calib) >= n_calib:
                break
        calib = np.concatenate(calib, axis=0)[:n_calib]
        tb = tr.get("train_budget")
        kw = dict(percentile=float(tr.get("qat_percentile") or 99.9),
                  budget=float(tb) if isinstance(tb, (int, float)) else 1.0)
        # Default: SmoothQuant-aware calibration — caps collected on the
        # smoothed model and the smoothing vectors trained through, so the
        # grid trained against IS the grid the engine's default
        # calib_images= + calib_static_caps mode serves (VERDICT r4 #7).
        # training.qat_smooth=false reverts to unsmoothed caps (the
        # engine's calibration-free static mode).
        if tr.get("qat_smooth", True):
            qat_caps, qat_smoothing = collect_qat_calibration(model, calib,
                                                              **kw)
        else:
            qat_caps = collect_qat_caps(model, calib, **kw)
        if jax.process_count() > 1:
            # Calibration batches come from THIS host's data shard; without
            # a broadcast each host would train against a different quant
            # grid (inconsistent local grads under synced params —
            # ADVICE r4 #4). Host 0's calibration wins everywhere.
            from jax.experimental import multihost_utils

            qat_caps = jax.tree.map(
                float, multihost_utils.broadcast_one_to_all(qat_caps))
            if qat_smoothing is not None:
                qat_smoothing = jax.tree.map(
                    np.asarray,
                    multihost_utils.broadcast_one_to_all(qat_smoothing))
        print(f"qat=static: calibrated {len(qat_caps)} layer caps on "
              f"{calib.shape[0]} images"
              + (" (SmoothQuant-aware)" if qat_smoothing is not None else ""),
              flush=True)
        # NOTE: caps/smoothing are calibrated ONCE on the initial weights
        # and frozen for the run — the intended regime is the reference's
        # short fine-tune recipes (ADVICE r4 #2); production serving
        # recalibrates on the trained weights regardless (validate/test.py
        # calib knobs), and long fine-tunes should restart calibration by
        # resuming with a fresh qat calibration pass.
    elif qat:
        qat = True
    trainer = Trainer(
        model=model,
        optimizer=optimizer,
        scheduler=scheduler,
        main_criterion=main_criterion,
        loss_compose=loss_compose,
        clip_grad_norm=tr.get("clip_grad_norm"),
        train_backbone=tr.get("train_backbone", True),
        seed=cfg.seed,
        mesh=mesh,
        fused=tr.get("fused", "auto"),
        pipeline_stages=pipeline_stages,
        pipeline_microbatches=int(tr.get("pipeline_microbatches") or 0),
        sequence_parallel_devices=sp_devices,
        parallel_kernels=tr.get("parallel_kernels", "auto"),
        grad_accumulation=int(tr.get("grad_accumulation") or 1),
        zero_sharded_optimizer=bool(tr.get("zero_sharded_optimizer"))
        and mesh is not None,
        fsdp_sharded_params=bool(tr.get("fsdp_sharded_params"))
        and mesh is not None,
        qat=qat,
        qat_caps=qat_caps,
        qat_smoothing=qat_smoothing,
        remat=bool(tr.get("remat")),
        tensor_parallel=bool(tr.get("tensor_parallel"))
        and mesh is not None,
    )

    if resume_meta is not None:
        # optimizer state is saved by the preemption path (and by any
        # skip_optimizer=False save); restore it when present so the
        # resumed run continues with warm adam moments / accumulators
        from peekvit_tpu.utils.checkpoint import load_optimizer_state

        resume = get_checkpoint_path(experiment_dir)
        if os.path.isdir(os.path.join(resume, "opt_state")):
            trainer.opt_state = load_optimizer_state(
                resume, trainer.opt_state)
            print("auto_resume: optimizer state restored", flush=True)

    train_budget = tr.get("train_budget")
    if model.accepts_budget:
        # budget models need set_budget at eval; default to full budget
        val_budgets = tr.get("val_budgets") or [1.0]
    else:
        val_budgets = [None]  # budget fallback (test.py:59-65)

    results = {"experiment_dir": experiment_dir, "val_accuracy": {},
               "start_epoch": start_epoch}
    num_epochs = tr.num_epochs
    profile_epoch = tr.get("profile_epoch", -1)

    # SIGTERM (pod preemption / job manager kill) -> stop after the
    # in-flight step, write ONE sync checkpoint (params + optimizer,
    # tagged partial when mid-epoch), exit 0. auto_resume picks it up.
    from peekvit_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard()
    if tr.get("preemption_checkpointing", True):
        guard.install()

    def _preemption_save(epoch: int, partial: bool) -> None:
        from peekvit_tpu.utils.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # don't race an in-flight async periodic save
        path = save_state(checkpoints_dir, model, trainer.opt_state, epoch,
                          skip_optimizer=False, async_save=False,
                          extra_metadata={"partial": partial})
        print(f"  preemption checkpoint -> {path}"
              + (" (partial epoch)" if partial else ""), flush=True)
        results["preempted"] = True

    for epoch in range(start_epoch, num_epochs + 1):  # ref range(n+1)
        if epoch == profile_epoch:
            trace_dir = os.path.join(experiment_dir, "profile")
            print(f"profiling epoch {epoch} -> {trace_dir}", flush=True)
            with jax.profiler.trace(trace_dir):
                metrics = trainer.train_epoch(
                    train_loader, epoch, logger=logger, budget=train_budget,
                    should_stop=guard,
                )
        else:
            metrics = trainer.train_epoch(
                train_loader, epoch, logger=logger, budget=train_budget,
                should_stop=guard,
            )
        print(
            f"epoch {epoch}: total_loss={metrics.get('total_loss', float('nan')):.4f}",
            flush=True,
        )
        if metrics.get("interrupted"):
            _preemption_save(epoch, partial=True)
            break

        if tr.eval_every > 0 and epoch % tr.eval_every == 0:
            for b in val_budgets:
                acc, loss = trainer.validate(val_loader, budget=b)
                tag = f"budget_{b}/val" if b is not None else "val"
                logger.log({f"{tag}/accuracy": acc, f"{tag}/loss": loss})
                print(f"  {tag}: acc={acc:.4f} loss={loss:.4f}", flush=True)
                results["val_accuracy"][(epoch, b)] = acc

        if tr.checkpoint_every > 0 and epoch % tr.checkpoint_every == 0:
            # async by default: the write overlaps the next epoch; the
            # end-of-train barrier below guarantees everything committed
            path = save_state(checkpoints_dir, model, trainer.opt_state,
                              epoch,
                              async_save=tr.get("async_checkpoints", True))
            print(f"  checkpoint -> {path}", flush=True)

        if (
            tr.get("plot_masks_every", -1) > 0
            and epoch % tr.plot_masks_every == 0
            and model.accepts_budget
        ):
            try:
                from peekvit_tpu.utils.visualize import plot_masked_images

                subset = [dataset.val_dataset[i]
                          for i in range(tr.get("num_images_to_plot", 10))]
                for b in (x for x in val_budgets if x is not None):
                    model.set_budget(b)
                    plot_masked_images(
                        model, subset,
                        getattr(dataset, "denormalize_transform", None),
                        save_dir=os.path.join(
                            images_dir, f"epoch_{epoch}", f"budget_{b}"),
                    )
            except ImportError:
                print("visualize module unavailable; skipping mask plots")

        if guard.triggered:
            # signal landed between epochs (eval/checkpoint/plots): the
            # epoch is complete, so the resume point is the NEXT epoch
            _preemption_save(epoch, partial=False)
            break

    guard.uninstall()  # multirun: the next run installs its own
    from peekvit_tpu.utils.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # flush in-flight async saves before returning
    logger.close()
    return results


def main(argv=None):
    args = parse_args(argv)
    runs = (
        expand_multirun(args.overrides) if args.multirun else [args.overrides]
    )
    out = []
    for overrides in runs:
        cfg = load_config(args.config_dir, args.config_name, overrides)
        if args.multirun:
            print(f"=== multirun: {overrides} ===", flush=True)
        out.append(train(cfg))
    return out


if __name__ == "__main__":
    main()
