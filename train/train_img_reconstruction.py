"""Reconstruction training entry point
(reference train/train_img_reconstruction.py:27-228).

Same skeleton as train/train.py but the model forward returns
``(logits, reconstructed, mask)`` and the loss adds masked-pixel MSE
``mean(((batch - recon)**2) * mask)`` (reference :100-108). Periodically
renders input|reconstruction|mask triptychs (reference :180-199).

    python train/train_img_reconstruction.py model=residualvitwithdecoder [overrides]
"""

from __future__ import annotations

import argparse
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
    p.add_argument("overrides", nargs="*")
    return p.parse_args(argv)


def train_reconstruction(cfg, reconstruction_weight: float = 1.0) -> dict:
    from peekvit_tpu.data.loader import DataLoader
    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.training.trainer import Trainer
    from peekvit_tpu.utils.checkpoint import (
        load_state,
        get_checkpoint_path,
        make_experiment_directory,
        save_state,
    )
    from peekvit_tpu.utils.losses import LossCompose

    experiment_dir = os.path.join(cfg.experiments_dir, cfg.experiment_name)
    checkpoints_dir, images_dir = make_experiment_directory(experiment_dir)
    save_config(cfg, os.path.join(experiment_dir, "config.yaml"))
    logger = instantiate(cfg.logger, logging_dir=experiment_dir)

    dataset = instantiate(cfg.dataset)
    tr = cfg.training
    train_loader = DataLoader(dataset.train_dataset, tr.train_batch_size,
                              shuffle=True, num_workers=tr.get("num_workers", 8),
                              drop_last=True, seed=cfg.seed)
    val_loader = DataLoader(dataset.val_dataset, tr.eval_batch_size,
                            num_workers=tr.get("num_workers", 8))

    model_cfg = to_plain(cfg.model)
    model_class = model_cfg.pop("_target_").rsplit(".", 1)[-1]
    model = build_model(model_class, model_cfg,
                        noise_args=to_plain(cfg.noise) if cfg.get("noise") else None,
                        seed=cfg.seed)
    assert getattr(model.module, "output_format", None) in (
        "logits_recon_mask", "logits_recon",
    ), "reconstruction training needs a decoder model (e.g. residualvitwithdecoder)"

    if cfg.get("load_from"):
        path = cfg.load_from
        if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "metadata.json")
        ):
            path = get_checkpoint_path(path)
        model = load_state(path, model, strict=False)

    trainer = Trainer(
        model=model,
        optimizer=instantiate(cfg.optimizer),
        scheduler=instantiate(cfg.get("scheduler")),
        main_criterion=instantiate(cfg.loss.classification_loss),
        loss_compose=LossCompose(to_plain(cfg.loss.get("additional_losses") or {})),
        clip_grad_norm=tr.get("clip_grad_norm"),
        train_backbone=tr.get("train_backbone", True),
        reconstruction_weight=reconstruction_weight,
        seed=cfg.seed,
    )

    if model.accepts_budget:
        val_budgets = tr.get("val_budgets") or [1.0]
    else:
        val_budgets = [None]

    results = {"experiment_dir": experiment_dir, "val_accuracy": {}}

    # same SIGTERM contract as train/train.py: stop after the in-flight
    # step, one sync checkpoint (params + optimizer, tagged partial)
    from peekvit_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard()
    if tr.get("preemption_checkpointing", True):
        guard.install()

    for epoch in range(tr.num_epochs + 1):
        metrics = trainer.train_epoch(train_loader, epoch, logger=logger,
                                      budget=tr.get("train_budget"),
                                      should_stop=guard)
        print(f"epoch {epoch}: total={metrics.get('total_loss', float('nan')):.4f} "
              f"recon={metrics.get('reconstruction_loss', float('nan')):.4f}",
              flush=True)
        if metrics.get("interrupted") or guard.triggered:
            from peekvit_tpu.utils.checkpoint import wait_for_checkpoints

            wait_for_checkpoints()
            path = save_state(
                checkpoints_dir, model, trainer.opt_state, epoch,
                skip_optimizer=False, async_save=False,
                extra_metadata={"partial": bool(metrics.get("interrupted"))})
            print(f"  preemption checkpoint -> {path}", flush=True)
            results["preempted"] = True
            break
        if tr.eval_every > 0 and epoch % tr.eval_every == 0:
            for b in val_budgets:
                acc, loss = trainer.validate(val_loader, budget=b)
                tag = f"budget_{b}/val" if b is not None else "val"
                logger.log({f"{tag}/accuracy": acc, f"{tag}/loss": loss})
                results["val_accuracy"][(epoch, b)] = acc
        if tr.checkpoint_every > 0 and epoch % tr.checkpoint_every == 0:
            save_state(checkpoints_dir, model, trainer.opt_state, epoch,
                       async_save=tr.get("async_checkpoints", True))
        if tr.get("plot_masks_every", -1) > 0 and epoch % tr.plot_masks_every == 0:
            from peekvit_tpu.utils.visualize import plot_reconstructed_images

            subset = [dataset.val_dataset[i]
                      for i in range(tr.get("num_images_to_plot", 10))]
            plot_reconstructed_images(
                model, subset,
                denormalize=getattr(dataset, "denormalize_transform", None),
                budget=next((b for b in val_budgets if b is not None), None),
                save_dir=os.path.join(images_dir, f"epoch_{epoch}", "recon"),
            )
    guard.uninstall()
    from peekvit_tpu.utils.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    logger.close()
    return results


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config_dir, args.config_name, args.overrides)
    return train_reconstruction(cfg)


if __name__ == "__main__":
    main()
