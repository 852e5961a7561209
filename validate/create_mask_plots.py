"""Mask-visualization entry point (reference validate/create_mask_plots.py:29-105).

    python validate/create_mask_plots.py load_from=EXPERIMENT_DIR [overrides]

Loads the last checkpoint, and for every budget in test.budgets renders
per-layer incremental token masks for test.num_images validation images to
``{experiment_dir}/images/epoch_{e}/budget_{b}/``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from peekvit_tpu.utils.config import instantiate, load_config  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-dir", default=os.path.join(
        os.path.dirname(__file__), "..", "configs"))
    p.add_argument("--config-name", default="test_config")
    p.add_argument("overrides", nargs="*")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config_dir, args.config_name, args.overrides)

    from peekvit_tpu.utils.checkpoint import get_checkpoint_path, load_state
    from peekvit_tpu.utils.visualize import plot_masked_images

    experiment_dir = cfg.get("load_from") or os.path.join(
        cfg.experiments_dir, cfg.experiment_name
    )
    ckpt = (
        experiment_dir
        if os.path.exists(os.path.join(experiment_dir, "metadata.json"))
        else get_checkpoint_path(experiment_dir)
    )
    if ckpt is None:
        raise FileNotFoundError(f"No checkpoint under {experiment_dir}")
    model = load_state(ckpt)
    epoch = os.path.basename(ckpt).replace("epoch_", "").lstrip("0") or "0"

    dataset = instantiate(cfg.dataset)
    tcfg = cfg.test
    subset = [dataset.val_dataset[i] for i in range(tcfg.get("num_images", 20))]
    budgets = tcfg.get("budgets") or [1.0]
    if not model.accepts_budget:
        budgets = [None]

    out = []
    for b in budgets:
        save_dir = os.path.join(
            experiment_dir, "images", f"epoch_{epoch}", f"budget_{b}"
        )
        out += plot_masked_images(
            model,
            subset,
            denormalize=getattr(dataset, "denormalize_transform", None),
            hard=tcfg.get("hard_mask", True),
            skip_layers=tcfg.get("skip_layers_for_masks", []),
            overlay=tcfg.get("overlay_mask_on_image", False),
            masked_region_color=tcfg.get("masked_region_color", "lightsteelblue"),
            budget=b,
            save_dir=save_dir,
        )
        print(f"budget {b}: wrote {save_dir}", flush=True)
    return out


if __name__ == "__main__":
    main()
