"""Class-token visualization entry point
(reference validate/create_cls_token_plots.py:61-123).

    python validate/create_cls_token_plots.py load_from=EXPERIMENT_DIR [overrides]

Renders per-layer class-token heatmaps, class-token distance matrices and
token-norm curves for test.num_images validation images.
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
    from peekvit_tpu.utils import visualize as viz

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

    dataset = instantiate(cfg.dataset)
    budget = (cfg.test.get("budgets") or [None])[0] if model.accepts_budget else None
    out_dir = os.path.join(experiment_dir, "images", "cls_tokens")
    paths = []
    for i in range(min(cfg.test.get("num_images", 20), len(dataset.val_dataset))):
        img = dataset.val_dataset[i][0]
        paths.append(viz.plot_class_tokens(
            model, img, budget=budget,
            save_path=os.path.join(out_dir, f"cls_tokens_{i}.png")))
        paths.append(viz.plot_class_tokens_distances(
            model, img, budget=budget,
            save_path=os.path.join(out_dir, f"cls_distances_{i}.png")))
        paths.append(viz.plot_token_norms(
            model, img, budget=budget,
            save_path=os.path.join(out_dir, f"token_norms_{i}.png")))
    print(f"wrote {len(paths)} plots to {out_dir}", flush=True)
    return paths


if __name__ == "__main__":
    main()
