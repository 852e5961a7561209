"""Self-describing checkpoints (orbax + metadata JSON).

Contract from reference utils/utils.py:198-285: a checkpoint carries
``{model_class, model_args, noise_args, state_dict, optimizer?, epoch}`` so
``load_state`` can rebuild the model without its config. Layout::

    {experiment_dir}/checkpoints/epoch_{e:03d}/
        params/            # orbax pytree
        opt_state/         # optional (skip_optimizer=True by default, §7.13)
        metadata.json      # model_class, model_args, noise_args, epoch

``get_checkpoint_path`` picks the lexically-last epoch (utils.py:260-285).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from peekvit_tpu.models.base import Model


def make_experiment_directory(base: str) -> tuple[str, str]:
    """Create {base}/checkpoints and {base}/images (reference utils.py:11-29)."""
    ckpt = os.path.join(base, "checkpoints")
    images = os.path.join(base, "images")
    os.makedirs(ckpt, exist_ok=True)
    os.makedirs(images, exist_ok=True)
    return ckpt, images


_ASYNC_CKPTR: Optional["ocp.AsyncCheckpointer"] = None


def _async_checkpointer() -> "ocp.AsyncCheckpointer":
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_state(
    checkpoints_dir: str,
    model: Model,
    optimizer_state: Any = None,
    epoch: int = 0,
    skip_optimizer: bool = True,
    async_save: bool = False,
    extra_metadata: Optional[dict] = None,
) -> str:
    """Save a self-describing checkpoint. Returns the checkpoint path.

    ``async_save=True`` returns as soon as the device->host copy is done
    and writes in a background thread (orbax AsyncCheckpointer), so the
    next epoch's compute overlaps the disk write. Readers never see a
    partial checkpoint: orbax commits the ``params`` dir atomically
    (write-to-tmp + rename) and ``get_checkpoint_path`` requires it, so
    an in-flight epoch is invisible until committed; same-process
    ``load_state`` flushes pending saves first (wait_for_checkpoints).
    """
    path = os.path.abspath(os.path.join(checkpoints_dir, f"epoch_{epoch:03d}"))
    os.makedirs(path, exist_ok=True)
    # metadata first: a checkpoint becomes visible only once the
    # atomically-renamed params dir lands next to it
    meta = {
        "model_class": model.model_class,
        "model_args": model.model_args,
        "noise_args": model.noise_args,
        "epoch": epoch,
    }
    if extra_metadata:
        meta.update(extra_metadata)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # one save in flight at a time
    else:
        ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), model.params, force=True)
    if optimizer_state is not None and not skip_optimizer:
        if async_save:
            ckptr.wait_until_finished()
        ckptr.save(os.path.join(path, "opt_state"), optimizer_state,
                   force=True)
    if not async_save:
        ckptr.wait_until_finished()
    return path


def load_state(
    checkpoint_path: str,
    model: Optional[Model] = None,
    strict: bool = True,
) -> Model:
    """Load a checkpoint; rebuild the model from metadata when model is None.

    Mirrors reference utils.py:216-256 (strict=False keeps init values for
    params missing from the checkpoint).
    """
    wait_for_checkpoints()  # same-process read-after-async-write safety
    path = os.path.abspath(checkpoint_path)
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)

    if model is None:
        from peekvit_tpu.models.registry import build_model

        model_args = dict(meta["model_args"])
        model_args.pop("torch_pretrained_weights", None)
        model_args.pop("timm_pretrained_weights", None)
        model_args.pop("_target_", None)
        model = build_model(meta["model_class"], model_args, meta.get("noise_args"))

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.join(path, "params"), target=model.params)
    if strict:
        model.params = restored
    else:
        from peekvit_tpu.models.adapters import transfer_params

        merged, missing, _ = transfer_params(restored, model.params)
        if missing:
            print("Params missing from checkpoint (keeping init):", missing[:10])
        model.params = merged
    return model


def load_optimizer_state(checkpoint_path: str, target: Any) -> Any:
    wait_for_checkpoints()
    path = os.path.abspath(os.path.join(checkpoint_path, "opt_state"))
    return ocp.StandardCheckpointer().restore(path, target=target)


def get_checkpoint_path(experiment_dir: str) -> Optional[str]:
    """Last COMMITTED checkpoint (lexical sort) in {dir}/checkpoints or
    {dir} itself. Requires the params dir (orbax commits it atomically),
    so an in-flight async save is never picked up."""
    for root in (os.path.join(experiment_dir, "checkpoints"), experiment_dir):
        if os.path.isdir(root):
            epochs = sorted(
                d for d in os.listdir(root)
                if d.startswith("epoch_")
                and os.path.isfile(os.path.join(root, d, "metadata.json"))
                and os.path.isdir(os.path.join(root, d, "params"))
            )
            if epochs:
                return os.path.join(root, epochs[-1])
    return None
