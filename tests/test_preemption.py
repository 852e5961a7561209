"""Preemption-safe training (utils/preemption.py + train entry wiring):
SIGTERM -> stop after the in-flight step -> one sync checkpoint (params +
optimizer, tagged partial) -> clean exit; training.auto_resume restarts
from it. The reference has no handler at all (its train loop loses
everything since the last periodic save on a kill)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
for _sub in ("train",):
    _p = os.path.join(REPO, _sub)
    if _p not in sys.path:
        sys.path.insert(0, _p)


def test_guard_flags_on_signal_and_chains_previous_handler():
    from peekvit_tpu.utils.preemption import PreemptionGuard

    hits = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
    try:
        with PreemptionGuard() as guard:
            assert not guard.triggered and guard.installed
            os.kill(os.getpid(), signal.SIGTERM)
            # CPython delivers the signal at the next bytecode boundary
            for _ in range(100):
                if guard.triggered:
                    break
                time.sleep(0.01)
            assert guard.triggered
            assert guard()  # callable surface for should_stop=
            assert hits == [signal.SIGTERM]  # previous handler chained
        # context exit restored the outer handler
        assert signal.getsignal(signal.SIGTERM) is not guard._handle
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_train_epoch_should_stop_halts_mid_epoch():
    """should_stop= stops the batch loop after the in-flight step and the
    summary carries interrupted=1.0 + the true number of steps run."""
    import jax.numpy as jnp

    from peekvit_tpu.models.registry import build_model
    from peekvit_tpu.training.optim import SGD
    from peekvit_tpu.training.trainer import Trainer

    model = build_model(
        "vit", dict(image_size=16, patch_size=8, num_layers=1, num_heads=2,
                    hidden_dim=32, mlp_dim=64, num_classes=4), seed=3)
    trainer = Trainer(model=model, optimizer=SGD(lr=1e-3), fused=False)

    import numpy as np
    rng = np.random.default_rng(0)
    batches = [(jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32),
                jnp.asarray(rng.integers(0, 4, size=(4,))))
               for _ in range(6)]

    calls = []

    def stop_after_two():
        calls.append(1)
        return len(calls) >= 2

    metrics = trainer.train_epoch(batches, epoch=0,
                                  should_stop=stop_after_two)
    assert metrics["interrupted"] == 1.0
    assert metrics["num_batches"] == 2  # stopped after the 2nd step
    # without the hook the full epoch runs and carries no interrupted key
    full = trainer.train_epoch(batches, epoch=1)
    assert "interrupted" not in full
    assert full["num_batches"] == 6


def test_sigterm_checkpoints_and_auto_resume_completes(tmp_path):
    """End to end: a real train subprocess killed with SIGTERM exits 0
    leaving a committed resume checkpoint (params + opt_state); re-running
    with training.auto_resume=true restarts from it and finishes."""
    overrides = [
        f"workspace={tmp_path}", "experiment_name=preempt",
        "dataset=synthetic",
        "dataset.image_size=16", "dataset.train_size=256",
        "dataset.val_size=16", "training.train_batch_size=8",
        "training.eval_batch_size=8", "training.num_epochs=4",
        "training.eval_every=-1", "training.checkpoint_every=-1",
        "training.num_workers=0", "model.patch_size=8",
        "model.num_layers=1", "model.hidden_dim=32", "model.mlp_dim=64",
        "model.num_heads=2", "training.fused=false",
    ]
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        f"sys.path.insert(0, {os.path.join(REPO, 'train')!r})\n"
        "from train import main\n"
        f"main({overrides!r})\n"
        "print('TRAIN_DONE', flush=True)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, str(driver)], cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait for training to be underway, then deliver the preemption signal
    lines = []
    deadline = time.time() + 300
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if line.startswith("epoch 0:"):
            proc.send_signal(signal.SIGTERM)
            break
    out, _ = proc.communicate(timeout=300)
    lines.append(out)
    text = "".join(lines)
    assert proc.returncode == 0, f"train subprocess failed:\n{text}"
    assert "preemption checkpoint ->" in text, text

    # a committed checkpoint with optimizer state + resume metadata exists
    from peekvit_tpu.utils.checkpoint import get_checkpoint_path

    exp_dir = tmp_path / "runs" / "preempt"
    assert exp_dir.is_dir()
    ckpt = get_checkpoint_path(str(exp_dir))
    assert ckpt is not None
    with open(os.path.join(ckpt, "metadata.json")) as f:
        meta = json.load(f)
    assert "partial" in meta  # written by the preemption path
    assert os.path.isdir(os.path.join(ckpt, "opt_state"))

    # resume in-process (conftest already forces the cpu backend)
    from train import main as train_main

    res = train_main(overrides + ["training.auto_resume=true"])[0]
    expected = meta["epoch"] if meta["partial"] else meta["epoch"] + 1
    assert res["start_epoch"] == expected
    assert "preempted" not in res  # ran to completion this time
