"""Driver-contract tests: entry() traces; dryrun_multichip runs on the
virtual 8-device CPU mesh (conftest forces it) AND from a hostile process
whose env does not pre-set the CPU platform flags (the driver's process)."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8():
    import jax

    assert len(jax.devices()) == 8
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_self_sufficient():
    """Simulate the driver: a process whose JAX has 1 CPU device (no
    --xla_force_host_platform_device_count) imports the module and calls
    dryrun_multichip(8). The subprocess fallback must make it pass."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # hermetic: don't grab the real TPU
    env["XLA_FLAGS"] = ""  # ... but only ONE cpu device
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; assert len(jax.devices()) == 1, jax.devices(); "
         "from __graft_entry__ import dryrun_multichip; "
         "dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8)" in proc.stdout, proc.stdout


def test_dryrun_subprocess_failure_propagates():
    """A failing dryrun body must raise, not silently pass."""
    import pytest

    from __graft_entry__ import _dryrun_multichip_subprocess

    with pytest.raises(RuntimeError, match="subprocess failed"):
        # 0 devices is impossible -> the child asserts -> rc != 0
        _dryrun_multichip_subprocess(-1)


def test_entry_traces():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    lowered = jax.jit(fn).lower(*args)  # full trace + StableHLO lowering
    assert "dot_general" in lowered.as_text()
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (8, 1000)
