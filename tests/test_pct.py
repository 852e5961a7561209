"""PCT / RankPCT: kNN correctness, BN state, ranking semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peekvit_tpu.models import build_model, init_rngs
from peekvit_tpu.models.pct import knn_indices

ARGS = dict(
    num_points=64, num_layers=2, num_heads=4, hidden_dim=64, mlp_dim=128,
    num_classes=40,
)


def test_knn_indices_match_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 3)).astype(np.float32)
    k = 5
    idx = np.asarray(knn_indices(jnp.asarray(x), k))
    for b in range(2):
        d = ((x[b][:, None] - x[b][None]) ** 2).sum(-1)
        for i in range(20):
            expected = set(np.argsort(d[i])[:k])
            assert set(idx[b, i]) == expected
    # self is always among the neighbors (distance 0)
    assert all((idx[b, i] == i).any() for b in range(2) for i in range(20))


def test_pct_forward_and_batchstats():
    model = build_model("pct", ARGS)
    assert "batch_stats" in model.state  # BN running stats live in state
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3), dtype=np.float32))
    logits, aux = model(x)
    assert logits.shape == (2, 40)
    # train step must update batch_stats via mutable collection
    out, updates = model.module.apply(
        {"params": model.params, **model.state},
        x, train=True, rngs=init_rngs(0), mutable=["batch_stats"],
    )
    stats = updates["batch_stats"]
    before = np.asarray(model.state["batch_stats"]["embedder"]["bn1"]["mean"])
    after = np.asarray(stats["embedder"]["bn1"]["mean"])
    assert np.abs(after - before).max() > 0


def test_rankpct_eval_drop_counts():
    model = build_model("rankpct", ARGS)
    model.enable_ranking(True)
    model.set_budget(0.5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3), dtype=np.float32))
    logits, aux = model(x)
    assert logits.shape == (2, 40)
    # layer 0: ceil(64*0.5)=32 kept; layer 1: ceil(32*0.5)=16
    m0 = np.asarray(aux["masks"]["layer_0"]).sum(axis=(1, 2))
    m1 = np.asarray(aux["masks"]["layer_1"]).sum(axis=(1, 2))
    assert m0.tolist() == [32, 32]
    assert m1.tolist() == [16, 16]


def test_rankpct_train_masks_relative_to_full():
    """Train zeroes ceil((N-1)*b) of non-protected tokens, NOT compounding."""
    model = build_model("rankpct", ARGS)
    model.enable_ranking(True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3), dtype=np.float32))
    _, aux = model.module.apply(
        {"params": model.params, **model.state},
        x, train=True, budget=jnp.float32(0.5),
        rngs=init_rngs(0), mutable=["batch_stats"],
    )[0]
    # each layer: 1 protected + ceil(63*0.5)=32 kept = 33
    for name, m in aux["masks"].items():
        assert np.asarray(m).sum(axis=(1, 2)).tolist() == [33.0, 33.0], name


def test_rankpct_ranking_disabled_is_plain():
    model = build_model("rankpct", ARGS)
    model.set_budget(0.5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3), dtype=np.float32))
    _, aux = model(x)
    assert aux["masks"] == {}  # no ranking without enable_ranking
    model.enable_ranking([True, False])
    _, aux = model(x)
    assert set(aux["masks"]) == {"layer_0"}


def test_pct_engine_matches_linen():
    """PCT fused engine (ARPE + BN head on XLA, blocks on the merged
    folded kernels via the shared _encoder_stack) vs the linen eval
    forward."""
    from peekvit_tpu.inference import InferenceEngine

    model = build_model("pct", ARGS)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    want, _ = model(x)
    eng = InferenceEngine(model, compute_dtype=jnp.float32)
    got = eng(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # bf16 compute stays close in class ranking
    eng16 = InferenceEngine(model)  # bf16 default
    got16 = eng16(x)
    assert (np.asarray(got16).argmax(-1) == np.asarray(want).argmax(-1)
            ).mean() >= 0.75


def test_pct_engine_guards():
    from peekvit_tpu.inference import InferenceEngine

    model = build_model("pct", ARGS)
    with pytest.raises(NotImplementedError, match="bf16 eval only"):
        InferenceEngine(model, quantized=True)


def test_rankpct_engine_matches_linen():
    """RankPCT physical-drop engine vs the linen eval forward (key-masked
    queries that never re-enter keys or the pooled mean == physically
    dropped; PCT has no positional embedding)."""
    from peekvit_tpu.inference import InferenceEngine

    model = build_model("rankpct", ARGS)
    model.enable_ranking(True)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    eng = InferenceEngine(model, compute_dtype=jnp.float32)
    for budget in (0.5, 0.25, 1.0):
        model.set_budget(budget)
        want, aux = model(x)
        got = eng(x, budget=budget)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"budget {budget}")
    # no budget -> ranking blocks never fire, plain PCT math
    model.set_budget(None)
    want, _ = model(x)
    np.testing.assert_allclose(np.asarray(eng(x)), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
