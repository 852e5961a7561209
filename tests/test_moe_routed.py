"""Routed top-1 MoE dispatch (VERDICT r4 #2): the opt-in engine mode that
computes ONE expert per token (gather-sort-gather capacity dispatch,
inference._routed_moe_mlp) instead of the reference's dense every-expert
execution (/root/reference/models/moevit.py:49-61). Exact vs the dense
combine whenever every expert's load fits its capacity; overflow tokens
contribute zero (measured, not silent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peekvit_tpu.inference import InferenceEngine, _routed_moe_mlp
from peekvit_tpu.models.registry import build_model

ARGS = dict(image_size=32, patch_size=8, num_layers=3, num_heads=2,
            hidden_dim=32, mlp_dim=64, num_classes=10,
            mlp_moes=[1, 2, 4])


def _moe_model(seed=4, args=ARGS):
    model = build_model("moevit", args, seed=seed)
    rng = np.random.default_rng(seed + 50)
    p = jax.tree.map(lambda x: np.array(x, np.float32), model.params)
    p["head"]["kernel"][:] = rng.normal(0, 0.05, p["head"]["kernel"].shape)
    model.params = jax.tree.map(jnp.asarray, p)
    return model


def test_routed_matches_dense_at_full_capacity():
    """capacity factor E => cap = T: routing can never overflow, so the
    routed engine must match the dense reference combine (and linen)."""
    model = _moe_model(4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    want, _ = model(x)
    dense = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    routed = InferenceEngine(model, compute_dtype=jnp.float32,
                             interpret=True, routed=4.0)
    got_d = np.asarray(dense(x))
    got_r = np.asarray(routed(x))
    np.testing.assert_allclose(got_r, got_d, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_r, np.asarray(want), rtol=2e-4, atol=2e-4)
    assert np.array_equal(got_r.argmax(-1), np.asarray(want).argmax(-1))


def test_routed_default_capacity_stays_close():
    """routed=True (capacity factor 2.0): on the random fixture some
    experts may overflow; class ranking must survive."""
    model = _moe_model(6)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    dense = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    routed = InferenceEngine(model, compute_dtype=jnp.float32,
                             interpret=True, routed=True)
    got_d = np.asarray(dense(x))
    got_r = np.asarray(routed(x))
    agree = np.mean(got_r.argmax(-1) == got_d.argmax(-1))
    assert agree >= 0.75, agree


def test_routed_dispatch_unit_exact_and_overflow_semantics():
    """_routed_moe_mlp against a hand-computed dense loop: exact at
    cap >= max load; with cap 1 the overflowing tokens (latest in token
    order per expert) contribute exactly zero."""
    rng = np.random.default_rng(7)
    b, n, d, m, e = 2, 4, 8, 16, 2
    z = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    gating = {"gate": {"kernel": jnp.asarray(rng.normal(size=(d, e)),
                                             jnp.float32),
                       "bias": jnp.zeros((e,), jnp.float32)}}
    experts = {
        "fc1_kernel": jnp.asarray(rng.normal(size=(e, d, m)), jnp.float32),
        "fc1_bias": jnp.asarray(rng.normal(size=(e, m)), jnp.float32),
        "fc2_kernel": jnp.asarray(rng.normal(size=(e, m, d)), jnp.float32),
        "fc2_bias": jnp.asarray(rng.normal(size=(e, d)), jnp.float32),
    }
    cast = lambda t: t  # noqa: E731
    zf = z.reshape(-1, d)
    scores = zf @ gating["gate"]["kernel"]
    eid = np.asarray(jnp.argmax(scores, -1))
    dense_rows = []
    for i, tok in enumerate(np.asarray(zf)):
        k = eid[i]
        h = np.asarray(jax.nn.gelu(
            jnp.asarray(tok) @ experts["fc1_kernel"][k]
            + experts["fc1_bias"][k], approximate=False))
        dense_rows.append(h @ np.asarray(experts["fc2_kernel"][k])
                          + np.asarray(experts["fc2_bias"][k]))
    dense_rows = np.stack(dense_rows).reshape(b, n, d)

    got = np.asarray(_routed_moe_mlp(z, gating, experts, cast, float(e)))
    np.testing.assert_allclose(got, dense_rows, rtol=1e-5, atol=1e-5)

    # capacity 1 row per expert: only the FIRST token routed to each
    # expert (token order) survives; the rest are zero
    tiny = np.asarray(_routed_moe_mlp(z, gating, experts, cast,
                                      e / (b * n)))
    flat = tiny.reshape(-1, d)
    seen = set()
    for i in range(b * n):
        if eid[i] not in seen:
            seen.add(eid[i])
            np.testing.assert_allclose(flat[i],
                                       dense_rows.reshape(-1, d)[i],
                                       rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_array_equal(flat[i], np.zeros(d))


def test_routed_guards():
    model = _moe_model(8)
    with pytest.raises(NotImplementedError, match="bf16-only"):
        InferenceEngine(model, interpret=True, routed=True, quantized=True)
    with pytest.raises(ValueError, match="capacity factor"):
        InferenceEngine(model, interpret=True, routed=-1.0)
    plain = build_model("vit", dict(image_size=32, patch_size=8,
                                    num_layers=2, num_heads=2,
                                    hidden_dim=32, mlp_dim=64,
                                    num_classes=10), seed=9)
    with pytest.raises(NotImplementedError, match="VisionTransformerMoE"):
        InferenceEngine(plain, interpret=True, routed=True)


def test_routed_composes_with_attention_moes_dense():
    """Attention MoEs stay dense under routed= (K/V must span all tokens
    per expert); the MLP routing still applies."""
    model = _moe_model(10, dict(ARGS, attn_moes=[1, 2, 1]))
    x = jnp.asarray(np.random.default_rng(5).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    dense = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    routed = InferenceEngine(model, compute_dtype=jnp.float32,
                             interpret=True, routed=4.0)
    np.testing.assert_allclose(np.asarray(routed(x)), np.asarray(dense(x)),
                               rtol=2e-5, atol=2e-5)


def test_routed_min_experts_includes_small_layers_when_asked():
    """Default keeps E=2 layers dense (dispatch cost exceeds the 2x->cf
    row saving); routed_min_experts=2 routes them too, still exact at
    full capacity."""
    model = _moe_model(12)
    x = jnp.asarray(np.random.default_rng(13).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    dense = InferenceEngine(model, compute_dtype=jnp.float32, interpret=True)
    routed_all = InferenceEngine(model, compute_dtype=jnp.float32,
                                 interpret=True, routed=4.0,
                                 routed_min_experts=2)
    np.testing.assert_allclose(np.asarray(routed_all(x)),
                               np.asarray(dense(x)), rtol=2e-5, atol=2e-5)
