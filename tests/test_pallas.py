"""Parity tests for Pallas TPU kernels vs the pure-jnp source of truth
(interpret mode on the CPU test mesh; the same kernels compile on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from peekvit_tpu.ops.attention import (
    attention_core,
    get_attention_impl,
    multi_head_attention,
    set_attention_impl,
)
from peekvit_tpu.ops.pallas.fused_attention import fused_attention


@pytest.mark.parametrize("n", [7, 64, 197])
@pytest.mark.parametrize("num_heads", [1, 4])
def test_fused_attention_parity(n, num_heads):
    rng = np.random.default_rng(0)
    b, d = 2, 32
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32) for _ in range(3)
    )
    want = attention_core(q, k, v, num_heads)
    got = fused_attention(q, k, v, num_heads, True)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_bf16():
    rng = np.random.default_rng(1)
    b, n, d = 2, 50, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, n, d)), jnp.bfloat16) for _ in range(3)
    )
    want = attention_core(q, k, v, 4)
    got = fused_attention(q, k, v, 4, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_impl_switch_full_mhsa():
    """multi_head_attention with impl='pallas' matches 'xla' end to end."""
    rng = np.random.default_rng(2)
    d = 32
    x = jnp.asarray(rng.normal(size=(2, 17, d)), jnp.float32)
    params = {
        "in_proj": {
            "kernel": jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.1, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(3 * d,)) * 0.1, jnp.float32),
        },
        "out_proj": {
            "kernel": jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32),
        },
    }
    want = multi_head_attention(x, params, 4)
    assert get_attention_impl() == "xla"
    set_attention_impl("pallas")
    try:
        got = multi_head_attention(x, params, 4)
    finally:
        set_attention_impl("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_impl_training_grads():
    """With impl='pallas', non-deterministic (training) forwards must take
    the differentiable XLA path: jax.grad works and matches impl='xla'.
    Regression for the fused-kernel-has-no-VJP guard (ADVICE r1)."""
    rng = np.random.default_rng(11)
    d = 32
    x = jnp.asarray(rng.normal(size=(2, 9, d)), jnp.float32)
    params = {
        "in_proj": {
            "kernel": jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.1, jnp.float32),
            "bias": jnp.zeros((3 * d,), jnp.float32),
        },
        "out_proj": {
            "kernel": jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32),
        },
    }

    def loss(p):
        # dropout_rate=0.0 but deterministic=False — a training forward
        return jnp.sum(
            multi_head_attention(x, p, 4, deterministic=False) ** 2
        )

    want = jax.grad(loss)(params)
    set_attention_impl("pallas")
    try:
        got = jax.grad(loss)(params)
    finally:
        set_attention_impl("xla")
    for path in ("in_proj", "out_proj"):
        np.testing.assert_allclose(
            np.asarray(got[path]["kernel"]), np.asarray(want[path]["kernel"]),
            rtol=2e-5, atol=2e-5,
        )


def test_pallas_path_respects_mask_fallback():
    """key_mask forces the jnp path even when impl='pallas'."""
    rng = np.random.default_rng(3)
    d = 16
    x = jnp.asarray(rng.normal(size=(1, 9, d)), jnp.float32)
    params = {
        "in_proj": {"kernel": jnp.eye(d, 3 * d), "bias": jnp.zeros((3 * d,))},
        "out_proj": {"kernel": jnp.eye(d), "bias": jnp.zeros((d,))},
    }
    mask = jnp.ones((1, 9)).at[0, -3:].set(0)
    set_attention_impl("pallas")
    try:
        out = multi_head_attention(x, params, 2, key_mask=mask)
    finally:
        set_attention_impl("xla")
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("n", [9, 197])
def test_fused_mhsa_parity(n):
    """Packed-qkv whole-image kernel matches the jnp core."""
    from peekvit_tpu.ops.pallas.fused_attention import fused_mhsa

    rng = np.random.default_rng(4)
    b, d, heads = 2, 48, 4
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * d)), jnp.float32)
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
    want = attention_core(q, k, v, heads)
    got = fused_mhsa(qkv, heads, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_keymasked_block_inert_to_garbage_in_excluded_rows():
    """Excluded key rows must be fully inert even when they hold NaN/Inf
    (ADVICE r3: the padded RankViT engines never re-zero dropped rows, and
    the folded ones-column / e*kmask multiplies propagated 0*NaN=NaN into
    every query's softmax denominator)."""
    from peekvit_tpu.ops.pallas.fused_attention import (
        keymasked_attention_block,
        keymasked_layer_block_folded,
    )

    rng = np.random.default_rng(9)
    b, n, d, h = 2, 12, 32, 4
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    km = jnp.ones((b, 1, n), jnp.float32).at[:, :, -4:].set(0.0)
    # poison the excluded rows with NaN and Inf
    bad = x.at[:, -4:-2].set(jnp.nan).at[:, -2:].set(jnp.inf)

    args = dict(
        ln_scale=jnp.ones((d,)), ln_bias=jnp.zeros((d,)),
        w_qkv=jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.1, jnp.float32),
        b_qkv=jnp.zeros((3 * d,)),
        w_out=jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32),
        b_out=jnp.zeros((d,)),
    )
    want = keymasked_attention_block(x, km, *args.values(), h, 1e-5, True)
    got = keymasked_attention_block(bad, km, *args.values(), h, 1e-5, True)
    # valid rows: unchanged by garbage in excluded rows, and finite
    np.testing.assert_allclose(np.asarray(got[:, :-4]),
                               np.asarray(want[:, :-4]), rtol=1e-6, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(got[:, :-4])))

    m = 64
    wargs = (
        args["w_qkv"], args["b_qkv"], args["w_out"], args["b_out"],
        jnp.asarray(rng.normal(size=(d, m)) * 0.1, jnp.float32),
        jnp.zeros((m,)),
        jnp.asarray(rng.normal(size=(m, d)) * 0.1, jnp.float32),
        jnp.zeros((d,)),
    )
    want2 = keymasked_layer_block_folded(x, km, *wargs, h, 1e-5, True)
    got2 = keymasked_layer_block_folded(bad, km, *wargs, h, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got2[:, :-4]),
                               np.asarray(want2[:, :-4]),
                               rtol=1e-6, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(got2[:, :-4])))
