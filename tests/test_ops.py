"""Unit + torch-parity tests for core ops (SURVEY.md §4 test strategy, item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from peekvit_tpu.ops.attention import multi_head_attention
from peekvit_tpu.ops.mlp import mlp_forward
from peekvit_tpu.ops.patch_embed import patch_embed, extract_patches
from peekvit_tpu.ops.gates import (
    gumbel_sigmoid,
    gumbel_softmax,
    hard_sigmoid_eval,
    sigmoid_with_temp,
)
from peekvit_tpu.ops.noise import gaussian_snr_noise, token_drop_noise
from peekvit_tpu.ops.ranking import token_rank_mask, gather_topk_tokens

RTOL, ATOL = 1e-5, 1e-5


def test_mha_matches_torch():
    """Our MHSA must match torch.nn.MultiheadAttention(batch_first=True)."""
    torch.manual_seed(0)
    b, n, d, h = 2, 17, 64, 4
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    x = torch.randn(b, n, d)
    with torch.no_grad():
        ref, _ = mha(x, x, x, need_weights=True)

    params = {
        "in_proj": {
            "kernel": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
            "bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        },
        "out_proj": {
            "kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        },
    }
    out = multi_head_attention(jnp.asarray(x.numpy()), params, h)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_mha_key_mask_equals_physical_drop():
    """Masked attention == attention over physically-dropped tokens."""
    rng = np.random.default_rng(1)
    b, n, d, h = 2, 12, 32, 4
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    kd = rng.standard_normal((d, 3 * d)).astype(np.float32) * 0.05
    kb = rng.standard_normal((3 * d,)).astype(np.float32) * 0.05
    od = rng.standard_normal((d, d)).astype(np.float32) * 0.05
    ob = rng.standard_normal((d,)).astype(np.float32) * 0.05
    params = {
        "in_proj": {"kernel": jnp.asarray(kd), "bias": jnp.asarray(kb)},
        "out_proj": {"kernel": jnp.asarray(od), "bias": jnp.asarray(ob)},
    }
    keep = 7
    mask = jnp.asarray(np.concatenate([np.ones(keep), np.zeros(n - keep)])[None].repeat(b, 0))
    masked = multi_head_attention(jnp.asarray(x), params, h, key_mask=mask)
    dropped = multi_head_attention(jnp.asarray(x[:, :keep]), params, h)
    np.testing.assert_allclose(
        np.asarray(masked[:, :keep]), np.asarray(dropped), rtol=1e-5, atol=1e-5
    )


def test_mlp_matches_torch():
    torch.manual_seed(0)
    d, m = 32, 64
    fc1 = torch.nn.Linear(d, m)
    fc2 = torch.nn.Linear(m, d)
    x = torch.randn(3, 7, d)
    with torch.no_grad():
        ref = fc2(torch.nn.functional.gelu(fc1(x)))
    params = {
        "fc1": {
            "kernel": jnp.asarray(fc1.weight.detach().numpy().T),
            "bias": jnp.asarray(fc1.bias.detach().numpy()),
        },
        "fc2": {
            "kernel": jnp.asarray(fc2.weight.detach().numpy().T),
            "bias": jnp.asarray(fc2.bias.detach().numpy()),
        },
    }
    out = mlp_forward(jnp.asarray(x.numpy()), params)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_patch_embed_matches_torch_conv():
    """Reshaped-matmul patch embed == stride-P conv (reference vit.py:203-222)."""
    torch.manual_seed(0)
    p, d, img = 4, 24, 16
    conv = torch.nn.Conv2d(3, d, kernel_size=p, stride=p)
    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        ref = conv(x).reshape(2, d, -1).permute(0, 2, 1)  # (B, N, D)

    # torch OIHW (D, C, P, P) -> our (P, P, C) patch order -> (P*P*C, D)
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0).reshape(p * p * 3, d)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = patch_embed(x_nhwc, jnp.asarray(w), jnp.asarray(conv.bias.detach().numpy()), p)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_extract_patches_shape():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    patches = extract_patches(x, 4)
    assert patches.shape == (2, 4, 48)


def test_layernorm_matches_torch():
    torch.manual_seed(0)
    d = 48
    ln = torch.nn.LayerNorm(d, eps=1e-6)
    with torch.no_grad():
        ln.weight.mul_(1.7).add_(0.1)
        ln.bias.add_(0.3)
    x = torch.randn(2, 5, d)
    ref = ln(x).detach().numpy()
    import flax.linen as nn

    mod = nn.LayerNorm(epsilon=1e-6)
    params = {
        "scale": jnp.asarray(ln.weight.detach().numpy()),
        "bias": jnp.asarray(ln.bias.detach().numpy()),
    }
    out = mod.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- gates


def test_gumbel_sigmoid_hard_is_binary_and_st():
    logits = jnp.linspace(-3, 3, 64).reshape(8, 8)
    out = gumbel_sigmoid(logits, jax.random.key(0), tau=1.0, bias=0.0, hard=True)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
    # straight-through: gradient flows as if soft
    g = jax.grad(lambda l: gumbel_sigmoid(l, jax.random.key(0), hard=True).sum())(logits)
    assert np.all(np.asarray(g) > 0)  # d(sigmoid)/dx > 0 everywhere


def test_gumbel_sigmoid_eval_threshold():
    """Eval: round(sigmoid(x)), bias/temp ignored (reference blocks.py:57)."""
    logits = jnp.array([-5.0, -0.1, 0.1, 5.0])
    np.testing.assert_array_equal(np.asarray(hard_sigmoid_eval(logits)), [0, 0, 1, 1])


def test_gumbel_softmax_eval_is_argmax_onehot():
    x = jnp.array([[0.1, 2.0, -1.0], [3.0, 0.0, 0.0]])
    out = gumbel_softmax(x, None, train=False)
    np.testing.assert_array_equal(np.asarray(out), [[0, 1, 0], [1, 0, 0]])


def test_gumbel_softmax_train_hard_onehot_rows():
    x = jax.random.normal(jax.random.key(1), (16, 4))
    out = gumbel_softmax(x, jax.random.key(2), hard=True, train=True)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), np.ones(16), rtol=1e-6)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def test_sigmoid_with_temp():
    x = jnp.array([0.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(sigmoid_with_temp(x, temp=2.0, bias=1.0)),
        1.0 / (1.0 + np.exp(-(np.array([0.0, 1.0]) / 2.0 + 1.0))),
        rtol=1e-6,
    )


# ---------------------------------------------------------------- noise


def test_gaussian_snr_zero_is_identity():
    """snr_db == 0 is the no-noise sentinel (reference blocks.py:124-126)."""
    x = jax.random.normal(jax.random.key(0), (2, 5, 8))
    out = gaussian_snr_noise(x, 0.0, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_gaussian_snr_power_ratio():
    x = jax.random.normal(jax.random.key(0), (64, 128, 32))
    snr_db = 10.0
    noised = gaussian_snr_noise(x, snr_db, jax.random.key(1))
    noise = np.asarray(noised - x)
    sig_p = np.mean(np.asarray(x) ** 2)
    noise_p = np.mean(noise**2)
    measured_snr_db = 10 * np.log10(sig_p / noise_p)
    assert abs(measured_snr_db - snr_db) < 0.5


def test_token_drop_count_and_shared_mask():
    x = jnp.ones((4, 20, 8))
    out = token_drop_noise(x, 0.25, jax.random.key(0))
    zeroed = np.asarray(out).sum(-1) == 0  # (B, N)
    assert zeroed.sum(1).tolist() == [5, 5, 5, 5]  # int(0.25*20) per sample
    assert (zeroed == zeroed[0]).all()  # same indices across batch


def test_token_drop_zero_prob_identity():
    x = jax.random.normal(jax.random.key(0), (2, 10, 4))
    out = token_drop_noise(x, 0.0, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


# ---------------------------------------------------------------- ranking


def test_rank_mask_keeps_ceil_budget():
    """ceil(n*budget) kept per ranked layer (reference rankvit.py:74-75)."""
    x = jax.random.normal(jax.random.key(0), (3, 10, 16))
    for budget, expect in [(0.25, 3), (0.5, 5), (0.75, 8), (1.0, 10)]:
        mask = token_rank_mask(x, budget)
        assert mask.sum(-1).tolist() == [expect] * 3, budget


def test_rank_mask_keeps_largest_norms():
    x = np.random.default_rng(0).standard_normal((2, 8, 4)).astype(np.float32)
    mask = np.asarray(token_rank_mask(jnp.asarray(x), 0.5))
    norms = np.linalg.norm(x, axis=-1)
    for b in range(2):
        kept = set(np.where(mask[b] > 0)[0])
        expected = set(np.argsort(-norms[b])[:4])
        assert kept == expected


def test_gather_topk_matches_torch_sort_and_drop():
    """Packed gather == reference torch sort+gather path (rankvit.py:61-75)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 6)).astype(np.float32)
    xt = torch.tensor(x)
    mags = torch.norm(xt, dim=-1)
    idx = torch.argsort(mags, dim=-1, descending=True, stable=True).unsqueeze(-1)
    ref = torch.gather(xt, 1, idx.expand(-1, -1, 6))[:, :5]
    out = gather_topk_tokens(jnp.asarray(x), 5)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-6, atol=1e-6)


def test_rank_mask_single_compile_across_budgets():
    """jit-stability: one trace serves every budget (SURVEY.md §4 item 3)."""
    traces = 0

    def fn(x, budget):
        nonlocal traces
        traces += 1
        return token_rank_mask(x, budget)

    jfn = jax.jit(fn)
    x = jnp.ones((2, 10, 4))
    for b in [0.2, 0.4, 0.8, 1.0]:
        jfn(x, jnp.float32(b)).block_until_ready()
    assert traces == 1
