"""Parity tests for peekvit_tpu.utils.losses vs torch re-statements of the
reference regularizers (reference utils/losses.py:34-203, 417-476)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from peekvit_tpu.utils import losses as L


def _rand_masks(seed=0, layers=4, b=3, s=17):
    rng = np.random.default_rng(seed)
    return {
        f"layer_{i}": rng.uniform(size=(b, s, 1)).astype(np.float32)
        for i in range(layers)
    }


def _aux(masks):
    return {"masks": {k: jnp.asarray(v) for k, v in masks.items()}}


def _torch_sparsities(masks):
    return [torch.tensor(m).mean(dim=(1, 2)) for m in masks.values()]


def test_sparsity_l1_and_mse_parity():
    masks = _rand_masks()
    budget = 0.65
    sp = _torch_sparsities(masks)
    want_l1 = torch.stack([torch.mean(torch.abs(s - budget)) for s in sp]).mean()
    want_mse = torch.stack([torch.mean((s - budget) ** 2) for s in sp]).mean()
    got_l1 = L.sparsity_loss_per_block(_aux(masks), budget, "l1")
    got_mse = L.sparsity_loss_per_block(_aux(masks), budget, "mse")
    np.testing.assert_allclose(got_l1, want_l1.numpy(), rtol=1e-6)
    np.testing.assert_allclose(got_mse, want_mse.numpy(), rtol=1e-6)


def test_sparsity_cross_entropy_parity():
    """torch cross_entropy with (B,) float target = probabilistic-target mode
    (reference losses.py:62-63)."""
    masks = _rand_masks(layers=2)
    budget = 0.4
    want = torch.stack(
        [
            F.cross_entropy(s, torch.full_like(s, budget))
            for s in _torch_sparsities(masks)
        ]
    ).mean()
    got = L.sparsity_loss_per_block(_aux(masks), budget, "cross_entropy")
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5)


def test_entropy_per_blocks_parity():
    masks = _rand_masks(seed=1)
    want = torch.stack(
        [torch.special.entr(s) for s in _torch_sparsities(masks)]
    ).mean()
    got = L.entropy_per_blocks(_aux(masks))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6)


def test_solo_l1_sums_over_batch():
    masks = _rand_masks(seed=2)
    budget = 0.25
    want = torch.stack(
        [torch.sum(torch.abs(s - budget)) for s in _torch_sparsities(masks)]
    ).mean()
    got = L.solo_l1(_aux(masks), budget)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6)


@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("per_layer", [True, False])
def test_solo_mse_parity(strict, per_layer):
    masks = _rand_masks(seed=3)
    budget = 0.5
    skip = [1]
    sp = [
        s
        for i, s in enumerate(_torch_sparsities(masks))
        if i not in skip
    ]

    def pen(x):
        d = (x - budget) if strict else F.relu(x - budget)
        return d**2

    if per_layer:
        stacked = torch.stack([torch.sum(pen(s)) for s in sp])
    else:
        stacked = torch.sum(pen(torch.stack(sp).mean()))
    want = torch.mean(stacked * (2 - budget))
    got = L.solo_mse(_aux(masks), budget, strict, skip_layers=skip, per_layer=per_layer)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-8)


def test_l1_and_intraentropy_parity():
    masks = _rand_masks(seed=4)
    budget = 0.65
    want = torch.stack(
        [torch.sum(F.relu(s - budget)) for s in _torch_sparsities(masks)]
    ).mean()
    got = L.l1_and_intraentropy(_aux(masks), budget)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6)


def test_avit_ponder_loss():
    rho = np.random.default_rng(5).uniform(size=(3, 16)).astype(np.float32)
    got = L.avit_ponder_loss({"rho_token": jnp.asarray(rho)})
    np.testing.assert_allclose(got, rho.mean(), rtol=1e-6)


def test_avit_distr_prior_loss_parity():
    """Pin against torch's kl_div(log h, log t, log_target, batchmean)
    (reference losses.py:160-184)."""
    num_layers = 12
    target_depth = 7
    h_raw = np.random.default_rng(6).uniform(0.1, 1.0, size=num_layers).astype(np.float32)

    t_dist = torch.distributions.Normal(loc=float(target_depth), scale=1.0)
    log_t = t_dist.log_prob(torch.arange(num_layers).float() + 1)
    h = torch.tensor(h_raw)
    h = h / h.sum()
    h = torch.clamp(h, 0.001, 0.999)
    want = F.kl_div(h.log(), log_t, reduction="batchmean", log_target=True)

    got = L.avit_distr_prior_loss(
        {"halting_score_layer": jnp.asarray(h_raw)}, target_depth=target_depth
    )
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5)


def test_loss_compose_weights_and_targets():
    masks = _rand_masks(seed=7)
    cfg = {
        "sparsity_mse": {
            "_target_": "peekvit.utils.losses.MSELoss",
            "weight": 2.0,
            "budget": 0.5,
        },
        "entropy": {"_target_": "peekvit.utils.losses.EntropyLoss", "weight": 0.1},
        "zero": {"_target_": "peekvit.utils.losses.AlwaysZeroLoss"},
    }
    compose = L.LossCompose(cfg)
    d, total = compose.compute(_aux(masks), budget=0.5, dict_prefix="train/")
    assert set(d) == {"train/sparsity_mse", "train/entropy", "train/zero"}
    np.testing.assert_allclose(total, sum(np.asarray(v) for v in d.values()), rtol=1e-6)
    np.testing.assert_allclose(
        d["train/sparsity_mse"],
        2.0 * np.asarray(L.solo_mse(_aux(masks), 0.5)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(d["train/zero"], 0.0)


def test_loss_compose_budget_override_is_traced_safe():
    """Budget can be a traced scalar — sweeps don't recompile or crash."""
    import jax

    masks = _aux(_rand_masks(seed=8))
    compose = L.LossCompose(
        {"mse": {"_target_": "peekvit.utils.losses.MSELoss", "budget": 0.9}}
    )

    @jax.jit
    def f(budget):
        return compose.compute(masks, budget=budget, return_dict=False)

    a, b = f(jnp.float32(0.3)), f(jnp.float32(0.8))
    assert np.asarray(a) != np.asarray(b)
