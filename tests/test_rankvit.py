"""RankViT: torch parity (masked == physically dropped), budget compounding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from peekvit_tpu.models import build_model
from peekvit_tpu.models.adapters import convert_torch_state_dict, transfer_params

from tests.torch_reference import TorchRankViT

ARGS = dict(
    image_size=32, patch_size=8, num_layers=3, num_heads=4,
    hidden_dim=64, mlp_dim=128, num_classes=10, rankvit_layers=[0, 2],
)


def _build_pair(seed=0):
    torch.manual_seed(seed)
    tref = TorchRankViT(
        **{k: v for k, v in ARGS.items() if k != "rankvit_layers"},
        rankvit_layers=ARGS["rankvit_layers"],
    ).eval()
    with torch.no_grad():
        tref.head.weight.normal_(0, 0.05)
        tref.head.bias.normal_(0, 0.05)
    model = build_model("rankvit", ARGS)
    merged, missing, _ = transfer_params(
        convert_torch_state_dict(tref.peekvit_state_dict()), model.params
    )
    assert not missing, missing
    model.params = merged
    return tref, model


@pytest.mark.parametrize("budget", [0.25, 0.5, 0.75, 1.0])
def test_rankvit_logits_match_torch(budget):
    """Masked ranking == the reference's physical sort+drop (class logits)."""
    tref, model = _build_pair()
    x = torch.randn(3, 3, 32, 32)
    tref.set_budget(budget)
    with torch.no_grad():
        ref = tref(x).numpy()
    model.set_budget(budget)
    logits, aux = model(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-3, atol=1e-4)


def test_rankvit_mask_counts_compound():
    """ceil(alive*budget) compounds across ranked layers like shrinking shapes."""
    _, model = _build_pair()
    model.set_budget(0.5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    _, aux = model(x)
    m0 = np.asarray(aux["masks"]["layer_0"]).sum(axis=(1, 2))
    m2 = np.asarray(aux["masks"]["layer_2"]).sum(axis=(1, 2))
    assert (m0 == 8).all()  # ceil(16*0.5)
    assert (m2 == 4).all()  # ceil(8*0.5)


def test_rankvit_single_compile_across_budgets():
    _, model = _build_pair()
    x = jnp.zeros((2, 32, 32, 3))
    fn = model.apply_fn()
    traces = 0

    def counted(params, xx, budget, nv, rngs):
        nonlocal traces
        traces += 1
        return fn(params, xx, budget, nv, rngs, train=False)

    jitted = jax.jit(counted)
    for b in [0.2, 0.4, 0.8, 1.0]:
        jitted(model.params, x, jnp.float32(b), None, {})
    assert traces == 1


def test_rankvit_per_layer_budget_list():
    """Budget list is indexed by layer id (reference rankvit.py:287-288)."""
    _, model = _build_pair()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3), dtype=np.float32))
    budgets = jnp.zeros((3,)).at[0].set(0.5).at[2].set(1.0)
    _, aux = model(x, budget=budgets)
    assert np.asarray(aux["masks"]["layer_0"]).sum(axis=(1, 2)).tolist() == [8, 8]
    assert np.asarray(aux["masks"]["layer_2"]).sum(axis=(1, 2)).tolist() == [8, 8]


def test_rankvit_rejects_registers():
    with pytest.raises(ValueError, match="Registers are not supported"):
        build_model("rankvit", dict(ARGS, num_registers=2))
