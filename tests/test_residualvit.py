"""ResidualViT: gate semantics, budget token plumbing, torch block parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from peekvit_tpu.models import build_model, init_rngs
from peekvit_tpu.models.adapters import transfer_params, from_vit_to_residual_vit
from peekvit_tpu.models.residualvit import ResidualViTBlock

from tests.torch_reference import TorchSigmoidResidualBlock

ARGS = dict(
    image_size=32, patch_size=8, num_layers=2, num_heads=4,
    hidden_dim=64, mlp_dim=128, num_classes=10,
    residual_layers=["attention+mlp", "attention+mlp"],
    gate_type="sigmoid", gate_temp=1.0, gate_bias=0.0,
    add_budget_token=True,
)


def test_block_matches_torch_sigmoid_budget():
    """forward_skip_attention_mlp + masked-LN trick vs torch (eval)."""
    torch.manual_seed(0)
    d, h, m = 32, 4, 64
    tblk = TorchSigmoidResidualBlock(h, d, m).eval()
    b, n_img = 2, 8
    tokens = torch.randn(b, 1 + n_img + 1, d)
    tokens[:, -1, :] = 0.7  # constant budget token
    with torch.no_grad():
        ref, ref_mask = tblk(tokens)

    blk = ResidualViTBlock(
        num_heads=h, hidden_dim=d, mlp_dim=m, skip="attention+mlp",
        gate_type="sigmoid", gate_bias=0.0, budget_token=True,
    )
    params = {
        "ln_1": {"scale": jnp.asarray(tblk.ln_1.weight.detach().numpy()),
                 "bias": jnp.asarray(tblk.ln_1.bias.detach().numpy())},
        "ln_2": {"scale": jnp.asarray(tblk.ln_2.weight.detach().numpy()),
                 "bias": jnp.asarray(tblk.ln_2.bias.detach().numpy())},
        "self_attention": {
            "in_proj_kernel": jnp.asarray(tblk.self_attention.in_proj_weight.detach().numpy().T),
            "in_proj_bias": jnp.asarray(tblk.self_attention.in_proj_bias.detach().numpy()),
            "out_proj_kernel": jnp.asarray(tblk.self_attention.out_proj.weight.detach().numpy().T),
            "out_proj_bias": jnp.asarray(tblk.self_attention.out_proj.bias.detach().numpy()),
        },
        "mlp": {
            "fc1_kernel": jnp.asarray(tblk.mlp.fc1.weight.detach().numpy().T),
            "fc1_bias": jnp.asarray(tblk.mlp.fc1.bias.detach().numpy()),
            "fc2_kernel": jnp.asarray(tblk.mlp.fc2.weight.detach().numpy().T),
            "fc2_bias": jnp.asarray(tblk.mlp.fc2.bias.detach().numpy()),
        },
        "residual_gate": {
            "projection": {
                "kernel": jnp.asarray(tblk.gate_proj.weight.detach().numpy().T),
                "bias": jnp.asarray(tblk.gate_proj.bias.detach().numpy()),
            }
        },
    }
    out, mask = blk.apply({"params": params}, jnp.asarray(tokens.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(mask), ref_mask.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_masked_tokens_stay_zero():
    """The mask*LN trick keeps gated tokens exactly zero through the block
    (load-bearing for FLOPs accounting, reference residualvit.py:249-260)."""
    model = build_model("residualvit", dict(ARGS, gate_bias=-100.0))
    # gate_bias=-100 -> sigmoid ~ 0 -> relu(0 - (1-b)) = 0 -> all img tokens gated off
    model.set_budget(0.5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    _, aux = model(x)
    for name, mask in aux["masks"].items():
        assert float(np.abs(np.asarray(mask)).max()) == 0.0, name


def test_budget_pushes_mask_density():
    """Higher budget -> denser masks (relu(m-(1-b)) monotone in b)."""
    model = build_model("residualvit", ARGS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    densities = []
    for b in [0.1, 0.5, 1.0]:
        model.set_budget(b)
        _, aux = model(x)
        densities.append(float(np.mean([np.asarray(m).mean() for m in aux["masks"].values()])))
    assert densities[0] < densities[1] < densities[2]


def test_eval_requires_budget():
    model = build_model("residualvit", ARGS)
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="Budget not set"):
        model.module.apply({"params": model.params}, x, train=False)


def test_train_samples_budget_and_reports_aux():
    model = build_model("residualvit", ARGS)
    x = jnp.zeros((4, 32, 32, 3))
    logits, aux = model.module.apply(
        {"params": model.params}, x, train=True, rngs=init_rngs(1)
    )
    cb = np.asarray(aux["current_budget"])
    assert cb.shape == (4,)
    assert ((cb >= 0) & (cb <= 1)).all()
    assert len(np.unique(cb)) > 1  # per-sample sampling, not one scalar


def test_budget_list_sampling():
    model = build_model("residualvit", dict(ARGS, add_budget_token=[0.25, 0.75]))
    x = jnp.zeros((16, 32, 32, 3))
    _, aux = model.module.apply(
        {"params": model.params}, x, train=True, rngs=init_rngs(2)
    )
    assert set(np.unique(np.asarray(aux["current_budget"]))) <= {0.25, 0.75}


def test_learnable_budget_token_threshold_path():
    model = build_model("residualvit", dict(ARGS, add_budget_token="learnable"))
    assert "learnable_budget_token_1" in model.params
    assert "budget_token_gate" in model.params["encoder"]["layers_0"]
    model.set_budget(0.5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    logits, aux = model(x)
    assert logits.shape == (2, 10)
    assert len(aux["masks"]) == 2


def test_learnable_interpolate_budget_token():
    model = build_model("residualvit", dict(ARGS, add_budget_token="learnable_interpolate"))
    assert "learnable_budget_token_2" in model.params
    model.set_budget(0.3)
    logits, _ = model(jnp.zeros((1, 32, 32, 3)))
    assert logits.shape == (1, 10)


def test_gumbel_gate_binary_masks_eval():
    model = build_model(
        "residualvit",
        dict(ARGS, gate_type="gumbel", add_budget_token=False, gate_bias=10.0),
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    _, aux = model(x)
    for mask in aux["masks"].values():
        assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


def test_vit_to_residualvit_transfer(tmp_path):
    """ViT ckpt -> ResidualViT init (reference adapters.py:8-38)."""
    from peekvit_tpu.utils.checkpoint import save_state

    vit_args = {k: v for k, v in ARGS.items()
                if k not in ("residual_layers", "gate_type", "gate_temp",
                             "gate_bias", "add_budget_token")}
    vit = build_model("vit", vit_args)
    path = save_state(str(tmp_path), vit, epoch=0)
    res = from_vit_to_residual_vit(path, dict(ARGS))
    # backbone weights copied
    np.testing.assert_array_equal(
        np.asarray(res.params["conv_proj"]["kernel"]),
        np.asarray(vit.params["conv_proj"]["kernel"]),
    )
    res.set_budget(1.0)
    logits, _ = res(jnp.zeros((1, 32, 32, 3)))
    assert logits.shape == (1, 10)
