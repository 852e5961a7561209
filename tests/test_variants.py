"""AdaViT (ACT), MoE-ViT, EE-ResidualViT, EncDec, MAE: behavior + parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from peekvit_tpu.models import build_model, init_rngs

from tests.torch_reference import TorchAViTEncoder

BASE = dict(
    image_size=32, patch_size=8, num_layers=3, num_heads=4,
    hidden_dim=64, mlp_dim=128, num_classes=10,
)


# ----------------------------------------------------------------- adavit


def test_adavit_act_matches_torch():
    """The whole ACT encoder (scan) vs the reference loop, gate params set so
    tokens halt at different depths."""
    torch.manual_seed(0)
    b, n, d, h, m, L = 2, 9, 32, 4, 64, 3
    tenc = TorchAViTEncoder(L, h, d, m, seq_length=n, gate_scale=10.0, gate_center=0.0).eval()
    x = torch.randn(b, n, d)
    with torch.no_grad():
        ref = tenc(x)
    ref_rho = tenc.rho_token.numpy()
    ref_hs = torch.stack(tenc.halting_score_layer).detach().numpy()

    from peekvit_tpu.models.adavit import AViTEncoder

    enc = AViTEncoder(
        seq_length=n, num_layers=L, num_heads=h, hidden_dim=d, mlp_dim=m,
        eps=0.01, gate_scale=10.0, gate_center=0.0,
    )
    # stack torch per-layer weights onto the scan axis
    def stack(get):
        return jnp.asarray(np.stack([get(l) for l in tenc.layers]))

    params = {
        "pos_embedding": jnp.zeros((1, n, d)),
        "blocks": {"block": {
            "ln_1": {"scale": stack(lambda l: l.ln_1.weight.detach().numpy()),
                     "bias": stack(lambda l: l.ln_1.bias.detach().numpy())},
            "ln_2": {"scale": stack(lambda l: l.ln_2.weight.detach().numpy()),
                     "bias": stack(lambda l: l.ln_2.bias.detach().numpy())},
            "self_attention": {
                "in_proj_kernel": stack(lambda l: l.self_attention.in_proj_weight.detach().numpy().T),
                "in_proj_bias": stack(lambda l: l.self_attention.in_proj_bias.detach().numpy()),
                "out_proj_kernel": stack(lambda l: l.self_attention.out_proj.weight.detach().numpy().T),
                "out_proj_bias": stack(lambda l: l.self_attention.out_proj.bias.detach().numpy()),
            },
            "mlp": {
                "fc1_kernel": stack(lambda l: l.mlp.fc1.weight.detach().numpy().T),
                "fc1_bias": stack(lambda l: l.mlp.fc1.bias.detach().numpy()),
                "fc2_kernel": stack(lambda l: l.mlp.fc2.weight.detach().numpy().T),
                "fc2_bias": stack(lambda l: l.mlp.fc2.bias.detach().numpy()),
            },
        }},
        "ln": {"scale": jnp.asarray(tenc.ln.weight.detach().numpy()),
               "bias": jnp.asarray(tenc.ln.bias.detach().numpy())},
    }
    out, aux = enc.apply({"params": params}, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(aux["rho_token"]), ref_rho, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(aux["halting_score_layer"]), ref_hs, rtol=1e-4, atol=1e-5
    )


def test_adavit_model_forward_and_aux():
    model = build_model("adavit", dict(BASE, gate_center=5.0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    logits, aux = model(x)
    assert logits.shape == (2, 10)
    assert aux["rho_token"].shape == (2, 17)
    assert aux["halting_score_layer"].shape == (3,)
    assert aux["counter_token"].max() <= 3 + 1


def test_adavit_noise_at_arbitrary_layer():
    """NoiseBlock insertion works at any encoder index under the scanned
    ACT stack (reference utils/utils.py:162-191), not just layer 0."""
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 32, 32, 3),
                                                 dtype=np.float32))

    def _build(**noise):
        m = build_model("adavit", dict(BASE, gate_center=5.0), seed=11,
                        **noise)
        # head is zero-init; randomize (same key) so logits are informative
        m.params["head"]["kernel"] = 0.05 * jax.random.normal(
            jax.random.key(5), m.params["head"]["kernel"].shape)
        return m

    want, _ = _build()(x)
    want = np.asarray(want)

    outs = {}
    for layer in (0, 2):
        noisy = _build(noise_args={"layer": layer, "noise_type": "gaussian"})
        ident, _ = noisy(x, noise_value=0.0)  # 0 dB = no-noise sentinel
        np.testing.assert_allclose(np.asarray(ident), want,
                                   rtol=1e-5, atol=1e-5)
        got, _ = noisy(x, noise_value=3.0)
        got = np.asarray(got)
        assert not np.allclose(got, want, atol=1e-6)
        outs[layer] = got
    # the layer index matters: injecting at 0 vs 2 gives different logits
    assert not np.allclose(outs[0], outs[2], atol=1e-6)


# ----------------------------------------------------------------- moevit


def test_moevit_one_expert_is_plain():
    model = build_model("moevit", dict(BASE))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    logits, aux = model(x)
    assert logits.shape == (2, 10)
    assert aux["gating_probs"] == {}


def test_moevit_eval_output_is_selected_expert():
    """Dense einsum with one-hot gating == picking the argmax expert."""
    model = build_model("moevit", dict(BASE, mlp_moes=[2, 1, 1], attn_moes=[1, 1, 1]))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3), dtype=np.float32))
    logits, aux = model(x)
    gp = np.asarray(aux["gating_probs"]["layer_0"]["mlp"])  # (B, N, 2)
    assert gp.shape[-1] == 2
    np.testing.assert_allclose(gp.sum(-1), 1.0, rtol=1e-6)  # one-hot rows
    assert set(np.unique(gp)) <= {0.0, 1.0}


def test_moevit_train_gumbel_gating_differentiable():
    model = build_model("moevit", dict(BASE, mlp_moes=[2, 2, 2]))
    x = jnp.ones((2, 32, 32, 3))

    def loss(params):
        (logits, aux) = model.module.apply(
            {"params": params}, x, train=True, rngs=init_rngs(0)
        )
        return (logits**2).sum()

    grads = jax.grad(loss)(model.params)
    g = grads["encoder"]["layers_0"]["mlp"]["gating_network"]["gate"]["kernel"]
    assert np.isfinite(np.asarray(g)).all()


# ----------------------------------------------------------- eeresidualvit


def test_eeresidualvit_outputs_and_budget():
    model = build_model(
        "eeresidualvit",
        dict(BASE, residual_layers=["attention+mlp"] * 3, gate_type="sigmoid",
             gate_bias=0.0, add_budget_token=True),
    )
    model.set_budget(0.7)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    outs, aux = model(x)
    assert len(outs) == 4  # 3 exits + final
    for o in outs:
        assert o.shape == (2, 10)
    assert len(aux["masks"]) == 3
    # training: one budget for the whole batch (reference :254-327)
    outs, aux = model.module.apply(
        {"params": model.params}, x, train=True, rngs=init_rngs(3)
    )
    assert np.asarray(aux["current_budget"]).shape == ()


# ----------------------------------------------------------- encdec


def test_encdec_shapes_and_requirements():
    with pytest.raises(ValueError, match="requires add_budget_token"):
        build_model(
            "encdecresidualvit",
            dict(BASE, residual_layers=["attention+mlp"] * 3,
                 gate_type="sigmoid", gate_bias=0.0, add_budget_token=False),
        )
    model = build_model(
        "encdecresidualvit",
        dict(BASE, residual_layers=["attention+mlp"] * 3, gate_type="sigmoid",
             gate_bias=0.0, add_budget_token=True, decoder_num_layers=1),
    )
    model.set_budget(0.5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    (logits, recon, recon_mask), aux = model(x)
    assert logits.shape == (2, 10)
    assert recon.shape == (2, 32, 32, 3)
    assert recon_mask.shape == (2, 32, 32, 1)
    assert "layer_2" in aux["masks"]


# ----------------------------------------------------------------- maevit


MAE_ARGS = dict(
    image_size=32, patch_size=8, num_layers=2, num_heads=4, hidden_dim=64,
    mlp_dim=128, num_classes=10, mask_ratio=0.25, decoder_hidden_dim=32,
    decoder_mlp_dim=64, num_decoder_layers=1, num_decoder_heads=2,
)


def test_maevit_train_shuffles_and_reconstructs():
    model = build_model("maevit", MAE_ARGS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    (logits, img), aux = model.module.apply(
        {"params": model.params}, x, train=True, rngs=init_rngs(0)
    )
    assert logits.shape == (2, 10)
    assert img.shape == (2, 32, 32, 3)
    fwd, bwd = np.asarray(aux["forward_perm"]), np.asarray(aux["backward_perm"])
    np.testing.assert_array_equal(fwd[bwd], np.arange(16))


def test_maevit_eval_no_shuffle():
    model = build_model("maevit", MAE_ARGS)
    x = jnp.zeros((1, 32, 32, 3))
    (logits, img), aux = model(x)
    assert aux == {}
    assert img.shape == (1, 32, 32, 3)
