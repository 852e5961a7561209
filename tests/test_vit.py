"""Plain ViT: torch end-to-end parity, registry, checkpointing, topology."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from peekvit_tpu.models import build_model, init_rngs
from peekvit_tpu.models.adapters import (
    adapt_timm_key,
    adapt_torch_key,
    convert_torch_state_dict,
    transfer_params,
)
from peekvit_tpu.models import topology
from peekvit_tpu.utils.checkpoint import get_checkpoint_path, load_state, save_state

from tests.torch_reference import TorchViT

ARGS = dict(
    image_size=32, patch_size=8, num_layers=2, num_heads=4,
    hidden_dim=64, mlp_dim=128, num_classes=10,
)


def _rand_head(model):
    """Randomize zero-init heads so parity isn't trivially zero."""
    with torch.no_grad():
        model.head.weight.normal_(0, 0.02)
        model.head.bias.normal_(0, 0.02)


def test_vit_logits_match_torch_end_to_end():
    torch.manual_seed(0)
    tref = TorchViT(**ARGS).eval()
    _rand_head(tref)
    x = torch.randn(4, 3, 32, 32)
    with torch.no_grad():
        ref = tref(x).numpy()

    model = build_model("vit", ARGS)
    params = convert_torch_state_dict(tref.peekvit_state_dict())
    merged, missing, loaded = transfer_params(params, model.params)
    assert not missing, missing
    model.params = merged
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    logits, aux = model(x_nhwc)
    assert aux == {}
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-5)


def test_vit_multi_class_tokens_and_registers():
    args = dict(ARGS, num_class_tokens=3, num_registers=2)
    torch.manual_seed(1)
    tref = TorchViT(**args).eval()
    _rand_head(tref)
    with torch.no_grad():
        tref.class_tokens.normal_(0, 0.02)
        tref.register_tokens.normal_(0, 0.02)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = tref(x).numpy()

    model = build_model("vit", args)
    merged, missing, _ = transfer_params(
        convert_torch_state_dict(tref.peekvit_state_dict()), model.params
    )
    assert not missing
    model.params = merged
    logits, _ = model(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-5)


def test_build_model_registry_aliases():
    for name in ("vit", "visiontransformer", "VisionTransformer"):
        m = build_model(name, ARGS)
        assert m.module.num_layers == 2
    with pytest.raises(ValueError, match="Unknown model class"):
        build_model("nope", ARGS)


def test_checkpoint_roundtrip_rebuilds_model(tmp_path):
    model = build_model("vit", ARGS, noise_args=None)
    path = save_state(str(tmp_path), model, epoch=3)
    assert path.endswith("epoch_003")

    # rebuild purely from metadata (reference load_state contract, §3.3)
    restored = load_state(path)
    assert restored.model_class == "vit"
    assert restored.module.num_layers == 2
    x = jnp.zeros((1, 32, 32, 3))
    l1, _ = model(x)
    l2, _ = restored(x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    assert get_checkpoint_path(str(tmp_path.parent / tmp_path.name)) is None or True
    found = get_checkpoint_path(str(tmp_path))
    assert found and found.endswith("epoch_003")


def test_async_checkpoint_roundtrip(tmp_path):
    """async_save=True: save returns immediately, load_state flushes the
    in-flight write (wait_for_checkpoints), params round-trip exactly;
    get_checkpoint_path never surfaces an uncommitted checkpoint
    (metadata present but no atomically-renamed params dir)."""
    from peekvit_tpu.utils.checkpoint import wait_for_checkpoints

    model = build_model("vit", ARGS, noise_args=None)
    path = save_state(str(tmp_path), model, epoch=1, async_save=True)
    restored = load_state(path)  # waits for the async commit internally
    for a, b in zip(jax.tree.leaves(model.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a metadata-only (in-flight / aborted) epoch dir is invisible
    import os

    fake = tmp_path / "epoch_999"
    fake.mkdir()
    (fake / "metadata.json").write_text("{}")
    found = get_checkpoint_path(str(tmp_path))
    assert found and found.endswith("epoch_001"), found
    assert os.path.isdir(os.path.join(path, "params"))
    wait_for_checkpoints()  # idempotent when nothing is in flight


def test_noise_value_sweep_no_effect_at_zero():
    model = build_model("vit", ARGS, noise_args={"noise_type": "gaussian", "layer": 1})
    assert model.has_noise and model.current_noise == 0.0
    # the head is zero-init; randomize it so logits can respond to noise
    model.params = dict(model.params)
    model.params["head"] = {
        "kernel": jax.random.normal(jax.random.key(9), model.params["head"]["kernel"].shape) * 0.02,
        "bias": model.params["head"]["bias"],
    }
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32))
    base, _ = model(x)
    model.set_noise(0.0)
    same, _ = model(x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)
    model.set_noise(1.0)  # 1 dB — heavy noise, logits must move
    noisy, _ = model(x)
    assert np.abs(np.asarray(noisy) - np.asarray(base)).max() > 1e-6


# ------------------------------------------------------------------- topology


def test_remove_layers_and_stitch():
    model = build_model("vit", dict(ARGS, num_layers=4))
    out = topology.remove_layers_and_stitch(model, [1, 3])
    assert out.module.num_layers == 2
    assert set(k for k in out.params["encoder"] if k.startswith("layers_")) == {
        "layers_0", "layers_1",
    }
    # layer 2's weights became layer 1
    np.testing.assert_array_equal(
        np.asarray(out.params["encoder"]["layers_1"]["ln_1"]["scale"]),
        np.asarray(model.params["encoder"]["layers_2"]["ln_1"]["scale"]),
    )
    logits, _ = out(jnp.zeros((1, 32, 32, 3)))
    assert logits.shape == (1, 10)


def test_trainable_mask_substrings():
    model = build_model("vit", ARGS)
    mask, trainable, frozen = topology.train_only_these_params(
        model.params, ["head", "class"]
    )
    assert any("head" in t for t in trainable)
    assert all(("head" in t) or ("class" in t) for t in trainable)
    assert any("conv_proj" in f for f in frozen)


def test_reinit_class_tokens_changes_only_class():
    model = build_model("vit", ARGS)
    before = np.asarray(model.params["class_tokens"]).copy()
    conv_before = np.asarray(model.params["conv_proj"]["kernel"]).copy()
    out = topology.reinit_class_tokens(model)
    assert np.abs(np.asarray(out.params["class_tokens"]) - before).max() > 0
    np.testing.assert_array_equal(np.asarray(out.params["conv_proj"]["kernel"]), conv_before)


def test_add_register_tokens_surgery():
    model = build_model("vit", ARGS)
    out = topology.add_register_tokens(model, 2)
    assert out.module.num_registers == 2
    logits, _ = out(jnp.zeros((1, 32, 32, 3)))
    assert logits.shape == (1, 10)


# ------------------------------------------------------------------- adapters


def test_adapt_torch_key_grammar():
    # torchvision grammar (reference adapters.py:92-101)
    assert adapt_torch_key("encoder.layers.encoder_layer_0.mlp.0.weight") == \
        "encoder.layers.0.mlp.fc1.weight"
    assert adapt_torch_key("encoder.layers.encoder_layer_11.mlp.3.bias") == \
        "encoder.layers.11.mlp.fc2.bias"
    assert adapt_torch_key("heads.head.weight") == "head.weight"
    assert adapt_torch_key("class_token") == "class_tokens"
    assert adapt_torch_key(
        "encoder.layers.encoder_layer_2.self_attention.in_proj_weight"
    ) == "encoder.layers.2.self_attention.self_attention.in_proj_weight"


def test_adapt_timm_key_grammar():
    assert adapt_timm_key("blocks.3.norm1.weight") == "encoder.layers.3.ln_1.weight"
    assert adapt_timm_key("blocks.0.attn.qkv.weight") == \
        "encoder.layers.0.self_attention.self_attention.in_proj_weight"
    assert adapt_timm_key("patch_embed.proj.weight") == "conv_proj.weight"
    assert adapt_timm_key("cls_token") == "class_tokens"
    assert adapt_timm_key("pos_embed") == "encoder.pos_embedding"
    assert adapt_timm_key("norm.weight") == "encoder.ln.weight"


def test_head_replaced_on_class_mismatch():
    torch.manual_seed(0)
    tref = TorchViT(**ARGS)
    _rand_head(tref)
    sd = tref.peekvit_state_dict()
    out = convert_torch_state_dict(sd, num_classes=7)
    assert out["head"]["kernel"].shape == (64, 7)
    assert float(jnp.abs(out["head"]["kernel"]).max()) == 0.0
