"""End-to-end pretrained-weight import: a torchvision-layout .pth on disk
loaded through build_model(torch_pretrained_weights=...), with logits parity
against the torch model (reference vit.py:251-299 + adapters.py:75-115)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from peekvit_tpu.models.registry import build_model
from torch_reference import TorchViT


def _torchvision_layout(sd):
    """Rename our test TorchViT keys into torchvision ViT key grammar."""
    out = {}
    for k, v in sd.items():
        k = k.replace("layers.", "encoder.layers.encoder_layer_")
        k = k.replace(".mlp.fc1.", ".mlp.0.")
        k = k.replace(".mlp.fc2.", ".mlp.3.")
        k = k.replace("class_tokens", "class_token")
        k = k.replace("pos_embedding", "encoder.pos_embedding")
        k = k.replace("final_ln", "encoder.ln")
        k = k.replace("head", "heads.head") if k.startswith("head") else k
        out[k] = v
    return out


@pytest.fixture(scope="module")
def torch_vit_and_pth(tmp_path_factory):
    torch.manual_seed(0)
    tm = TorchViT(image_size=32, patch_size=8, num_layers=2, num_heads=4,
                  hidden_dim=64, mlp_dim=128, num_classes=9)
    with torch.no_grad():
        tm.head.weight.normal_(0, 0.05)
        tm.head.bias.zero_()
        tm.class_tokens.normal_(0, 0.02)
    sd = _torchvision_layout(tm.state_dict())
    path = tmp_path_factory.mktemp("w") / "vit.pth"
    torch.save(sd, str(path))
    return tm, str(path)


def test_pth_import_logits_parity(torch_vit_and_pth):
    tm, path = torch_vit_and_pth
    model = build_model(
        "vit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=9,
             torch_pretrained_weights=path),
    )
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got, _ = model(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_pth_import_head_reshape_on_class_mismatch(torch_vit_and_pth):
    """num_classes differs -> head is reinitialized, backbone transfers
    (reference adapters.py:107-114)."""
    _, path = torch_vit_and_pth
    model = build_model(
        "vit",
        dict(image_size=32, patch_size=8, num_layers=2, num_heads=4,
             hidden_dim=64, mlp_dim=128, num_classes=5,
             torch_pretrained_weights=path),
    )
    assert model.params["head"]["kernel"].shape == (64, 5)
    x = jnp.zeros((1, 32, 32, 3))
    logits, _ = model(x)
    assert logits.shape == (1, 5)


def test_missing_pth_clear_error():
    with pytest.raises(FileNotFoundError, match="no network egress"):
        build_model(
            "vit",
            dict(image_size=32, patch_size=8, num_layers=1, num_heads=2,
                 hidden_dim=32, mlp_dim=64, num_classes=10,
                 torch_pretrained_weights="ViT_B_16_Weights[IMAGENET1K_V1]"),
        )
