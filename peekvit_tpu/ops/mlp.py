"""ViT MLP: fc1 -> exact GELU -> fc2, no internal dropout.

Contract from reference models/blocks.py:74-84 (note: deliberately no
dropout inside the MLP, unlike torchvision's ViT — SURVEY.md §7.11).
GELU is the exact erf form (torch ``F.gelu`` default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def mlp_forward(x: jax.Array, params: dict) -> jax.Array:
    """params: {'fc1': {'kernel','bias'}, 'fc2': {'kernel','bias'}}.

    ``maybe_fq`` is the QAT hook (ops/fake_quant.py): identity unless the
    Trainer traced this forward under ``with fake_quant(True)``, in which
    case both matmuls see int8-grid fake-quantized operands (STE)."""
    from peekvit_tpu.ops.fake_quant import maybe_fq

    x1, w1 = maybe_fq(x, params["fc1"]["kernel"], site="fc1")
    h = jnp.einsum("...d,de->...e", x1, w1) + params["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h2, w2 = maybe_fq(h, params["fc2"]["kernel"], site="fc2")
    return jnp.einsum("...e,ed->...d", h2, w2) + params["fc2"]["bias"]


class MLP(nn.Module):
    hidden_dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) on weight,
        # uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) on bias. linen's lecun_normal
        # is the jax-idiomatic equivalent; checkpoints override inits anyway.
        fc1 = {
            "kernel": self.param(
                "fc1_kernel", nn.initializers.lecun_normal(), (self.hidden_dim, self.mlp_dim)
            ),
            "bias": self.param("fc1_bias", nn.initializers.zeros, (self.mlp_dim,)),
        }
        fc2 = {
            "kernel": self.param(
                "fc2_kernel", nn.initializers.lecun_normal(), (self.mlp_dim, self.hidden_dim)
            ),
            "bias": self.param("fc2_bias", nn.initializers.zeros, (self.hidden_dim,)),
        }
        return mlp_forward(x, {"fc1": fc1, "fc2": fc2})
