"""Core compute ops (L2 of the layer map).

Pure-jnp reference implementations of every primitive the model zoo needs,
with Pallas TPU kernels for the hot paths in ``peekvit_tpu.ops.pallas``
(selected via ``peekvit_tpu.ops.attention.ATTENTION_IMPL``).

Behavioral contracts mirror the reference blocks
(/root/reference/models/blocks.py) but the implementations are TPU-first:
masks instead of dynamic shapes, explicit PRNG keys instead of global seeds.
"""

from peekvit_tpu.ops.attention import (multi_head_attention, SelfAttention,
                                        set_attention_impl, get_attention_impl)
from peekvit_tpu.ops.mlp import mlp_forward, MLP
from peekvit_tpu.ops.patch_embed import patch_embed, PatchEmbed
from peekvit_tpu.ops.gates import (
    gumbel_sigmoid,
    gumbel_softmax,
    sigmoid_with_temp,
    GumbelSigmoid,
    GumbelSoftmax,
    SigmoidWithTemp,
)
from peekvit_tpu.ops.noise import apply_noise, gaussian_snr_noise, token_drop_noise
from peekvit_tpu.ops.ranking import token_rank_mask, gather_topk_tokens

__all__ = [
    "multi_head_attention",
    "SelfAttention",
    "set_attention_impl",
    "get_attention_impl",
    "mlp_forward",
    "MLP",
    "patch_embed",
    "PatchEmbed",
    "gumbel_sigmoid",
    "gumbel_softmax",
    "sigmoid_with_temp",
    "GumbelSigmoid",
    "GumbelSoftmax",
    "SigmoidWithTemp",
    "apply_noise",
    "gaussian_snr_noise",
    "token_drop_noise",
    "token_rank_mask",
    "gather_topk_tokens",
]
