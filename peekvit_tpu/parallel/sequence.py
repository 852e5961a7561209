"""Sequence parallelism: tokens sharded over a mesh axis.

No reference counterpart (single-GPU reference) — the framework's own §5
distributed obligation. The layout is the standard Megatron-SP shape: the
TOKEN axis is sharded across devices for everything token-local (LayerNorm,
qkv projection, out-projection, MLP), and attention all-gathers only K and
V over ICI so each device attends its local queries against the full key
set. Per device: compute scales 1/S, communication is one (N, 2D)
all-gather per block — the right trade when N grows past a chip (e.g.
high-resolution ViT or point-cloud tokens).

Parity with the unsharded block is pinned in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from peekvit_tpu.parallel.mesh import MODEL_AXIS


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def sequence_parallel_vit_block(
    params,
    tokens: jax.Array,
    num_heads: int,
    *,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    ln_eps: float = 1e-5,
) -> jax.Array:
    """One pre-LN ViT block with the token axis sharded over ``axis``.

    ``params``: a standard encoder layer pytree (ln_1/self_attention/
    ln_2/mlp, as stored by models/vit.py). ``tokens``: (B, N, D) with N
    divisible by the axis size. LN/projections/MLP run on the local token
    shard; attention all-gathers K and V so local queries see every key.
    """

    def body(p, t):
        at = p["self_attention"]
        y = _ln(t, p["ln_1"]["scale"], p["ln_1"]["bias"], ln_eps)
        qkv = y @ at["in_proj_kernel"] + at["in_proj_bias"]
        d = t.shape[-1]
        q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]
        # the only cross-token dependency: gather full K/V over ICI
        k = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, axis, axis=1, tiled=True)

        from peekvit_tpu.ops.attention import attention_core

        y = attention_core(q, k, v, num_heads)
        t = t + (y @ at["out_proj_kernel"] + at["out_proj_bias"])
        z = _ln(t, p["ln_2"]["scale"], p["ln_2"]["bias"], ln_eps)
        # exact-erf gelu, matching ops/mlp.py (reference F.gelu default)
        z = jax.nn.gelu(z @ p["mlp"]["fc1_kernel"] + p["mlp"]["fc1_bias"],
                        approximate=False)
        return t + (z @ p["mlp"]["fc2_kernel"] + p["mlp"]["fc2_bias"])

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis, None),
        check_rep=False,
    )
    return fn(params, tokens)
