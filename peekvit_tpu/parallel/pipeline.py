"""Pipeline parallelism: GPipe-style microbatching over a mesh axis.

No reference counterpart (the PyTorch reference is single-GPU) — this is
the framework's own §5 distributed-backend obligation. The design follows
the standard TPU recipe (scaling-book "pipelining" chapter): stages are
laid out along a mesh axis, each device holds its stage's layer params
(leading stage axis, sharded), and activations flow stage-to-stage with
``jax.lax.ppermute`` inside a ``lax.scan`` over ``M + S - 1`` ticks — a
static schedule XLA compiles to overlapping compute + ICI transfers, no
host round trips.

The forward is mathematically identical to running the stages back to
back (parity-tested on the virtual CPU mesh in tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

STAGE_AXIS = "stage"


def stack_stage_params(per_stage_params):
    """[stage0_pytree, stage1_pytree, ...] -> one pytree with a leading
    stage axis (shard this axis over the pipeline mesh axis)."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *per_stage_params)


def pipeline_forward(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = STAGE_AXIS,
) -> jax.Array:
    """Run ``S = mesh.shape[axis]`` pipeline stages over microbatches.

    - ``stage_fn(params_slice, act) -> act``: one stage's computation;
      activations must have the same shape on every stage boundary.
    - ``stage_params``: pytree whose leaves have a leading stage axis of
      size S (see :func:`stack_stage_params`).
    - ``x``: (B, ...) activations entering stage 0. B must divide into
      ``num_microbatches`` equal microbatches.

    Returns stage ``S-1``'s outputs, (B, ...), replicated.

    Schedule: at tick ``t`` (0 <= t < M + S - 1), stage ``s`` processes
    microbatch ``t - s`` when it is in range; boundary activations hop one
    stage per tick over ICI via ``ppermute``. Bubble fraction is the usual
    (S - 1) / (M + S - 1) — pick M >= S for decent utilization.
    """
    m = num_microbatches
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible into {m} microbatches"
    mb = b // m
    xs = x.reshape(m, mb, *x.shape[1:])
    s_total = mesh.shape[axis]

    def shard_body(params_local, xs_local):
        # params_local: this stage's params (leading axis stripped to 1)
        params_local = jax.tree.map(lambda p: p[0], params_local)
        s_idx = jax.lax.axis_index(axis)
        ticks = m + s_total - 1

        def probe(xmb):
            return jax.eval_shape(lambda a: stage_fn(params_local, a), xmb)

        out_shape = probe(xs_local[0])
        assert out_shape.shape == xs_local[0].shape, (
            "pipeline stages must preserve activation shape: "
            f"{xs_local[0].shape} -> {out_shape.shape}"
        )

        out_buf = jnp.zeros((m, mb) + xs_local.shape[2:], xs_local.dtype)
        act0 = jnp.zeros_like(xs_local[0])

        def step(carry, t):
            act_in, out_buf = carry
            # stage 0 consumes microbatch t from the input queue; later
            # stages consume the activation ppermuted from stage s-1
            feed = xs_local[jnp.clip(t, 0, m - 1)]
            inp = jnp.where(s_idx == 0, feed, act_in)
            act_out = stage_fn(params_local, inp)
            # hand off to the next stage (one ICI hop per tick)
            act_next = jax.lax.ppermute(
                act_out, axis,
                [(i, (i + 1) % s_total) for i in range(s_total)],
            )
            # the LAST stage finishes microbatch t - (S-1) at tick t
            idx = t - (s_total - 1)
            valid = (s_idx == s_total - 1) & (idx >= 0)
            upd = jax.lax.dynamic_update_slice_in_dim(
                out_buf, act_out[None], jnp.maximum(idx, 0), axis=0)
            out_buf = jnp.where(valid, upd, out_buf)
            return (act_next, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            step, (act0, out_buf), jnp.arange(ticks))
        # replicate the last stage's outputs to every stage so the result
        # leaves shard_map unsharded (psum of one-hot contribution)
        contrib = jnp.where(s_idx == s_total - 1, out_buf,
                            jnp.zeros_like(out_buf))
        return jax.lax.psum(contrib, axis)

    fn = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )
    out = fn(stage_params, xs)
    return out.reshape(b, *out.shape[2:])
