"""ViT-H/14 gap attribution: which matmuls run below MXU speed (v5e-1).

h14_probe.json showed the H-shape mm-only layer at 4.426 ms vs the
3.393 ms analytic layer (76.7% util; ViT-B's same-structure stack runs
90.2%) with token padding NEUTRAL. This probe decomposes the layer:

- noattn:   qkv + proj + mlp only, attention replaced by the aligned
            qkv[:, :d] slice — the big matmuls' own efficiency.
- sliceonly: noattn but proj's input is the concat of the 16 UNALIGNED
            (257, 80) lane slices of qkv — isolates Mosaic's unaligned
            lane-slice relayout cost (head h lives at offset 80h, never
            a multiple of the 128-lane tile at head_dim 80).
- attnonly: qkv + per-head scores/PV + concat, no proj/mlp.
- hdpad:    full layer with the qkv weight pre-padded to head stride
            128 (wqkv (d, 3*16*128)): every head slice 128-aligned and
            scores at full systolic depth, at +60% qkv FLOPs; proj takes
            the (257, 2048) padded attn with zero rows interleaved.

Writes benchmarks/h14_probe2.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import device_seconds_per_iter, peak_flops

B, N, D, H, M = 64, 257, 1280, 16, 5120
HD = D // H


def _kernel(x_ref, wqkv_ref, wo_ref, w1_ref, w2_ref, o_ref, *,
            variant: str):
    mi, n, d = x_ref.shape
    x = x_ref[...].reshape(mi * n, d)
    qkv = jnp.dot(x, wqkv_ref[...],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    wq = wqkv_ref.shape[-1]
    hd = wq // (3 * H)  # 80 unpadded, 128 for hdpad
    dq = H * hd

    if variant == "noattn":
        attn = qkv[:, :d]
    elif variant == "sliceonly":
        cols = []
        for h in range(H):
            cols.append(qkv[:, dq + h * hd:dq + h * hd + HD])
        attn = jnp.concatenate(cols, axis=-1)
    else:  # attnonly / full / hdpad
        cols = []
        for h in range(H):
            q = qkv[:, h * hd:(h + 1) * hd]
            k = qkv[:, dq + h * hd:dq + (h + 1) * hd]
            v = qkv[:, 2 * dq + h * hd:2 * dq + (h + 1) * hd]
            e = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype)
            pv = jax.lax.dot_general(
                e, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cols.append(pv.astype(x.dtype))
        attn = jnp.concatenate(cols, axis=-1)

    if variant == "attnonly":
        o_ref[...] = jnp.pad(attn, ((0, 0), (0, d - attn.shape[-1]))) \
            .reshape(mi, n, d).astype(o_ref.dtype) if attn.shape[-1] != d \
            else attn.reshape(mi, n, d).astype(o_ref.dtype)
        return
    out = jnp.dot(attn, wo_ref[...],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    h2 = jnp.dot(out, w1_ref[...],
                 preferred_element_type=jnp.float32).astype(x.dtype)
    out2 = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = out2.reshape(mi, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(5,))
def layer(x, wqkv, wo, w1, w2, variant):
    b, n, d = x.shape
    m = w1.shape[-1]
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    io = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b,),
        in_specs=[io, full(wqkv.shape), full(wo.shape), full((d, m)),
                  full((m, d))],
        out_specs=io,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, wqkv, wo, w1, w2)


def time_variant(variant, hd_pad=False):
    ks = jax.random.split(jax.random.key(0), 4)
    if hd_pad:
        wq = jax.random.normal(ks[0], (D, 3 * H * 128), jnp.bfloat16) * 0.02
        # zero the padding columns of each head's q/k so padded depth
        # contributes nothing (v padding columns produce zero output cols)
        col = jnp.arange(3 * H * 128) % 128 < HD
        wq = wq * col[None, :].astype(wq.dtype)
        wo = jax.random.normal(ks[1], (H * 128, D), jnp.bfloat16) * 0.02
    else:
        wq = jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * 0.02
        wo = jax.random.normal(ks[1], (D, D), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[2], (D, M), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (M, D), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.key(9), (B, N, D), jnp.bfloat16)

    def stack(ws, xx, carry):
        t = xx + carry * 0
        for _ in range(4):
            t = layer(t, *ws, variant)
        return jnp.sum(t.astype(jnp.float32))

    t = min(device_seconds_per_iter(stack, ((wq, wo, w1, w2), x), reps=10)
            for _ in range(2))
    return t * 1000 / 4


def main():
    assert jax.default_backend() == "tpu", "probe needs the TPU"
    out = {"batch": B}
    for name, kw in (("noattn", {}), ("sliceonly", {}), ("attnonly", {}),
                     ("full", {}), ("hdpad", {"hd_pad": True})):
        variant = "full" if name == "hdpad" else name
        out[name + "_ms"] = round(time_variant(variant, **kw), 3)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "h14_probe2.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
