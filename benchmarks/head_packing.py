"""A/B: per-head score/PV matmuls vs block-diagonal head packing
(v5e-1, ViT-B shapes) — the reproducible form of the round-3 claim that
the ~90% MXU utilization ceiling is a MODEL-SHAPE property.

At head_dim 64 the scores matmul (197, 64) x (64, 197) fills half of the
MXU's 128-deep systolic contraction. Packing two heads restores the full
contraction depth, but the only packing that keeps heads independent is
block-diagonal:

    [q1 | q2] (197, 128)  @  [[k1^T, 0], [0, k2^T]] (128, 394)

which doubles the output width — 2x the MACs, half of them multiplying
structural zeros. The MXU is a dense systolic array: zeros cost exactly
what values cost, so the packing spends precisely the cycles it saves
(same for the PV side, where the packed P is the block-diagonal one).
This script measures both forms for all 12 heads at bs256 and writes
benchmarks/head_packing.json.
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

from bench import device_seconds_per_iter

B, N, D, H = 256, 197, 768, 12
HD = D // H


def _per_head_kernel(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    for h in range(H):
        qh = q[:, h * HD:(h + 1) * HD]
        kh = k[:, h * HD:(h + 1) * HD]
        vh = v[:, h * HD:(h + 1) * HD]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(q.dtype)
        pv = jax.lax.dot_general(
            s, vh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, h * HD:(h + 1) * HD] = pv.astype(o_ref.dtype)


def _packed_kernel(q_ref, kbd_ref, vbd_ref, o_ref):
    # kbd: (1, H/2, 128, 2N) block-diagonal pairs; scores (N, 2N) per pair
    q = q_ref[0]
    for p in range(H // 2):
        qp = q[:, p * 2 * HD:(p + 1) * 2 * HD]  # (N, 128): heads 2p, 2p+1
        s = jax.lax.dot_general(
            qp, kbd_ref[0, p], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(q.dtype)  # (N, 2N)
        pv = jax.lax.dot_general(
            s, vbd_ref[0, p], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, 128)
        o_ref[0, :, p * 2 * HD:(p + 1) * 2 * HD] = pv.astype(o_ref.dtype)


def main():
    assert jax.default_backend() == "tpu", "A/B needs the real chip"
    ks = jax.random.split(jax.random.key(0), 3)
    mk = lambda k, shape: (jax.random.normal(k, shape) * 0.1).astype(  # noqa: E731
        jnp.bfloat16)
    q, k, v = (mk(kk, (B, N, D)) for kk in ks)

    io = lambda last: pl.BlockSpec((1, N, last), lambda i: (i, 0, 0),  # noqa: E731
                                   memory_space=pltpu.VMEM)

    per_head = pl.pallas_call(
        _per_head_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        grid=(B,), in_specs=[io(D)] * 3, out_specs=io(D),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    # block-diagonal K/V pairs, built once outside the timed loop:
    # (H/2, 128, 2N) and (H/2, 2N, 128)
    def build_bd(k3, v3):
        kh = k3.reshape(B, N, H, HD)
        vh = v3.reshape(B, N, H, HD)
        z = jnp.zeros((B, N, HD), k3.dtype)
        kbd, vbd = [], []
        for p in range(H // 2):
            top = jnp.concatenate([kh[:, :, 2 * p], z], -1)      # (B,N,128)
            bot = jnp.concatenate([z, kh[:, :, 2 * p + 1]], -1)
            kbd.append(jnp.concatenate([top, bot], 1).transpose(0, 2, 1))
            vbd.append(jnp.concatenate(
                [jnp.concatenate([vh[:, :, 2 * p], z], -1),
                 jnp.concatenate([z, vh[:, :, 2 * p + 1]], -1)], 1))
        return jnp.stack(kbd, 1), jnp.stack(vbd, 1)  # (B,H/2,128,2N),(B,H/2,2N,128)

    kbd, vbd = jax.jit(build_bd)(k, v)
    iob = pl.BlockSpec((1, H // 2, 2 * HD, 2 * N), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    iov = pl.BlockSpec((1, H // 2, 2 * N, 2 * HD), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)

    packed = pl.pallas_call(
        _packed_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        grid=(B,), in_specs=[io(D), iob, iov], out_specs=io(D),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    a = per_head(q, k, v)
    b = packed(q, kbd, vbd)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    print(f"max |per_head - packed| = {err:.3e}", file=sys.stderr,
          flush=True)

    def run_ph(args, xx, carry):
        k_, v_ = args
        return jnp.sum(per_head(
            xx.at[0, 0, 0].add((carry * 0).astype(xx.dtype)), k_, v_
        ).astype(jnp.float32))

    def run_pk(args, xx, carry):
        kbd_, vbd_ = args
        return jnp.sum(packed(
            xx.at[0, 0, 0].add((carry * 0).astype(xx.dtype)), kbd_, vbd_
        ).astype(jnp.float32))

    res = {"max_abs_err": err, "batch": B, "heads": H, "head_dim": HD}
    for name, fn, args in (("per_head_ms", run_ph, (k, v)),
                           ("packed_ms", run_pk, (kbd, vbd))):
        t = min(device_seconds_per_iter(fn, (args, q), reps=10)
                for _ in range(2))
        res[name] = round(t * 1e3, 3)
        print(json.dumps({name: res[name]}), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "head_packing.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
