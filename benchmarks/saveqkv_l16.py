"""A/B: save_qkv on/off for ViT-L/16 bs128 train step.

Measured (v5e-1, same process, min of 2x4 carry-loop reps):
  save_qkv=False: 403.32 ms/step = 317 img/s
  save_qkv=True:  395.80 ms/step = 323 img/s   (+1.9%)
The ViT-B/16 win (218.9 -> 204.6 ms, train_step.json) carries to L/16,
just smaller: the (B, N, 3D) save stream grows with D while the skipped
recompute matmuls grow with D^2, so relative benefit shrinks at scale but
stays positive -> save_qkv='auto' remains True for the non-remat path.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from bench import device_train_seconds_per_step
from peekvit_tpu.models.registry import build_model
from peekvit_tpu.training.fused import vit_forward_trainable

spec = dict(image_size=224, patch_size=16, num_layers=24, num_heads=16,
            hidden_dim=1024, mlp_dim=4096, num_classes=1000)
model = build_model("vit", spec)
batch = 128
x = jax.random.normal(jax.random.key(0), (batch, 224, 224, 3), jnp.float32)
y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000)
tx = optax.adam(1e-3)
opt_state = tx.init(model.params)


def update_fn(grads, o, p):
    u, o2 = tx.update(grads, o, p)
    return optax.apply_updates(p, u), o2


for sq in (False, True):
    fwd = functools.partial(vit_forward_trainable, patch_size=16,
                            num_heads=16, merged=False, save_qkv=sq)

    def loss_fn(p, x_):
        return optax.softmax_cross_entropy_with_integer_labels(
            fwd(p, x_), y).mean()

    s = min(device_train_seconds_per_step(
        jax.value_and_grad(loss_fn), update_fn, model.params, opt_state, x,
        reps=4) for _ in range(2))
    print(f"save_qkv={sq}: {s*1e3:.2f} ms/step = {batch/s:.0f} img/s",
          file=sys.stderr, flush=True)
