"""Pallas TPU kernels for the hot ops (fused attention, fused block, gather).

Selected via peekvit_tpu.ops.attention.set_attention_impl('pallas'); every
kernel has a pure-jnp fallback that is the numerical source of truth.
"""
