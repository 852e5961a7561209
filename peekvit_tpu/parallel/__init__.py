"""Device-mesh parallelism layer (the "distributed backend" the reference
lacks — SURVEY.md §2 parallelism inventory, §5).

The reference is strictly single-GPU (train/train.py:41,61). TPU-native
scaling is mesh-first: a ``jax.sharding.Mesh`` with a ``data`` axis (ICI)
from day one — batch sharded, params replicated, XLA inserts the grad
all-reduce. A ``model`` axis is plumbed through for tensor-parallel
sharding of the attention/MLP weights at larger scales.
"""

from peekvit_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    fsdp_param_sharding,
    make_hybrid_mesh,
    make_mesh,
    param_spec,
    replicated_sharding,
    shard_batch,
    shard_params,
    zero1_optimizer_sharding,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "fsdp_param_sharding",
    "make_hybrid_mesh",
    "make_mesh",
    "param_spec",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "zero1_optimizer_sharding",
]
from peekvit_tpu.parallel.pipeline import (  # noqa: F401
    STAGE_AXIS,
    pipeline_forward,
    stack_stage_params,
)
from peekvit_tpu.parallel.sequence import (  # noqa: F401
    sequence_parallel_vit_block,
)
