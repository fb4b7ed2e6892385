"""Device-mesh parallelism (the framework's distributed backend).

The reference has **no** distributed machinery (SURVEY.md §2.9/§5.8);
this module is the TPU-native replacement: a ``jax.sharding.Mesh`` over
ICI with data-parallel batches, replicated-or-tensor-sharded parameters,
and XLA-inserted collectives — no explicit NCCL/MPI calls anywhere.
"""

from hifigan_tpu.parallel.sequence import conformer_forward_seq_sharded
from hifigan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_params_tp,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_params_tp",
    "make_sharded_train_step",
    "conformer_forward_seq_sharded",
]
