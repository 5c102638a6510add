from vqvae_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from vqvae_tpu.parallel.distributed import maybe_initialize_distributed

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "maybe_initialize_distributed",
]
