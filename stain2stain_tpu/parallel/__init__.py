"""Mesh/sharding layer: the TPU-native replacement for DDP/NCCL."""

from .distributed import maybe_initialize_distributed
from .mesh import (
    batch_sharding,
    chunk_sharding,
    create_mesh,
    param_shardings,
    replicated_sharding,
    shard_batch,
    shard_chunk,
)

__all__ = [
    "batch_sharding",
    "chunk_sharding",
    "shard_chunk",
    "create_mesh",
    "param_shardings",
    "replicated_sharding",
    "shard_batch",
    "maybe_initialize_distributed",
]
