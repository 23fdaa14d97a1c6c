"""Device mesh + sharding layout for data-parallel (and beyond) training.

This replaces the reference's Lightning-DDP/NCCL layer
(/root/reference/configs/trainer/ddp.yaml:4-9, SURVEY.md §2.5) with the
TPU-native equivalent: a ``jax.sharding.Mesh`` whose axes are

- ``data``  — batch sharding (DP); gradient reduction becomes an XLA
  all-reduce over ICI inserted automatically by jit's partitioner,
- ``fsdp``  — optional parameter/optimizer sharding axis (ZeRO-style); with
  size 1 params are fully replicated (reference parity: pure DP).

Everything goes through ``jax.jit`` with ``NamedSharding`` annotations — no
hand-written collectives; XLA chooses reduce-scatter/all-gather schedules.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_devices: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(data, fsdp) mesh over the available devices; fsdp=1 → pure DP."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % fsdp != 0:
        raise ValueError(f"device count {n} not divisible by fsdp={fsdp}")
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over every mesh axis (data × fsdp both split batch
    when fsdp>1 keeps per-device batch equal; params are what fsdp shards)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def chunk_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a ``(steps, batch, ...)`` stack of train batches: the
    steps axis is a host-side dispatch-chaining axis (replicated — it is
    consumed by ``lax.scan``), the batch axis shards like ``batch_sharding``."""
    return NamedSharding(mesh, P(None, ("data", "fsdp")))


def shard_chunk(mesh: Mesh, chunk: Any) -> Any:
    """``_shard_with`` for ``(steps, batch, ...)`` stacks (chained dispatch)."""
    return _shard_with(chunk_sharding(mesh), chunk)


def _fsdp_spec(path: tuple, leaf: Any, fsdp_size: int, min_size: int) -> P:
    """Shard the largest dim of big weights over 'fsdp'; replicate the rest."""
    shape = getattr(leaf, "shape", ())
    if fsdp_size <= 1 or not shape or max(shape) < min_size:
        return P()
    axis = int(np.argmax(shape))
    if shape[axis] % fsdp_size != 0:
        return P()
    spec = [None] * len(shape)
    spec[axis] = "fsdp"
    return P(*spec)


def param_shardings(mesh: Mesh, params: Any, min_size: int = 1024) -> Any:
    """Per-leaf NamedShardings for a param/optimizer pytree.

    ``min_size``: smallest largest-dim worth sharding over 'fsdp' (ZeRO-style);
    tiny tensors replicate — the all-gather would cost more than it saves.
    """
    fsdp_size = mesh.shape["fsdp"]

    def spec(path, leaf):
        return NamedSharding(mesh, _fsdp_spec(path, leaf, fsdp_size, min_size))

    return jax.tree_util.tree_map_with_path(spec, params)


def _shard_with(sharding: NamedSharding, tree: Any) -> Any:
    """Place host-local numpy arrays onto the mesh as global arrays.

    Single-process: a plain device_put. Multi-process: assembles the global
    array from each host's local shard (``make_array_from_process_local_data``),
    the per-host input pipeline contract of SURVEY.md §2.5.
    """

    def put(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, tree)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """``_shard_with`` under the (batch, ...) sharding."""
    return _shard_with(batch_sharding(mesh), batch)


__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "chunk_sharding",
    "param_shardings",
    "shard_batch",
    "shard_chunk",
]
