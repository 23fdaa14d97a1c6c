"""Device-resident dataset cache: decode once, gather batches in HBM.

TPU-native feature with no reference equivalent (the reference re-reads every
tile from disk each epoch through torch DataLoader workers,
/root/reference/src/data/paired_data_module.py:295-303). Histopathology tile
datasets at research scale often fit HBM outright — e.g. 512 paired 256px
uint8 tiles are ~200 MB against ~16 GB — while the host→device link is the
scarce resource (on a tunneled dev box it is THE bottleneck: ~12 MB of tiles
per batch dwarfs the 0.65 s train step). This loader:

1. decodes the ENTIRE dataset once through the normal pipeline (the C++
   batch decoder when available), on first iteration;
2. stores each array field on device as a flat ``(N, prod(item_shape))``
   array — flattened because TPU HBM tiles the last two dims as (sublane,
   128-lane); a trailing channel dim of 3 would lane-pad the cache ~42×
   (same failure mode as the attention-stats residuals,
   docs/architecture.md);
3. per batch, gathers rows by index on device and reshapes — zero
   host↔device image traffic after warmup.

Epoch ordering, shuffling, and host-sharding reuse ``DataLoader``'s
``_local_batches`` — the cached and streaming loaders yield bit-identical
example streams for the same (seed, epoch). Device-side paired augmentation
(crop/flip in ``prepare_batch``) is unaffected: the cache holds the same
pre-augment uint8 tiles the host pipeline would ship.

Multi-process runs fall back to streaming: each host would otherwise cache
the full global dataset. Non-array fields (filenames) stay host-side.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .base import DataLoader

_MAX_CACHE_BYTES_DEFAULT = 8 << 30  # stay well under one v5e chip's ~16 GB


class DeviceCacheLoader(DataLoader):
    """Drop-in :class:`DataLoader` whose batches are device-side gathers."""

    def __init__(self, *args, max_cache_bytes: int = _MAX_CACHE_BYTES_DEFAULT, **kw):
        super().__init__(*args, **kw)
        self.max_cache_bytes = max_cache_bytes
        self._layout = None  # list of ("array", flat_dev, item_shape) | ("host", list)

    def _decode_all(self) -> tuple:
        """One pass over the dataset through the normal decode machinery."""
        all_idx = np.arange(len(self.dataset))
        get_batch = getattr(self.dataset, "get_batch", None)
        batch = get_batch(all_idx) if get_batch is not None else None
        if batch is None:
            if self.num_workers > 1 and len(all_idx) > 1:
                samples = list(self._parallel_fetch(all_idx))
            else:
                samples = [self.dataset[int(i)] for i in all_idx]
            batch = self.collate_fn(samples)
        return batch

    def _materialize(self) -> None:
        import jax

        full = self._decode_all()
        total = sum(f.nbytes for f in full if isinstance(f, np.ndarray))
        if total > self.max_cache_bytes:
            raise ValueError(
                f"device cache would need {total/2**30:.2f} GiB "
                f"(max_cache_bytes={self.max_cache_bytes/2**30:.2f} GiB) — "
                "use the streaming DataLoader for datasets this size"
            )
        layout = []
        for field in full:
            if isinstance(field, np.ndarray) and field.ndim >= 1:
                n = field.shape[0]
                flat = jax.device_put(np.ascontiguousarray(field.reshape(n, -1)))
                layout.append(("array", flat, field.shape[1:]))
            else:
                layout.append(("host", field, None))
        self._layout = layout

    def __iter__(self) -> Iterator[tuple]:
        if self.num_shards > 1:
            # per-host cache of the GLOBAL dataset wastes HBM × process count;
            # multi-host keeps the per-host streaming pipeline
            yield from super().__iter__()
            return
        import jax.numpy as jnp

        if self._layout is None:
            self._materialize()
        for local in self._local_batches():
            fields = []
            for kind, payload, item_shape in self._layout:
                if kind == "array":
                    rows = jnp.take(payload, jnp.asarray(local), axis=0)
                    fields.append(rows.reshape((len(local),) + item_shape))
                else:
                    fields.append([payload[int(i)] for i in local])
            yield tuple(fields)


def resolve_loader_class(cache):
    """Map a datamodule ``cache`` config value to a loader class."""
    if cache in (None, "none"):
        return DataLoader
    if cache == "device":
        return DeviceCacheLoader
    raise ValueError(f"cache must be None or 'device', got {cache!r}")


__all__ = ["DeviceCacheLoader", "resolve_loader_class"]
