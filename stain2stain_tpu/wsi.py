"""Whole-slide-image inference: tile → batched generate → feather-stitch.

The reference operates strictly on pre-cut tiles and leaves whole-slide
handling to an upstream process (its datasets consume 256/512px crops,
/root/reference/src/data/paired_data_module.py:172-211; SURVEY.md §5 notes
"scaling is tiling the WSI upstream"). For a production serving story the
tiling belongs in the framework: translating an arbitrarily sized image
must be one call that keeps the TPU hot.

TPU-first design:

- ONE compiled ``generate`` program at a fixed ``(batch, tile, tile, C)``
  shape — every tile of every slide reuses it (static shapes; the final
  partial batch is zero-padded to the compiled batch and the padding rows
  discarded).
- Host work is O(pixels) numpy: reflect-pad, gather windows, weighted
  scatter-add. No per-tile Python → device round-trips beyond the batched
  ``generate`` calls themselves.
- Overlap seams are feather-blended: each tile carries a separable weight
  map that ramps linearly from 1/(overlap+1) at the tile edge to 1 in the
  interior, and the accumulated output is normalized by the accumulated
  weight. With ``overlap=0`` this degrades to exact non-overlapping
  stitching. Weights never reach zero, so image borders (covered by a
  single tile) stay well-defined.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = [
    "tile_starts",
    "feather_weights",
    "translate_large_image",
    "make_tiled_generator",
    "make_conditioned_tiled_generator",
]


def tile_starts(length: int, tile: int, stride: int) -> list[int]:
    """Window starts covering ``[0, length)`` with step ``stride``; the last
    window is edge-aligned so coverage is exact without ragged shapes."""
    if length <= tile:
        return [0]
    starts = list(range(0, length - tile + 1, stride))
    if starts[-1] != length - tile:
        starts.append(length - tile)
    return starts


def feather_weights(tile: int, overlap: int) -> np.ndarray:
    """(tile, tile, 1) f32 blending weights: linear ramp over the ``overlap``
    margin, 1 in the interior, strictly positive everywhere."""
    ramp = np.ones(tile, np.float32)
    for i in range(min(overlap, tile // 2)):
        w = (i + 1) / (overlap + 1)
        ramp[i] = w
        ramp[tile - 1 - i] = w
    return (ramp[:, None] * ramp[None, :])[..., None]


def translate_large_image(
    generate_fn: Callable[[np.ndarray], np.ndarray],
    image: np.ndarray,
    tile: int = 256,
    overlap: int = 32,
    batch_size: int = 16,
) -> np.ndarray:
    """Translate an (H, W, C) image of arbitrary size with a fixed-shape
    batched ``generate_fn``.

    ``generate_fn`` maps ``(batch_size, tile, tile, C) -> (batch_size, tile,
    tile, C')`` in the model's normalized domain and is called with that exact
    shape every time (compile once). Returns (H, W, C') float32.
    """
    if image.ndim != 3:
        raise ValueError(f"expected (H, W, C) image, got shape {image.shape}")
    if not 0 <= overlap < tile:
        raise ValueError(f"overlap must be in [0, tile); got {overlap} vs tile {tile}")
    h, w, _ = image.shape
    pad_h, pad_w = max(0, tile - h), max(0, tile - w)
    if pad_h or pad_w:
        image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    hp, wp, _ = image.shape

    stride = tile - overlap
    coords = [(y, x) for y in tile_starts(hp, tile, stride) for x in tile_starts(wp, tile, stride)]
    weights = feather_weights(tile, overlap)

    out: Optional[np.ndarray] = None
    wsum = np.zeros((hp, wp, 1), np.float32)
    for i in range(0, len(coords), batch_size):
        chunk = coords[i : i + batch_size]
        batch = np.stack([image[y : y + tile, x : x + tile] for y, x in chunk])
        if len(chunk) < batch_size:  # pad to the compiled shape
            pad = np.zeros((batch_size - len(chunk),) + batch.shape[1:], batch.dtype)
            batch = np.concatenate([batch, pad])
        gen = np.asarray(generate_fn(batch), np.float32)
        if out is None:
            out = np.zeros((hp, wp, gen.shape[-1]), np.float32)
        for (y, x), g in zip(chunk, gen):
            out[y : y + tile, x : x + tile] += g * weights
            wsum[y : y + tile, x : x + tile] += weights
    assert out is not None
    return (out / wsum)[:h, :w]


def make_tiled_generator(
    task,
    variables,
    num_steps: int,
    **gen_kwargs,
) -> Callable[[np.ndarray], np.ndarray]:
    """Jit ``task.generate`` as a fixed-shape batched tile translator.

    Extra conditions go through ``gen_kwargs`` (e.g. ``target_class=2`` for a
    fixed-class any2any run, or ``mask=...`` for mask-conditioned variants);
    for per-call class switching use :func:`make_conditioned_tiled_generator`.
    Multitask (image, mask) tuples collapse to the translated image.

    ``variables`` is a jit *argument*, not a closure capture: closed-over
    params become embedded program constants, which duplicates param HBM and
    blows remote-compile request-size limits at flagship scale (the measured
    HTTP-413 failure mode recorded in scripts/fused_conv_bench.py)."""
    import jax

    @jax.jit
    def gen(v, batch):
        result = task.generate(v, batch, num_steps=num_steps, **gen_kwargs)
        return result[0] if isinstance(result, tuple) else result

    return lambda batch: gen(variables, batch)


def make_conditioned_tiled_generator(
    task,
    variables,
    num_steps: int,
    **gen_kwargs,
) -> Callable[[np.ndarray, int], np.ndarray]:
    """Class-conditioned variant: ``gen(batch, target_class)``.

    ``target_class`` is a *traced* scalar, so every target stain shares ONE
    compiled program (the any2any serving path — switching the target class
    per request costs nothing). ``variables`` is a jit argument, not a
    closure capture (see make_tiled_generator)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(v, batch, target_class):
        result = task.generate(
            v, batch, num_steps=num_steps,
            target_class=jnp.asarray(target_class, jnp.int32), **gen_kwargs,
        )
        return result[0] if isinstance(result, tuple) else result

    return lambda batch, target_class: gen(variables, batch, target_class)
