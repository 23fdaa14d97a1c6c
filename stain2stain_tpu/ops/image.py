"""On-device image ops: normalization and paired augmentation.

The reference augments on host in DataLoader workers with *shared* transforms
across source/target/mask (paired RandomCrop + h/v flips,
ref: src/data/paired_data_module.py:172-199) and normalizes mean/std 0.5 to
[-1, 1] (ref: paired_data_module.py:145). Here augmentation is a batched,
jittable function under explicit ``jax.random`` keys so it fuses into the XLA
step — decoded uint8 tiles stream to device and never round-trip to host.

Layout: NHWC. Masks ride along as extra arrays with the same crop/flip applied
(nearest semantics are free since crop/flip never interpolates).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def normalize_uint8(img: jax.Array) -> jax.Array:
    """uint8 [0,255] → float32 [-1, 1] ((x/255 - 0.5) / 0.5)."""
    return img.astype(jnp.float32) / 127.5 - 1.0


def denormalize(img: jax.Array) -> jax.Array:
    """[-1, 1] → [0, 1], clipped (ref: infer_simple_flowmatching.py:37)."""
    return jnp.clip((img + 1.0) * 0.5, 0.0, 1.0)


def normalize_uint8_np(img) -> "np.ndarray":
    """Host-side (numpy) twin of :func:`normalize_uint8` — for whole-slide /
    serving paths that must not device-put arbitrarily large images."""
    import numpy as np

    return np.asarray(img, np.float32) / 127.5 - 1.0


def denormalize_np(img) -> "np.ndarray":
    """Host-side (numpy) twin of :func:`denormalize`."""
    import numpy as np

    return np.clip((np.asarray(img, np.float32) + 1.0) * 0.5, 0.0, 1.0)


def _crop_one(img: jax.Array, top: jax.Array, left: jax.Array, size: int) -> jax.Array:
    return jax.lax.dynamic_slice(
        img, (top, left, jnp.zeros_like(top)), (size, size, img.shape[-1])
    )


def paired_random_crop_flip(
    rng: jax.Array,
    images: Sequence[jax.Array],
    crop_size: int,
    hflip: bool = True,
    vflip: bool = True,
) -> list[jax.Array]:
    """Apply one *shared* random crop + flips to a group of (B, H, W, C) arrays.

    Per-example random crop offsets and flip bits are drawn once and applied
    identically to every array in ``images`` (source / target / mask stay
    aligned, matching the reference's seed-synced transforms).
    """
    ref = images[0]
    batch, height, width = ref.shape[0], ref.shape[1], ref.shape[2]
    top_rng, left_rng, h_rng, v_rng = jax.random.split(rng, 4)
    tops = jax.random.randint(top_rng, (batch,), 0, max(height - crop_size, 0) + 1)
    lefts = jax.random.randint(left_rng, (batch,), 0, max(width - crop_size, 0) + 1)
    do_h = jax.random.bernoulli(h_rng, 0.5, (batch,)) if hflip else jnp.zeros((batch,), bool)
    do_v = jax.random.bernoulli(v_rng, 0.5, (batch,)) if vflip else jnp.zeros((batch,), bool)

    def aug_one(img, top, left, fh, fv):
        out = _crop_one(img, top, left, crop_size)
        out = jnp.where(fh, out[:, ::-1, :], out)
        out = jnp.where(fv, out[::-1, :, :], out)
        return out

    return [jax.vmap(aug_one, in_axes=(0, 0, 0, 0, 0))(img, tops, lefts, do_h, do_v) for img in images]


def center_resize(img: jax.Array, size: int, method: str = "linear") -> jax.Array:
    """Resize (B, H, W, C) to (B, size, size, C); 'nearest' for masks."""
    batch, _, _, chans = img.shape
    return jax.image.resize(img, (batch, size, size, chans), method=method)


__all__ = [
    "normalize_uint8",
    "denormalize",
    "paired_random_crop_flip",
    "center_resize",
]
