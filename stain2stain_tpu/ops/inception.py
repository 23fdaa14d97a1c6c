"""InceptionV3 pool3 feature extractor for FID, in pure JAX (NHWC).

The reference ecosystem gets FID features from torchvision/pytorch-fid's
InceptionV3 (the de-facto standard extractor behind published FID numbers).
This is a first-party JAX re-implementation of that network's inference path:

- full torchvision ``inception_v3`` topology up to the 2048-d global average
  pool (no aux head, no fc),
- BatchNorm folded into the convolutions at load time (inference only),
- the pytorch-fid pooling variants (``fid_variant=True``, default): the
  branch-pool average pools use ``count_include_pad=False`` and Mixed_7c's
  branch pool is a max pool — these deviations from stock torchvision are
  what the published "pt_inception-2015-12-05" FID weights expect,
- input: (B, H, W, 3) in [0, 1]; resized to 299² bilinear and scaled to
  [-1, 1] exactly like pytorch-fid's ``normalize_input=True``.

Weights are NOT bundled (this image has no torchvision and no network
egress). Load them from an ``.npz`` produced by
``scripts/convert_inception_weights.py`` (which converts a torchvision or
pytorch-fid state_dict on any machine that has one), found via the
``S2S_INCEPTION_WEIGHTS`` env var or ``<repo>/weights/inception_v3_fid.npz``.
Architecture is validated against the exact conv spec table below, so a
converted checkpoint either matches layer-for-layer or fails loudly.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torchvision BatchNorm2d eps for inception_v3

# name -> (out_ch, in_ch, kh, kw). The complete conv inventory of
# torchvision.models.inception_v3 (feature path only).
_STEM = {
    "Conv2d_1a_3x3": (32, 3, 3, 3),
    "Conv2d_2a_3x3": (32, 32, 3, 3),
    "Conv2d_2b_3x3": (64, 32, 3, 3),
    "Conv2d_3b_1x1": (80, 64, 1, 1),
    "Conv2d_4a_3x3": (192, 80, 3, 3),
}


def _block_a(pre: str, in_ch: int, pool_features: int) -> dict:
    return {
        f"{pre}.branch1x1": (64, in_ch, 1, 1),
        f"{pre}.branch5x5_1": (48, in_ch, 1, 1),
        f"{pre}.branch5x5_2": (64, 48, 5, 5),
        f"{pre}.branch3x3dbl_1": (64, in_ch, 1, 1),
        f"{pre}.branch3x3dbl_2": (96, 64, 3, 3),
        f"{pre}.branch3x3dbl_3": (96, 96, 3, 3),
        f"{pre}.branch_pool": (pool_features, in_ch, 1, 1),
    }


def _block_b(pre: str, in_ch: int) -> dict:
    return {
        f"{pre}.branch3x3": (384, in_ch, 3, 3),
        f"{pre}.branch3x3dbl_1": (64, in_ch, 1, 1),
        f"{pre}.branch3x3dbl_2": (96, 64, 3, 3),
        f"{pre}.branch3x3dbl_3": (96, 96, 3, 3),
    }


def _block_c(pre: str, in_ch: int, c7: int) -> dict:
    return {
        f"{pre}.branch1x1": (192, in_ch, 1, 1),
        f"{pre}.branch7x7_1": (c7, in_ch, 1, 1),
        f"{pre}.branch7x7_2": (c7, c7, 1, 7),
        f"{pre}.branch7x7_3": (192, c7, 7, 1),
        f"{pre}.branch7x7dbl_1": (c7, in_ch, 1, 1),
        f"{pre}.branch7x7dbl_2": (c7, c7, 7, 1),
        f"{pre}.branch7x7dbl_3": (c7, c7, 1, 7),
        f"{pre}.branch7x7dbl_4": (c7, c7, 7, 1),
        f"{pre}.branch7x7dbl_5": (192, c7, 1, 7),
        f"{pre}.branch_pool": (192, in_ch, 1, 1),
    }


def _block_d(pre: str, in_ch: int) -> dict:
    return {
        f"{pre}.branch3x3_1": (192, in_ch, 1, 1),
        f"{pre}.branch3x3_2": (320, 192, 3, 3),
        f"{pre}.branch7x7x3_1": (192, in_ch, 1, 1),
        f"{pre}.branch7x7x3_2": (192, 192, 1, 7),
        f"{pre}.branch7x7x3_3": (192, 192, 7, 1),
        f"{pre}.branch7x7x3_4": (192, 192, 3, 3),
    }


def _block_e(pre: str, in_ch: int) -> dict:
    return {
        f"{pre}.branch1x1": (320, in_ch, 1, 1),
        f"{pre}.branch3x3_1": (384, in_ch, 1, 1),
        f"{pre}.branch3x3_2a": (384, 384, 1, 3),
        f"{pre}.branch3x3_2b": (384, 384, 3, 1),
        f"{pre}.branch3x3dbl_1": (448, in_ch, 1, 1),
        f"{pre}.branch3x3dbl_2": (384, 448, 3, 3),
        f"{pre}.branch3x3dbl_3a": (384, 384, 1, 3),
        f"{pre}.branch3x3dbl_3b": (384, 384, 3, 1),
        f"{pre}.branch_pool": (192, in_ch, 1, 1),
    }


CONV_SPECS: dict = {
    **_STEM,
    **_block_a("Mixed_5b", 192, 32),
    **_block_a("Mixed_5c", 256, 64),
    **_block_a("Mixed_5d", 288, 64),
    **_block_b("Mixed_6a", 288),
    **_block_c("Mixed_6b", 768, 128),
    **_block_c("Mixed_6c", 768, 160),
    **_block_c("Mixed_6d", 768, 160),
    **_block_c("Mixed_6e", 768, 192),
    **_block_d("Mixed_7a", 768),
    **_block_e("Mixed_7b", 1280),
    **_block_e("Mixed_7c", 2048),
}

FEATURE_DIM = 2048


def default_weights_path() -> Path:
    env = os.environ.get("S2S_INCEPTION_WEIGHTS")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "weights" / "inception_v3_fid.npz"


def weights_available() -> bool:
    return default_weights_path().exists()


def load_params(path: Optional[str] = None) -> dict:
    """Load a converted npz (torch state_dict names) and fold BN into convs.

    Returns ``{layer_name: (w_hwio_f32, bias_f32)}``. Shapes are validated
    against :data:`CONV_SPECS` so a wrong/partial checkpoint fails loudly.
    """
    p = Path(path) if path else default_weights_path()
    raw = np.load(str(p))
    params = {}
    for name, (out_ch, in_ch, kh, kw) in CONV_SPECS.items():
        try:
            w = raw[f"{name}.conv.weight"]
            gamma = raw[f"{name}.bn.weight"]
            beta = raw[f"{name}.bn.bias"]
            mean = raw[f"{name}.bn.running_mean"]
            var = raw[f"{name}.bn.running_var"]
        except KeyError as e:
            raise ValueError(f"{p}: missing key for layer {name}: {e}") from e
        if tuple(w.shape) != (out_ch, in_ch, kh, kw):
            raise ValueError(
                f"{p}: {name}.conv.weight has shape {tuple(w.shape)}, "
                f"expected {(out_ch, in_ch, kh, kw)} (OIHW)"
            )
        scale = gamma / np.sqrt(var + BN_EPS)
        w_hwio = np.transpose(w, (2, 3, 1, 0)).astype(np.float32) * scale.astype(np.float32)
        bias = (beta - mean * scale).astype(np.float32)
        params[name] = (jnp.asarray(w_hwio), jnp.asarray(bias))
    return params


def init_params(rng: jax.Array, scale: float = 0.05) -> dict:
    """Random weights with the exact architecture shapes (tests / smoke)."""
    params = {}
    for i, (name, (out_ch, in_ch, kh, kw)) in enumerate(sorted(CONV_SPECS.items())):
        key = jax.random.fold_in(rng, i)
        w = jax.random.normal(key, (kh, kw, in_ch, out_ch), jnp.float32) * scale
        params[name] = (w, jnp.zeros((out_ch,), jnp.float32))
    return params


# --------------------------------------------------------------------- forward
def _conv(params, name, x, stride=1, padding=0):
    w, b = params[name]
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # f32 throughout: FID features must match the torch extractor, and
        # TPU's default bf16 conv passes would perturb them
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.nn.relu(out + b)


def _max_pool(x, window=3, stride=2, padding=0):
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pad
    )


def _avg_pool3(x, count_include_pad: bool):
    """3×3 stride-1 pad-1 average pool (the inception branch pool)."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad
    )
    if count_include_pad:
        return summed / 9.0
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad
    )
    return summed / counts


def _inception_a(p, pre, x, fid_variant):
    b1 = _conv(p, f"{pre}.branch1x1", x)
    b5 = _conv(p, f"{pre}.branch5x5_1", x)
    b5 = _conv(p, f"{pre}.branch5x5_2", b5, padding=2)
    b3 = _conv(p, f"{pre}.branch3x3dbl_1", x)
    b3 = _conv(p, f"{pre}.branch3x3dbl_2", b3, padding=1)
    b3 = _conv(p, f"{pre}.branch3x3dbl_3", b3, padding=1)
    bp = _avg_pool3(x, count_include_pad=not fid_variant)
    bp = _conv(p, f"{pre}.branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, pre, x):
    b3 = _conv(p, f"{pre}.branch3x3", x, stride=2)
    bd = _conv(p, f"{pre}.branch3x3dbl_1", x)
    bd = _conv(p, f"{pre}.branch3x3dbl_2", bd, padding=1)
    bd = _conv(p, f"{pre}.branch3x3dbl_3", bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, pre, x, fid_variant):
    b1 = _conv(p, f"{pre}.branch1x1", x)
    b7 = _conv(p, f"{pre}.branch7x7_1", x)
    b7 = _conv(p, f"{pre}.branch7x7_2", b7, padding=(0, 3))
    b7 = _conv(p, f"{pre}.branch7x7_3", b7, padding=(3, 0))
    bd = _conv(p, f"{pre}.branch7x7dbl_1", x)
    bd = _conv(p, f"{pre}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _conv(p, f"{pre}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _conv(p, f"{pre}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _conv(p, f"{pre}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _avg_pool3(x, count_include_pad=not fid_variant)
    bp = _conv(p, f"{pre}.branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, pre, x):
    b3 = _conv(p, f"{pre}.branch3x3_1", x)
    b3 = _conv(p, f"{pre}.branch3x3_2", b3, stride=2)
    b7 = _conv(p, f"{pre}.branch7x7x3_1", x)
    b7 = _conv(p, f"{pre}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _conv(p, f"{pre}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _conv(p, f"{pre}.branch7x7x3_4", b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, pre, x, fid_variant, pool: str):
    b1 = _conv(p, f"{pre}.branch1x1", x)
    b3 = _conv(p, f"{pre}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [
            _conv(p, f"{pre}.branch3x3_2a", b3, padding=(0, 1)),
            _conv(p, f"{pre}.branch3x3_2b", b3, padding=(1, 0)),
        ],
        axis=-1,
    )
    bd = _conv(p, f"{pre}.branch3x3dbl_1", x)
    bd = _conv(p, f"{pre}.branch3x3dbl_2", bd, padding=1)
    bd = jnp.concatenate(
        [
            _conv(p, f"{pre}.branch3x3dbl_3a", bd, padding=(0, 1)),
            _conv(p, f"{pre}.branch3x3dbl_3b", bd, padding=(1, 0)),
        ],
        axis=-1,
    )
    if pool == "max":
        # pytorch-fid's FIDInceptionE_2 (Mixed_7c) uses a max branch pool —
        # required to reproduce published FID numbers.
        bp = _max_pool(x, window=3, stride=1, padding=1)
    else:
        bp = _avg_pool3(x, count_include_pad=not fid_variant)
    bp = _conv(p, f"{pre}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def pool3_features(
    params: dict, images: jax.Array, fid_variant: bool = True, resize: bool = True
) -> jax.Array:
    """(B, H, W, 3) images in [0, 1] → (B, 2048) pool3 features."""
    x = images.astype(jnp.float32)
    if resize and x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")
    x = x * 2.0 - 1.0  # pytorch-fid normalize_input

    x = _conv(params, "Conv2d_1a_3x3", x, stride=2)
    x = _conv(params, "Conv2d_2a_3x3", x)
    x = _conv(params, "Conv2d_2b_3x3", x, padding=1)
    x = _max_pool(x)
    x = _conv(params, "Conv2d_3b_1x1", x)
    x = _conv(params, "Conv2d_4a_3x3", x)
    x = _max_pool(x)
    x = _inception_a(params, "Mixed_5b", x, fid_variant)
    x = _inception_a(params, "Mixed_5c", x, fid_variant)
    x = _inception_a(params, "Mixed_5d", x, fid_variant)
    x = _inception_b(params, "Mixed_6a", x)
    x = _inception_c(params, "Mixed_6b", x, fid_variant)
    x = _inception_c(params, "Mixed_6c", x, fid_variant)
    x = _inception_c(params, "Mixed_6d", x, fid_variant)
    x = _inception_c(params, "Mixed_6e", x, fid_variant)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, fid_variant, pool="avg")
    x = _inception_e(params, "Mixed_7c", x, fid_variant, pool="max" if fid_variant else "avg")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool → (B, 2048)


__all__ = [
    "CONV_SPECS",
    "FEATURE_DIM",
    "BN_EPS",
    "default_weights_path",
    "weights_available",
    "load_params",
    "init_params",
    "pool3_features",
]
