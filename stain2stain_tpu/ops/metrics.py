"""Image-quality metrics: PSNR, SSIM, FID — the quality-parity harness.

The reference publishes no quality numbers (SURVEY.md §6); the north star
requires SSIM/PSNR/FID parity measurement, so this module is a first-class
deliverable:

- :func:`psnr` — peak signal-to-noise over [0,1] images.
- :func:`ssim` — standard single-scale SSIM (Wang et al. 2004): 11×11
  Gaussian window σ=1.5, C1=(0.01·L)², C2=(0.03·L)², depthwise convolution
  (one jitted XLA program, NHWC).
- :func:`fid` — Fréchet distance between Gaussian fits of feature sets
  (scipy sqrtm). Features come from :class:`FeatureExtractor`:
  InceptionV3 pool3 when torchvision + weights are available, otherwise a
  deterministic *random-feature* CNN (fixed seed) — random-projection Fréchet
  distances are a recognized proxy when a pretrained extractor is
  unavailable offline; absolute values are not comparable to Inception-FID,
  relative comparisons under the same extractor are.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Mean PSNR (dB) over the batch; inputs (B, H, W, C) in [0, max_val]."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
    return jnp.mean(10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _depthwise_filter(x: jax.Array, kernel2d: jnp.ndarray) -> jax.Array:
    """Depthwise 2-D filter on NHWC via feature_group_count.

    Full f32 precision: TPU convs default to bf16 passes, and SSIM's
    variance terms (E[x²]−μ²) cancel catastrophically in bf16 — measured
    SSIM values above 1 before this was pinned.
    """
    c = x.shape[-1]
    k = jnp.tile(kernel2d[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 per group
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    pred: jax.Array,
    target: jax.Array,
    max_val: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM over batch+channels; inputs (B, H, W, C) in [0, max_val]."""
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    kernel = _gaussian_kernel(kernel_size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu_x = _depthwise_filter(x, kernel)
    mu_y = _depthwise_filter(y, kernel)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x2 = _depthwise_filter(x * x, kernel) - mu_x2
    sigma_y2 = _depthwise_filter(y * y, kernel) - mu_y2
    sigma_xy = _depthwise_filter(x * y, kernel) - mu_xy

    ssim_map = ((2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )
    return jnp.mean(ssim_map)


# ------------------------------------------------------------------------- FID
class FeatureExtractor:
    """Image → feature vectors for FID.

    ``kind='auto'``: the first-party JAX InceptionV3 pool3 (2048-d,
    ops/inception.py — the pytorch-fid-compatible extractor) when converted
    weights are present (``S2S_INCEPTION_WEIGHTS`` or
    ``<repo>/weights/inception_v3_fid.npz``; see
    scripts/convert_inception_weights.py), else the deterministic
    random-feature CNN (512-d). ``kind='inception'`` demands real weights and
    raises when they are absent — FIDs from the fallback are NOT comparable
    to published Inception-FID values.
    """

    def __init__(self, kind: str = "auto", feature_dim: int = 512, seed: int = 0,
                 weights_path: str | None = None):
        if kind not in ("auto", "inception", "random"):
            raise ValueError(
                f"unknown feature-extractor kind {kind!r}: expected "
                "'auto', 'inception', or 'random'"
            )
        self.kind = kind
        self.feature_dim = feature_dim
        self.seed = seed
        self._inception_params = None
        self._inception_fn = None
        self._random_params = None
        self._random_fn = None
        if kind in ("auto", "inception"):
            self._inception_params = self._try_inception(weights_path)
            if self._inception_params is None and kind == "inception":
                raise RuntimeError(
                    "InceptionV3 weights unavailable — convert them with "
                    "scripts/convert_inception_weights.py and set S2S_INCEPTION_WEIGHTS"
                )
        self.name = (
            "inception_v3_fid"
            if self._inception_params is not None
            else f"random_cnn_{feature_dim}_seed{seed}"
        )

    @staticmethod
    def _try_inception(weights_path=None):
        from stain2stain_tpu.ops import inception

        try:
            if weights_path is not None:
                return inception.load_params(weights_path)
            if inception.weights_available():
                return inception.load_params()
        except Exception as e:  # corrupt/mismatched file → fall back loudly
            import warnings

            warnings.warn(f"InceptionV3 weights failed to load ({e}); using random-feature FID")
        return None

    def _random_cnn(self, x: jax.Array) -> jax.Array:
        """Fixed-seed 4-layer strided conv net + global mean pool (jitted)."""
        if self._random_params is None:
            rng = jax.random.key(self.seed)
            keys = jax.random.split(rng, 4)
            chans = [x.shape[-1], 64, 128, 256, self.feature_dim]
            self._random_params = [
                jax.random.normal(k, (3, 3, chans[i], chans[i + 1]), jnp.float32)
                * math.sqrt(2.0 / (9 * chans[i]))
                for i, k in enumerate(keys)
            ]

        if self._random_fn is None:
            # jit ONCE; re-wrapping a fresh closure per call would retrace
            # and recompile the CNN on every batch
            def fwd(x, params):
                h = x
                for w in params:
                    h = jax.lax.conv_general_dilated(
                        h, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                    )
                    h = jax.nn.leaky_relu(h, 0.2)
                return jnp.mean(h, axis=(1, 2))

            self._random_fn = jax.jit(fwd)
        return self._random_fn(x.astype(jnp.float32), self._random_params)

    def __call__(self, images) -> np.ndarray:
        """images: (B, H, W, 3) in [0, 1] → (B, D) float64 features."""
        if self._inception_params is not None:
            from stain2stain_tpu.ops.inception import pool3_features

            if self._inception_fn is None:
                self._inception_fn = jax.jit(pool3_features)
            feats = self._inception_fn(self._inception_params, jnp.asarray(images, jnp.float32))
            return np.asarray(feats, dtype=np.float64)
        return np.asarray(self._random_cnn(jnp.asarray(images)), dtype=np.float64)


def fid_from_stats(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (standard FID formula).

    Follows pytorch-fid's numerical convention: if sqrtm of the (often
    rank-deficient, e.g. fewer samples than feature dims) product is not
    finite, retry with an ``eps`` offset on the covariance diagonals."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * np.trace(covmean))


def fid(
    real: np.ndarray,
    generated: np.ndarray,
    extractor: Optional[Callable] = None,
) -> float:
    """FID between two image sets (N, H, W, 3) in [0, 1]."""
    extractor = extractor or FeatureExtractor()
    f_real = np.asarray(extractor(real))
    f_gen = np.asarray(extractor(generated))
    eps = 1e-6 * np.eye(f_real.shape[1])
    mu1, s1 = f_real.mean(0), np.cov(f_real, rowvar=False) + eps
    mu2, s2 = f_gen.mean(0), np.cov(f_gen, rowvar=False) + eps
    return fid_from_stats(mu1, s1, mu2, s2)


def evaluate_quality(
    task,
    variables,
    loader,
    num_steps: int = 50,
    max_batches: Optional[int] = None,
    extractor: Optional[Callable] = None,
) -> dict:
    """Translate the loader's tiles and score SSIM / PSNR / FID vs targets.

    The quality-parity harness demanded by SURVEY.md §6: generated-vs-target
    SSIM+PSNR (paired) and FID over the whole translated set.
    """
    from stain2stain_tpu.ops.image import denormalize

    ssim_vals, psnr_vals = [], []
    gen_all, tgt_all = [], []
    rng = jax.random.key(0)
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        device_batch = tuple(jnp.asarray(x) for x in task.device_fields(batch))
        prepared = task.prepare_batch(device_batch, rng, train=False)
        src, tgt = prepared[0], prepared[1]
        gen = task.generate(variables, src, num_steps=num_steps)
        if isinstance(gen, tuple):
            gen = gen[0]
        gen01, tgt01 = denormalize(gen), denormalize(tgt)
        ssim_vals.append(float(ssim(gen01, tgt01)))
        psnr_vals.append(float(psnr(gen01, tgt01)))
        gen_all.append(np.asarray(gen01))
        tgt_all.append(np.asarray(tgt01))
    if not gen_all:
        raise ValueError(
            "evaluate_quality saw no batches (empty loader or max_batches=0)"
        )
    # example-weighted means: a ragged final batch must not count as much as
    # a full one
    weights = np.array([g.shape[0] for g in gen_all], np.float64)
    out = {
        "ssim": float(np.average(ssim_vals, weights=weights)),
        "psnr": float(np.average(psnr_vals, weights=weights)),
    }
    gen_np = np.concatenate(gen_all)
    tgt_np = np.concatenate(tgt_all)
    if len(gen_np) >= 2:
        ext = extractor or FeatureExtractor()
        out["fid"] = fid(tgt_np, gen_np, ext)
        ext_name = ext.name if hasattr(ext, "name") else "custom"
        out["fid_extractor"] = ext_name
        out["fid_comparable"] = ext_name == "inception_v3_fid"
        if not out["fid_comparable"]:
            import sys

            print(
                "=" * 70
                + "\nWARNING: FID computed with the fallback feature extractor "
                f"({ext_name}).\nThis number is NOT comparable to published "
                "Inception-FID values.\nConvert real InceptionV3 weights with "
                "scripts/convert_inception_weights.py\nand set "
                "S2S_INCEPTION_WEIGHTS to get comparable FIDs.\n" + "=" * 70,
                file=sys.stderr,
            )
    return out


__all__ = [
    "psnr",
    "ssim",
    "fid",
    "fid_from_stats",
    "FeatureExtractor",
    "evaluate_quality",
]
