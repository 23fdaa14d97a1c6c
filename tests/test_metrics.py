"""Quality-metric tests: PSNR/SSIM golden values, FID sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stain2stain_tpu.ops.metrics import FeatureExtractor, fid, psnr, ssim


def test_psnr_identity_and_known_value():
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    assert float(psnr(x, x)) > 100.0  # identical → ~inf (capped by eps)
    y = jnp.clip(x + 0.1, 0.0, 1.0)
    mse = float(jnp.mean((x - y) ** 2))
    expected = 10.0 * np.log10(1.0 / mse)
    # per-image PSNR averaged ≈ global PSNR for iid noise
    assert float(psnr(x, y)) == pytest.approx(expected, abs=0.2)


def test_ssim_bounds_and_ordering():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    slightly = jnp.clip(x + 0.02 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32), 0, 1)
    very = jnp.asarray(rng.random(x.shape), jnp.float32)
    s_slight, s_very = float(ssim(x, slightly)), float(ssim(x, very))
    assert s_slight > s_very
    assert -1.0 <= s_very <= 1.0


def test_ssim_matches_reference_implementation():
    # golden check vs a straightforward numpy implementation on gray images
    rng = np.random.default_rng(2)
    x = rng.random((1, 24, 24, 1)).astype(np.float32)
    y = np.clip(x + 0.05 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    try:
        from skimage.metrics import structural_similarity

        ref = structural_similarity(
            x[0, :, :, 0], y[0, :, :, 0], data_range=1.0, gaussian_weights=True,
            sigma=1.5, use_sample_covariance=False,
        )
        assert ours == pytest.approx(ref, abs=5e-3)
    except ImportError:
        assert 0.0 < ours < 1.0  # skimage absent: bounds-only check


def test_fid_zero_for_identical_and_positive_for_different():
    rng = np.random.default_rng(3)
    a = rng.random((16, 32, 32, 3)).astype(np.float32)
    b = rng.random((16, 32, 32, 3)).astype(np.float32) * 0.5  # different distribution
    ext = FeatureExtractor(kind="auto", feature_dim=64)
    same = fid(a, a.copy(), ext)
    diff = fid(a, b, ext)
    assert same == pytest.approx(0.0, abs=1e-3)
    assert diff > same + 1e-3


def test_feature_extractor_deterministic():
    rng = np.random.default_rng(4)
    imgs = rng.random((4, 32, 32, 3)).astype(np.float32)
    f1 = FeatureExtractor(feature_dim=64, seed=5)(imgs)
    f2 = FeatureExtractor(feature_dim=64, seed=5)(imgs)
    np.testing.assert_allclose(f1, f2, rtol=1e-6)


def test_ssim_bounded_on_accelerator():
    # Bright low-variance tiles: with TPU's default bf16 conv passes the
    # E[x²]−μ² variance terms cancelled catastrophically and SSIM came out
    # above 1 (3.5 observed) before the metric convs pinned f32 precision.
    rng = np.random.default_rng(0)
    base = rng.uniform(0.85, 0.95, (2, 32, 32, 3)).astype(np.float32)
    other = np.clip(base + rng.normal(0, 0.02, base.shape).astype(np.float32), 0, 1)
    v = float(ssim(jnp.asarray(base), jnp.asarray(other)))
    assert -1.0 <= v <= 1.0 + 1e-5
    assert float(ssim(jnp.asarray(base), jnp.asarray(base))) == pytest.approx(1.0, abs=1e-4)


def test_feature_extractor_rejects_unknown_kind():
    from stain2stain_tpu.ops.metrics import FeatureExtractor

    with pytest.raises(ValueError, match="unknown feature-extractor kind"):
        FeatureExtractor(kind="Inception")  # case typo must not silently
        # fall back to random features


def test_fid_from_stats_survives_rank_deficient_covs():
    # fewer samples than feature dims (the common eval case): sqrtm of the
    # near-singular product must not leak NaN into the FID
    from stain2stain_tpu.ops.metrics import fid_from_stats

    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(8, 64))
    f2 = rng.normal(loc=0.3, size=(8, 64))
    v = fid_from_stats(f1.mean(0), np.cov(f1, rowvar=False), f2.mean(0), np.cov(f2, rowvar=False))
    assert np.isfinite(v)
