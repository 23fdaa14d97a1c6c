"""Tests for whole-slide tiled inference (stain2stain_tpu/wsi.py)."""

import numpy as np
import pytest

from stain2stain_tpu.wsi import feather_weights, tile_starts, translate_large_image


def test_tile_starts_cover_exactly():
    for length, tile, stride in [(70, 32, 24), (64, 32, 32), (20, 32, 24), (33, 32, 24)]:
        starts = tile_starts(length, tile, stride)
        covered = np.zeros(max(length, tile), bool)
        for s in starts:
            assert s >= 0 and (s + tile <= max(length, tile))
            covered[s : s + tile] = True
        assert covered.all()
        assert starts == sorted(set(starts))


def test_feather_weights_positive_and_interior_one():
    w = feather_weights(32, 8)
    assert w.shape == (32, 32, 1)
    assert (w > 0).all()
    assert np.allclose(w[8:-8, 8:-8], 1.0)
    # symmetric ramp
    np.testing.assert_allclose(w[0, 0], w[-1, -1])


@pytest.mark.parametrize("h,w", [(70, 83), (64, 64), (20, 45), (32, 32)])
def test_identity_reconstruction(h, w):
    """With an identity generator, overlapped feather-stitching must return
    the input exactly (all contributions agree, normalization is exact)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    out = translate_large_image(lambda b: b, img, tile=32, overlap=8, batch_size=4)
    assert out.shape == (h, w, 3)
    np.testing.assert_allclose(out, img, rtol=0, atol=1e-5)


def test_channel_change_and_weight_normalization():
    """A constant-valued generator with a different channel count: output is
    that constant everywhere (weights normalize out) at the new width."""
    img = np.zeros((50, 40, 3), np.float32)

    def gen(batch):
        return np.full(batch.shape[:3] + (1,), 0.25, np.float32)

    out = translate_large_image(gen, img, tile=32, overlap=8, batch_size=3)
    assert out.shape == (50, 40, 1)
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_fixed_batch_shape_every_call():
    """generate_fn must always see the compiled (batch, tile, tile, C) shape,
    including the final partial batch (zero-padded)."""
    seen = []

    def gen(batch):
        seen.append(batch.shape)
        return batch

    img = np.ones((70, 70, 3), np.float32)
    translate_large_image(gen, img, tile=32, overlap=8, batch_size=4)
    assert seen and all(s == (4, 32, 32, 3) for s in seen)
    # 3 starts per axis -> 9 tiles -> 3 calls at batch 4
    assert len(seen) == 3


def test_overlap_zero_non_divisible():
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (45, 33, 3)).astype(np.float32)
    out = translate_large_image(lambda b: b, img, tile=32, overlap=0, batch_size=2)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_rejects_bad_args():
    img = np.zeros((40, 40, 3), np.float32)
    with pytest.raises(ValueError):
        translate_large_image(lambda b: b, img[..., 0], tile=32)
    with pytest.raises(ValueError):
        translate_large_image(lambda b: b, img, tile=32, overlap=32)


def test_tiled_generator_end_to_end_tiny():
    """Real task path: a tiny CFM UNet translates a 40x56 image through
    make_tiled_generator + translate_large_image (one compiled shape)."""
    import jax
    import jax.numpy as jnp

    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.ops.solvers import SolverConfig
    from stain2stain_tpu.tasks import ConditionalFlowMatchingModule
    from stain2stain_tpu.training.optim import Adam
    from stain2stain_tpu.wsi import make_tiled_generator

    net = UNetModel(
        dim=(3, 16, 16), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1,
    )
    task = ConditionalFlowMatchingModule(
        net=net, optimizer=lambda: Adam(lr=1e-3), solver=SolverConfig("euler")
    )
    variables = task.init_variables(
        jax.random.key(0), (jnp.zeros((4, 16, 16, 3), jnp.float32),)
    )
    gen = make_tiled_generator(task, variables, num_steps=2)
    img = np.random.default_rng(2).uniform(-1, 1, (40, 56, 3)).astype(np.float32)
    out = translate_large_image(gen, img, tile=16, overlap=4, batch_size=4)
    assert out.shape == (40, 56, 3)
    assert np.isfinite(out).all()
