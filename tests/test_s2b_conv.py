"""Parity tests for ops/s2b_conv.py — the space-to-batch 3×3 conv.

The op's whole value proposition is bit-equivalence with the padding=1
conv it replaces (the 512px batch-4 throughput lever, BASELINE.md round-4
roofline row), so these tests check exact forward parity and gradient
parity against ``lax.conv_general_dilated`` across tile factors, ragged
channel counts, and non-square grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest
from jax import lax

from stain2stain_tpu.ops.s2b_conv import space_to_batch_conv


def _ref_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize(
    "shape,factor",
    [
        ((2, 16, 16, 8, 12), 2),
        ((1, 32, 16, 4, 4), 4),
        ((3, 8, 8, 5, 7), 2),
        ((4, 64, 64, 3, 6), 8),
    ],
)
def test_forward_matches_same_padding_conv(shape, factor):
    B, H, W, C, D = shape
    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    w = jax.random.normal(kw, (3, 3, C, D), jnp.float32) * 0.1
    ref = _ref_conv(x, w)
    got = space_to_batch_conv(x, w, factor=factor)
    # The same 9 taps accumulate per output pixel, but XLA's CPU conv codegen
    # may reassociate/FMA-fold differently between the VALID and the SAME
    # lowering, so parity is float-tight rather than bit-exact.
    assert jnp.allclose(ref, got, atol=1e-5), float(jnp.max(jnp.abs(ref - got)))


def test_gradients_match():
    kx, kw = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (2, 16, 16, 8), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 8, 8), jnp.float32) * 0.1

    def loss(conv):
        return lambda x_, w_: jnp.sum(jnp.sin(conv(x_, w_)))

    gx_ref, gw_ref = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, w)
    gx, gw = jax.grad(
        loss(lambda x_, w_: space_to_batch_conv(x_, w_, factor=2)), argnums=(0, 1)
    )(x, w)
    # dx scatter-adds the halo overlaps; dw sums tile contributions — small
    # reassociation, so allclose rather than array_equal.
    assert jnp.allclose(gx_ref, gx, atol=1e-5)
    assert jnp.allclose(gw_ref, gw, atol=1e-4)


def test_bf16_matches_bf16_reference():
    kx, kw = jax.random.split(jax.random.key(2))
    x = jax.random.normal(kx, (2, 32, 32, 16), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, 16, 16), jnp.float32) * 0.1
    ref = _ref_conv(x, w.astype(jnp.bfloat16))
    got = space_to_batch_conv(x, w, factor=2)
    assert got.dtype == jnp.bfloat16
    assert jnp.allclose(ref.astype(jnp.float32), got.astype(jnp.float32), atol=1e-1)


def test_unet_s2b_matches_plain_unet():
    """s2b_conv=2 must be a pure throughput knob: same param tree, same
    outputs, checkpoints interchangeable with the plain-conv UNet."""
    from stain2stain_tpu.models import UNetModel

    kw = dict(
        dim=(3, 64, 64),
        num_channels=32,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions="16",
        dtype=jnp.bfloat16,
    )
    net_s2b = UNetModel(s2b_conv=2, **kw)
    net_ref = UNetModel(**kw)
    t = jnp.array([0.3, 0.7])
    x0 = jnp.zeros((2, 64, 64, 3))
    v = net_s2b.init(jax.random.key(0), t, x0, train=False)
    v_ref = net_ref.init(jax.random.key(0), t, x0, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_ref)

    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    y_s2b = net_s2b.apply(v, t, x, train=False)
    y_ref = net_ref.apply(v, t, x, train=False)
    assert jnp.allclose(
        y_s2b.astype(jnp.float32), y_ref.astype(jnp.float32), atol=1e-2
    ), float(jnp.max(jnp.abs(y_s2b - y_ref)))


def test_rejects_bad_shapes():
    x = jnp.zeros((1, 10, 10, 4))
    w3 = jnp.zeros((3, 3, 4, 4))
    with pytest.raises(ValueError, match="not divisible"):
        space_to_batch_conv(x, w3, factor=4)
    with pytest.raises(ValueError, match="specialised to 3x3"):
        space_to_batch_conv(jnp.zeros((1, 8, 8, 4)), jnp.zeros((5, 5, 4, 4)), factor=2)
