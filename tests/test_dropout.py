"""hardware_dropout / FastDropout: nn.Dropout semantics at lower bandwidth.

Reference behavior being preserved: torchcfm's UNetModel applies standard
inverted-scaling dropout inside every res block during training
(/root/reference/src/models/conditional_flow_matching.py:66-72 hot loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stain2stain_tpu.ops.dropout import FastDropout, hardware_dropout, hash_dropout

RATE = 0.25


@pytest.fixture(scope="module")
def xy():
    key = jax.random.key(7)
    x = jax.random.normal(jax.random.key(0), (64, 1024), jnp.float32)
    y, g = jax.jit(
        lambda x, k: (
            hardware_dropout(x, k, RATE),
            jax.grad(lambda x: jnp.sum(hardware_dropout(x, k, RATE)))(x),
        )
    )(x, key)
    return np.asarray(x), np.asarray(y), np.asarray(g)


def test_values_are_zero_or_scaled(xy):
    x, y, _ = xy
    scaled = x / (1.0 - RATE)
    assert np.all(np.isclose(y, 0.0) | np.isclose(y, scaled, rtol=1e-6))


def test_keep_fraction_matches_rate(xy):
    x, y, _ = xy
    keep = np.mean(y != 0.0)
    # 65536 samples, sigma ~ 0.0017; also covers the 1/65536 threshold quantum
    assert abs(keep - (1.0 - RATE)) < 0.01


def test_backward_regenerates_the_same_mask(xy):
    x, y, g = xy
    # d/dx sum(dropout(x)) is the mask itself; fwd output must equal g * x
    np.testing.assert_allclose(g * x, y, rtol=1e-6)


def test_mask_is_deterministic_per_key():
    x = jnp.ones((8, 128))
    f = jax.jit(lambda k: hardware_dropout(x, k, RATE))
    a, b = f(jax.random.key(3)), f(jax.random.key(3))
    c = f(jax.random.key(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))


class TestHashDropout:
    """hash_dropout: same iid-Bernoulli inverted-scaling contract as
    hardware_dropout, with a counter-hash mask that XLA can fuse (no
    RngBitGenerator materialization on the hot path)."""

    @pytest.fixture(scope="class")
    def xyg(self):
        seed = jnp.uint32(12345)
        x = jax.random.normal(jax.random.key(0), (64, 1024), jnp.float32)
        y, g = jax.jit(
            lambda x, s: (
                hash_dropout(x, s, RATE),
                jax.grad(lambda x: jnp.sum(hash_dropout(x, s, RATE)))(x),
            )
        )(x, seed)
        return np.asarray(x), np.asarray(y), np.asarray(g)

    def test_values_are_zero_or_scaled(self, xyg):
        x, y, _ = xyg
        scaled = x / (1.0 - RATE)
        assert np.all(np.isclose(y, 0.0) | np.isclose(y, scaled, rtol=1e-6))

    def test_keep_fraction_matches_rate(self, xyg):
        x, y, _ = xyg
        assert abs(np.mean(y != 0.0) - (1.0 - RATE)) < 0.01

    def test_backward_regenerates_the_same_mask(self, xyg):
        x, y, g = xyg
        np.testing.assert_allclose(g * x, y, rtol=1e-6)

    def test_mask_is_deterministic_per_seed(self):
        x = jnp.ones((8, 128))
        f = jax.jit(lambda s: hash_dropout(x, s, RATE))
        a, b = f(jnp.uint32(3)), f(jnp.uint32(3))
        c = f(jnp.uint32(4))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.any(np.asarray(a) != np.asarray(c))

    def test_rows_are_decorrelated(self):
        # The counter hash must not produce visible structure: per-row keep
        # rates of a (256, 256) mask should scatter like iid binomials.
        y = np.asarray(hash_dropout(jnp.ones((256, 256)), jnp.uint32(9), RATE))
        row_keep = (y != 0).mean(axis=1)
        # sigma per row = sqrt(p(1-p)/256) ~ 0.027; all rows within 5 sigma
        assert np.all(np.abs(row_keep - (1 - RATE)) < 0.14)
        # and adjacent-element correlation is near zero
        flat = (y.ravel() != 0).astype(np.float64)
        corr = np.corrcoef(flat[:-1], flat[1:])[0, 1]
        assert abs(corr) < 0.02

    def test_module_hash_impl(self):
        x = jnp.ones((4, 256))
        out = FastDropout(RATE, impl="hash").apply(
            {}, x, False, rngs={"dropout": jax.random.key(0)}
        )
        out = np.asarray(out)
        assert np.any(out == 0.0) and np.any(out != 0.0)
        kept = out[out != 0.0]
        np.testing.assert_allclose(kept, 1.0 / (1.0 - RATE), rtol=1e-6)


def test_module_contract():
    mod = FastDropout(RATE)
    x = jnp.ones((4, 32))
    out_eval = mod.apply({}, x, True)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = mod.apply({}, x, False, rngs={"dropout": jax.random.key(0)})
    assert np.any(np.asarray(out_train) == 0.0)
    # rate 0 short-circuits without consuming an rng
    np.testing.assert_array_equal(
        np.asarray(FastDropout(0.0).apply({}, x, False)), np.asarray(x)
    )
