"""Numerics of the fused GroupNorm custom-VJP ops vs the flax reference chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from stain2stain_tpu.ops.norms import group_norm, group_norm_film_silu, group_norm_silu

B, H, W, C, G = 2, 6, 6, 8, 4
EPS = 1e-5


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 2 + 0.5, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.standard_normal((B, 1, 1, C)) * 0.3, jnp.float32)
    shift = jnp.asarray(rng.standard_normal((B, 1, 1, C)) * 0.3, jnp.float32)
    return x, gamma, beta, scale, shift


def _ref_gn(x, gamma, beta):
    mod = nn.GroupNorm(num_groups=G, epsilon=EPS, use_bias=True, use_scale=True)
    return mod.apply({"params": {"scale": gamma, "bias": beta}}, x)


def test_group_norm_matches_flax(data):
    x, gamma, beta, _, _ = data
    np.testing.assert_allclose(
        np.asarray(group_norm(x, gamma, beta, G, EPS)),
        np.asarray(_ref_gn(x, gamma, beta)),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("variant", ["plain", "silu", "film_silu"])
def test_grads_match_autodiff_reference(data, variant):
    x, gamma, beta, scale, shift = data

    if variant == "plain":
        fused = lambda x, g, b: group_norm(x, g, b, G, EPS)
        ref = lambda x, g, b: _ref_gn(x, g, b)
        args = (x, gamma, beta)
    elif variant == "silu":
        fused = lambda x, g, b: group_norm_silu(x, g, b, G, EPS)
        ref = lambda x, g, b: nn.silu(_ref_gn(x, g, b))
        args = (x, gamma, beta)
    else:
        fused = lambda x, g, b, s, t: group_norm_film_silu(x, g, b, s, t, G, EPS)
        ref = lambda x, g, b, s, t: nn.silu(_ref_gn(x, g, b) * (1.0 + s) + t)
        args = (x, gamma, beta, scale, shift)

    np.testing.assert_allclose(np.asarray(fused(*args)), np.asarray(ref(*args)), rtol=2e-5, atol=2e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))  # nonlinear head, nontrivial cotangents

    g_fused = jax.grad(loss(fused), argnums=tuple(range(len(args))))(*args)
    g_ref = jax.grad(loss(ref), argnums=tuple(range(len(args))))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_bf16_input_keeps_f32_stats(data):
    x, gamma, beta, _, _ = data
    out16 = group_norm_silu(x.astype(jnp.bfloat16), gamma, beta, G, EPS)
    assert out16.dtype == jnp.bfloat16
    ref = nn.silu(_ref_gn(x, gamma, beta))
    # bf16 rounding of input+output only; stats stay f32
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )
