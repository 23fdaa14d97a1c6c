"""Pallas fused-attention parity tests (TPU) + fallback behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stain2stain_tpu.ops.pallas_attention import attention, fused_attention

on_tpu = jax.default_backend() == "tpu"


def _ref(q, k, v, scale):
    s = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    return jnp.einsum("bts,bsd->btd", jax.nn.softmax(s, -1), v.astype(jnp.float32))


@pytest.mark.skipif(not on_tpu, reason="pallas kernel runs on TPU")
def test_fused_attention_forward_parity():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((4, 256, 32)), jnp.float32) for _ in range(3))
    scale = 1.0 / np.sqrt(32)
    out = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v, scale)), atol=1e-4)


@pytest.mark.skipif(not on_tpu, reason="pallas kernel runs on TPU")
def test_fused_attention_gradient_parity():
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 128, 32)), jnp.float32) for _ in range(3))
    scale = 1.0 / np.sqrt(32)
    gp = jax.jit(jax.grad(lambda q, k, v: jnp.sum(jnp.sin(fused_attention(q, k, v, scale))), (0, 1, 2)))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(_ref(q, k, v, scale))), (0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


@pytest.mark.skipif(not on_tpu, reason="pallas kernel runs on TPU")
def test_fused_attention_bf16_inputs():
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 64, 32)), jnp.bfloat16) for _ in range(3))
    out = jax.jit(lambda q, k, v: fused_attention(q, k, v, 0.125))(q, k, v)
    assert out.dtype == jnp.bfloat16 and np.isfinite(np.asarray(out, np.float32)).all()


def test_attention_wrapper_any_backend():
    # the (B, T, H, d) wrapper must run on whatever backend is active
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 64, 4, 16)), jnp.float32) for _ in range(3))
    out = attention(q, k, v, head_dim=16)
    assert out.shape == (2, 64, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not on_tpu, reason="pallas kernel runs on TPU")
def test_fused_attention_large_token_grid():
    # 4096 tokens = the 512px mid-block; exercises q-blocking (T×T logits
    # would need 67 MB VMEM without it)
    rng = np.random.default_rng(4)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 4096, 32)), jnp.float32) for _ in range(3))
    scale = 1.0 / np.sqrt(32)
    out = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v, scale)), atol=2e-4)
