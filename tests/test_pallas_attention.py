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


def test_q_block_respects_vmem_budget():
    # Unbounded q_block at T=4096 (512px mid block) put ~4 logits-sized f32
    # buffers (32 MB) in VMEM and crashed the TPU compiler; the budgeted
    # sizing keeps them ≤ ~10 MB while preserving qb=512 at T≤1024 (the 256px
    # operating point's measured-optimal block).
    from stain2stain_tpu.ops.pallas_attention import _q_block

    assert _q_block(256, 2) == 256
    assert _q_block(1024, 2) == 512
    assert _q_block(1024, 4) == 512
    assert _q_block(2048, 4) == 256
    assert _q_block(4096, 2) == 256
    assert _q_block(4096, 4) == 128
    for t in (256, 1024, 2048, 4096, 16384):
        for n in (2, 4):
            qb = _q_block(t, n)
            assert t % qb == 0
            assert n * 4 * t * qb <= 10 * 2**20 or qb == 8
