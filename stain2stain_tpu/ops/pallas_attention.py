"""Fused self-attention Pallas TPU kernel for the UNet attention blocks.

Why: the ADM UNet attends over ≤32×32=1024 spatial tokens (mid block + any
configured trunk resolutions). XLA's einsum path materializes the f32 logits
tensor (B, H, T, T) to HBM — the single largest allocation in the train step
(4 GB at batch 64, see bench OOM trace) — because the softmax sits between two
matmuls. This kernel computes logits → softmax → weighted sum entirely in
VMEM per (batch·head) grid step: T=1024, d≤128 means q/k/v slices (~0.4 MB)
plus the T×T logits block (4 MB) fit comfortably in 16 MB VMEM, so nothing
spills to HBM and attention memory drops from O(B·H·T²) to O(B·H·T·d).

Backward is a custom VJP: one kernel per (batch·head) recomputes the softmax
from the saved (m, l) row statistics and produces dq/dk/dv without ever
storing probabilities — the standard flash-attention backward identities:

    p  = exp(s − m)/l
    dv = pᵀ·do
    dp = do·vᵀ,  Δ = rowsum(do ∘ o)
    ds = p ∘ (dp − Δ)
    dq = ds·k·scale,  dk = dsᵀ·q·scale

Falls back to the plain einsum path off-TPU (CPU tests / virtual meshes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (T, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, T)
    m = jnp.max(s, axis=-1, keepdims=True)  # (T, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p / l, v, preferred_element_type=jnp.float32)  # (T, d)
    o_ref[0] = o.astype(o_ref.dtype)
    m_ref[0] = m  # (T, 1)
    l_ref[0] = l


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, m_ref, l_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    m = m_ref[0]  # (T, 1)
    l = l_ref[0]
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp(s - m) / l  # (T, T)
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # pᵀ·do → (T, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, T)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (T, 1)
    ds = p * (dp - delta)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _tile_spec(t: int, d: int):
    return pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _stat_spec(t: int):
    # (BH, T, 1) layout: trailing singleton keeps the block TPU-tileable
    return pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """(BH, T, d) q/k/v → (BH, T, d) softmax(q·kᵀ·scale)·v, logits VMEM-only."""
    out, _, _ = _fwd(q, k, v, scale)
    return out


def _fwd(q, k, v, scale):
    bh, t, d = q.shape
    spec = _tile_spec(t, d)
    out, m, l = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, _stat_spec(t), _stat_spec(t)),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
        ),
    )(q, k, v)
    return out, m, l


def _fused_attention_fwd(q, k, v, scale):
    out, m, l = _fwd(q, k, v, scale)
    return out, (q, k, v, out, m, l)


def _fused_attention_bwd(scale, residuals, do):
    q, k, v, out, m, l = residuals
    bh, t, d = q.shape
    spec = _tile_spec(t, d)
    stat_spec = _stat_spec(t)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec, spec, spec, spec, spec, stat_spec, stat_spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t, d), v.dtype),
        ),
    )(q, k, v, out, do, m, l)
    return dq, dk, dv


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def attention(
    q: jax.Array, k: jax.Array, v: jax.Array, head_dim: int, use_fused: bool | None = None
) -> jax.Array:
    """Multi-head attention (B, T, H, d) → (B, T, H, d).

    Uses the fused Pallas kernel on TPU; einsum fallback elsewhere. Matches
    the ADM attention math (total scaling 1/√d, f32 accumulation).
    ``use_fused=None`` auto-selects from the default backend — pass False
    explicitly when lowering for non-TPU devices while a TPU is the default
    backend (e.g. a virtual CPU mesh on a TPU box).
    """
    batch, t, heads, d = q.shape
    scale = 1.0 / math.sqrt(head_dim)
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    if use_fused:
        def fold(x):
            return x.transpose(0, 2, 1, 3).reshape(batch * heads, t, d)

        out = fused_attention(fold(q), fold(k), fold(v), scale)
        return out.reshape(batch, heads, t, d).transpose(0, 2, 1, 3)
    # Fallback: einsum with the logits materialized (fine off-TPU).
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(jnp.float32))
    return out.astype(q.dtype)


__all__ = ["fused_attention", "attention"]
