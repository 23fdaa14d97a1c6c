"""Sinusoidal timestep embeddings.

Two variants exist in the reference stack and they differ in frequency layout:

- ADM/guided-diffusion style (used by the torchcfm ``UNetModel`` velocity net,
  cfg configs/model/conditional_flow_matching.yaml:16-26): frequencies
  ``exp(-ln(max_period) · i / half)`` with ``[cos ‖ sin]`` ordering.
- The hand-rolled ``TimeEmbedding`` of the multitask shared encoder
  (ref: src/models/components/shared_encoder.py:107-135): log-spaced
  frequencies with ``[sin ‖ cos]`` ordering.

Both are exposed so each model family keeps its exact conditioning function.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding_adm(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """ADM-style embedding of continuous timesteps ``t`` (B,) → (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def timestep_embedding_sincos(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Shared-encoder style embedding: ``[sin ‖ cos]`` with log-spaced freqs."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(max_period) / max(half - 1, 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


__all__ = ["timestep_embedding_adm", "timestep_embedding_sincos"]
