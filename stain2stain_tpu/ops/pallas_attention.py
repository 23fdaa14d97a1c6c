"""Fused self-attention Pallas TPU kernel for the UNet attention blocks.

Why: the ADM UNet attends over the flattened spatial grid (1024 tokens at
256px, 4096 at 512px). XLA's einsum path materializes the f32 logits tensor
(B, H, T, T) in HBM — the single largest allocation in the train step (4 GB at
256px batch 64, see bench OOM trace). This kernel keeps logits in VMEM.

Blocking: grid = (batch·heads, T/q_block). Each step loads one q block plus
the FULL k/v for its (batch·head) — k/v are only T×d (≤0.5 MB at 4096×32), so
per-row softmax completes in one step and no online-softmax accumulation is
needed; the logits block is q_block×T (≤8 MB at q_block 512, T 4096). The
q_block is the largest divisor of T ≤ 512.

Backward is a custom VJP with the flash-attention identities

    p  = exp(s − m)/l,  Δ = rowsum(do ∘ o)
    dv += pᵀ·do,  ds = p ∘ (do·vᵀ − Δ),  dq = ds·k·scale,  dk += dsᵀ·q·scale

dq is per-q-block; dk/dv map every q step onto the same output block and
accumulate across the (sequential) TPU grid, initialized at the first q step.

The softmax stats m/l are NOT saved as residuals: the backward recomputes the
logits s from the same q/k anyway, so recomputing m = rowmax(s) and
l = rowsum(exp(s−m)) there is bit-identical and costs two VPU reductions over
a block already in VMEM. Saving them as f32 (bh, t, 1) arrays cost 128× their
size in HBM lane padding (2 MB → 256 MB each at the 256px mid block) — that
padding alone OOMed the flagship 256px train step at batch 32.

Falls back to the plain einsum path off-TPU (CPU tests / virtual meshes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# VMEM spent on (qb, T) f32 logits-class buffers per kernel instance. The
# forward keeps 2 such buffers (s, p); the backward ~4 (s/p, dp, ds + slack).
# v5e VMEM is ~16 MB/core — leave headroom for q/k/v/o blocks and double
# buffering. At T=1024 (256px mid block) this reproduces qb=512; at T=4096
# (512px mid block) it shrinks qb to fit — an unbounded qb overflowed VMEM
# and crashed the TPU compiler on every 512px backward.
_VMEM_LOGITS_BUDGET = 10 * 2**20

# Above this token count even the full-T k/v residency stops making sense;
# attention() falls back to the einsum path (XLA).
MAX_FUSED_TOKENS = 32768


def _q_block(t: int, n_logit_bufs: int = 2, cap: int = 512) -> int:
    limit = max(8, _VMEM_LOGITS_BUDGET // (n_logit_bufs * 4 * t))
    qb = min(t, cap, limit)
    while t % qb:
        qb -= 1
    return qb


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (qb, d)
    k = k_ref[0].astype(jnp.float32)  # (T, d)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (qb, T)
    m = jnp.max(s, axis=-1, keepdims=True)  # (qb, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p / l, v, preferred_element_type=jnp.float32)  # (qb, d)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)   # (qb, d)
    k = k_ref[0].astype(jnp.float32)   # (T, d)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)   # (qb, d)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # recompute the softmax stats from s — same operands and op order as the
    # forward, so m/l (and thus p) are bit-identical to the forward's weights
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l  # (qb, T)
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (qb, T)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (T, d)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    # dk/dv blocks are revisited by every q step of this (batch·head);
    # initialize on the first, accumulate after.
    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(pl.program_id(1) != 0)
    def _():
        dk_ref[0] = (dk_ref[0].astype(jnp.float32) + dk).astype(dk_ref.dtype)
        dv_ref[0] = (dv_ref[0].astype(jnp.float32) + dv).astype(dv_ref.dtype)


def _q_spec(qb: int, d: int):
    return pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)


def _kv_spec(t: int, d: int):
    return pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """(BH, T, d) q/k/v → (BH, T, d) softmax(q·kᵀ·scale)·v, logits VMEM-only."""
    return _fwd(q, k, v, scale)


def _fwd(q, k, v, scale):
    bh, t, d = q.shape
    qb = _q_block(t, n_logit_bufs=2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh, t // qb),
        in_specs=[_q_spec(qb, d), _kv_spec(t, d), _kv_spec(t, d)],
        out_specs=_q_spec(qb, d),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
    )(q, k, v)


def _fused_attention_fwd(q, k, v, scale):
    out = _fwd(q, k, v, scale)
    return out, (q, k, v, out)


def _fused_attention_bwd(scale, residuals, do):
    q, k, v, out = residuals
    bh, t, d = q.shape
    qb = _q_block(t, n_logit_bufs=4)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh, t // qb),
        in_specs=[
            _q_spec(qb, d),      # q
            _kv_spec(t, d),      # k
            _kv_spec(t, d),      # v
            _q_spec(qb, d),      # o
            _q_spec(qb, d),      # do
        ],
        out_specs=(_q_spec(qb, d), _kv_spec(t, d), _kv_spec(t, d)),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            # dk/dv accumulate across all q-block grid steps — keep the
            # accumulator f32 regardless of input dtype (bf16 would round on
            # every step) and cast once at the end.
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
        ),
    )(q, k, v, out, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


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
    if t > MAX_FUSED_TOKENS:
        # beyond full-T k/v VMEM residency; degenerate configs (e.g. attention
        # at full 512² resolution) go through XLA instead
        use_fused = False
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
