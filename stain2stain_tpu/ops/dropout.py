"""Bandwidth-lean dropout for the UNet hot path.

Why this exists: ``nn.Dropout`` lowers to ``uniform_f32(key) < keep`` +
``where``, which per element (a) draws 4 bytes of random bits, (b) forms an
f32 uniform, (c) stores a bool mask as an autodiff residual, and (d) applies
``where`` in a pass that does not fuse into the following conv. None of that
is FLOPs — it is pure HBM traffic, and at the flagship 256px operating point
it costs ~75 ms of the 681 ms step even with the hardware-RBG PRNG
(scripts/step_ablation.py: 680.7 ms -> 605.4 ms with dropout off; the step
touches ~2.3e9 mask elements). The reference pays the same tax implicitly
through torch's fused CUDA dropout (ref hot path:
/root/reference/src/models/conditional_flow_matching.py:66-72 via torchcfm's
UNetModel Dropout layers).

:func:`hardware_dropout` instead:

- draws **16-bit** random words (half the generator traffic) and compares
  them against an integer threshold — no f32 uniform is ever formed. The
  keep probability is quantized to 1/65536, i.e. within 1.6e-5 of the
  requested rate (f32 bernoulli itself only uses 24 bits).
- wears a ``custom_vjp`` whose backward **regenerates** the mask from the
  saved PRNG key instead of storing it — zero residual bytes. Regeneration
  is the same counter-mode draw, so fwd and bwd masks agree exactly.

The mask distribution is iid Bernoulli(1-rate) with inverted-keep scaling,
exactly ``nn.Dropout`` semantics (different bits for the same key, which is
fine — dropout is stochastic regularization, not a reproducibility
contract; the per-(seed, step) determinism of the trainer is preserved
because the mask is a pure function of the dropout rng).

Works under any PRNG impl; on TPU with ``impl="rbg"`` the draw is the
hardware generator. Safe under ``nn.remat`` (replay re-draws the same mask).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["hardware_dropout", "hash_dropout", "FastDropout"]

_UTYPES = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32}


def _mask(key: jax.Array, shape, rate: float, dtype, nbits: int) -> jax.Array:
    """iid Bernoulli(1-rate) keep mask, pre-scaled by 1/(1-rate)."""
    utype = _UTYPES[nbits]
    span = 1 << nbits
    thresh = utype(min(span - 1, round((1.0 - rate) * span)))
    bits = jax.random.bits(key, shape, utype)
    return (bits < thresh).astype(dtype) * (1.0 / (1.0 - rate))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hardware_dropout(x: jax.Array, key: jax.Array, rate: float, nbits: int = 16):
    """``x * mask / (1-rate)`` with a storage-free backward.

    ``rate`` must be a static float in (0, 1); callers short-circuit
    rate == 0 / eval mode themselves (see :class:`FastDropout`).
    """
    return x * _mask(key, x.shape, rate, x.dtype, nbits)


def _hd_fwd(x, key, rate, nbits):
    return hardware_dropout(x, key, rate, nbits), key


def _hd_bwd(rate, nbits, key, dy):
    return dy * _mask(key, dy.shape, rate, dy.dtype, nbits), None


hardware_dropout.defvjp(_hd_fwd, _hd_bwd)


def _hash_mask(seed: jax.Array, shape, rate: float, dtype) -> jax.Array:
    """Fully-fusible iid Bernoulli(1-rate) keep mask, pre-scaled by 1/(1-rate).

    :func:`hardware_dropout`'s remaining cost is structural: XLA's
    ``RngBitGenerator`` is not a fusible producer, so the random words are
    materialized to HBM and read back by the compare — one full extra tensor
    round-trip per mask even though the arithmetic is trivial. This mask
    instead hashes a linear element counter (``iota`` — generated in-register
    inside whatever fusion consumes it) with the murmur3 finalizer, all plain
    elementwise uint32 ops that XLA fuses into the surrounding chain: the
    mask costs a handful of VPU ops per element and ZERO HBM bytes.

    Quality: the murmur3 finalizer is a full-avalanche bijection on uint32;
    per-element bits are decorrelated across both the counter and the seed.
    That is far weaker than threefry as a *stream* cipher but well beyond
    what an iid Bernoulli regularization mask needs. Keep probability is
    exact to 1/2^32. Deterministic per (seed, element index), so a backward
    pass (or a remat replay) regenerates the identical mask from the seed.
    """
    n = math.prod(shape)
    x = jax.lax.iota(jnp.uint32, n).reshape(shape) + seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(2**32 - 1, round((1.0 - rate) * 2**32)))
    return (x < thresh).astype(dtype) * (1.0 / (1.0 - rate))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_dropout(x: jax.Array, seed: jax.Array, rate: float):
    """``x * mask / (1-rate)`` with a storage-free backward and a mask that
    fuses completely (no RngBitGenerator on the hot path).

    ``seed`` is a uint32 scalar (one PRNG word drawn outside); ``rate`` must
    be a static float in (0, 1).
    """
    return x * _hash_mask(seed, x.shape, rate, x.dtype)


def _hashd_fwd(x, seed, rate):
    return hash_dropout(x, seed, rate), seed


def _hashd_bwd(rate, seed, dy):
    return dy * _hash_mask(seed, dy.shape, rate, dy.dtype), None


hash_dropout.defvjp(_hashd_fwd, _hashd_bwd)


class FastDropout(nn.Module):
    """Drop-in ``nn.Dropout`` replacement backed by :func:`hardware_dropout`.

    Same call contract (``deterministic`` gates the mask; the rng comes from
    the ``dropout`` collection) and same parameter count (none), so swapping
    implementations never touches checkpoints.
    """

    rate: float
    rng_collection: str = "dropout"
    # "hash" (fusible counter mask) is the production default: at the flagship
    # 256px operating point it cut the step from 654 ms (rbg bits) to 612.7 ms
    # per-step / 589.7 ms chained (54.3 tiles/s, ~67% MFU) — within ~7 ms of
    # the dropout-off bound (scripts/step_ablation.py hashdrop modes, measured
    # 2026-08-19). "bits" (16-bit PRNG words) kept selectable for A/B.
    impl: str = "hash"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        key = self.make_rng(self.rng_collection)
        if self.impl == "hash":
            # One scalar PRNG word seeds the whole fusible mask; the per-
            # element bits come from the murmur3 counter hash (zero HBM).
            seed = jax.random.bits(key, (), jnp.uint32)
            return hash_dropout(x, seed, self.rate)
        return hardware_dropout(x, key, self.rate)
