"""Conditional flow matching path sampling (first-party torchcfm equivalent).

Re-implements the behavior of ``torchcfm.ConditionalFlowMatcher`` as used by
the reference (configs/model/conditional_flow_matching.yaml:28-30,
src/models/conditional_flow_matching.py:66): sample ``t ~ U(0,1)`` per example,
the straight-line interpolant ``xt = (1-t)·x0 + t·x1 (+ σ·ε)``, and the target
velocity ``ut = x1 - x0``. With σ=0 (the reference's setting) this is the
deterministic rectified-flow / I-CFM path.

JAX-native: explicit PRNG keys, pure functions, arbitrary (B, ...) layouts.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _bcast_t(t: jax.Array, x: jax.Array) -> jax.Array:
    """Reshape per-example t (B,) for broadcasting against x (B, ...)."""
    return t.reshape(t.shape[0], *([1] * (x.ndim - 1)))


@dataclass(frozen=True)
class ConditionalFlowMatcher:
    """Straight-line CFM path sampler: q(xt|x0,x1) = N((1-t)x0 + t·x1, σ²)."""

    sigma: float = 0.0

    def sample_t(self, rng: jax.Array, batch: int, dtype=jnp.float32) -> jax.Array:
        return jax.random.uniform(rng, (batch,), dtype=dtype)

    def sample_xt(self, rng: jax.Array, x0: jax.Array, x1: jax.Array, t: jax.Array) -> jax.Array:
        tb = _bcast_t(t, x0).astype(x0.dtype)
        mu = (1.0 - tb) * x0 + tb * x1
        if self.sigma == 0.0:
            return mu
        eps = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
        return mu + jnp.asarray(self.sigma, x0.dtype) * eps

    def conditional_flow(self, x0: jax.Array, x1: jax.Array, t: jax.Array) -> jax.Array:
        del t  # constant along the straight-line path
        return x1 - x0

    def sample_location_and_conditional_flow(
        self, rng: jax.Array, x0: jax.Array, x1: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (t, xt, ut) — same contract as the torchcfm method."""
        t_rng, x_rng = jax.random.split(rng)
        t = self.sample_t(t_rng, x0.shape[0], dtype=jnp.float32)
        xt = self.sample_xt(x_rng, x0, x1, t)
        ut = self.conditional_flow(x0, x1, t)
        return t, xt, ut


@dataclass(frozen=True)
class TargetConditionalFlowMatcher(ConditionalFlowMatcher):
    """Lipman-et-al. flow matching to a target distribution from noise.

    Included for completeness of the CFM library surface; the reference only
    exercises the base matcher.
    """

    def sample_xt(self, rng: jax.Array, x0: jax.Array, x1: jax.Array, t: jax.Array) -> jax.Array:
        tb = _bcast_t(t, x1).astype(x1.dtype)
        sigma_t = 1.0 - (1.0 - self.sigma) * tb
        eps = jax.random.normal(rng, x1.shape, dtype=x1.dtype)
        return tb * x1 + sigma_t * eps

    def conditional_flow(self, x0: jax.Array, x1: jax.Array, t: jax.Array) -> jax.Array:
        raise NotImplementedError("use sample_location_and_conditional_flow")

    def sample_location_and_conditional_flow(
        self, rng: jax.Array, x0: jax.Array, x1: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        t_rng, x_rng = jax.random.split(rng)
        t = self.sample_t(t_rng, x1.shape[0], dtype=jnp.float32)
        tb = _bcast_t(t, x1).astype(x1.dtype)
        eps = jax.random.normal(x_rng, x1.shape, dtype=x1.dtype)
        sigma_t = 1.0 - (1.0 - self.sigma) * tb
        xt = tb * x1 + sigma_t * eps
        ut = (x1 - (1.0 - self.sigma) * xt) / (1.0 - (1.0 - self.sigma) * tb)
        return t, xt, ut


__all__ = ["ConditionalFlowMatcher", "TargetConditionalFlowMatcher"]
