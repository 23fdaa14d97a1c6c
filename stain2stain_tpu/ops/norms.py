"""Memory-lean fused GroupNorm ops (custom VJP) for the UNet hot path.

Why this exists: flax's GroupNorm under autodiff saves its f32 internals —
the grouped x·x products for variance, the f32 (x−μ) and normalized outputs,
plus the downstream SiLU inputs. At 256px/batch-32 those residuals dominate
the train step's HBM footprint (measured with
``jax.ad_checkpoint.print_saved_residuals``: GN/SiLU f32 tensors are the top
allocations; they are why batch 64 OOMed in round 1 —
ref hot loop: /root/reference/src/models/conditional_flow_matching.py:66-72,
whose torch GroupNorm+SiLU keeps equivalent fp32 buffers via cuDNN/autograd).

These ops compute statistics in f32 but save ONLY ``(x, mean, rstd)`` — x in
its compute dtype (bf16), already saved anyway as the preceding conv's
residual, so the *marginal* cost is two (B, G) f32 vectors. The backward
recomputes x̂/FiLM/SiLU from those — pure VPU elementwise work XLA fuses into
the surrounding conv backward kernels. Three variants cover every norm site
in the ADM UNet:

- :func:`group_norm`            — plain GN (attention pre-norm)
- :func:`group_norm_silu`       — GN → SiLU (res-block entry, final out norm)
- :func:`group_norm_film_silu`  — GN → h·(1+scale)+shift → SiLU (the
  ``use_scale_shift_norm`` FiLM conditioning inside res blocks)

All math matches flax ``nn.GroupNorm(use_fast_variance=True)`` followed by
the elementwise tail, to bf16 rounding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _stats(x: jax.Array, groups: int, eps: float):
    """Per-(batch, group) f32 mean/rstd of an NHWC tensor."""
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3))
    mean2 = jnp.mean(jnp.square(xg), axis=(1, 3))
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd  # (B, G) each


def _xhat(x, mean, rstd, groups):
    b, h, w, c = x.shape
    cg = c // groups
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(b, 1, 1, c)
    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(b, 1, 1, c)
    return (x.astype(jnp.float32) - mean_c) * rstd_c


def _dx_from_dxhat(dxhat, xhat, rstd, groups):
    """dL/dx given dL/dx̂: dx = r·(dx̂ − mean(dx̂) − x̂·mean(dx̂·x̂)), means per group.

    Large elementwise tensors stay in dxhat.dtype (bf16 on the hot path —
    a full-f32 backward materialized 6 GB temps at 256px/batch-64); the group
    means accumulate in f32.
    """
    b, h, w, c = dxhat.shape
    cg = c // groups
    cdt = dxhat.dtype

    def gmean(t):
        m = jnp.mean(t.reshape(b, h * w, groups, cg).astype(jnp.float32), axis=(1, 3))
        return jnp.repeat(m, cg, axis=1).reshape(b, 1, 1, c).astype(cdt)

    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(b, 1, 1, c).astype(cdt)
    return rstd_c * (dxhat - gmean(dxhat) - xhat * gmean(dxhat * xhat))


def _silu_and_grad(z):
    s = jax.nn.sigmoid(z)
    return z * s, s * (1.0 + z * (1.0 - s))


# ------------------------------------------------------------------ plain GN
@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(x, gamma, beta, groups: int, eps: float = 1e-5):
    """GroupNorm; returns x.dtype. gamma/beta (C,) f32."""
    mean, rstd = _stats(x, groups, eps)
    y = _xhat(x, mean, rstd, groups) * gamma + beta
    return y.astype(x.dtype)


def _gn_fwd(x, gamma, beta, groups, eps):
    mean, rstd = _stats(x, groups, eps)
    y = _xhat(x, mean, rstd, groups) * gamma + beta
    return y.astype(x.dtype), (x, gamma, mean, rstd)


def _gn_bwd(groups, eps, res, dy):
    x, gamma, mean, rstd = res
    cdt = x.dtype  # keep big tensors in the compute dtype; f32 for reductions
    dy = dy.astype(cdt)
    xhat = _xhat(x, mean, rstd, groups).astype(cdt)
    dgamma = jnp.sum((dy * xhat).astype(jnp.float32), axis=(0, 1, 2))
    dbeta = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2))
    dx = _dx_from_dxhat(dy * gamma.astype(cdt), xhat, rstd, groups)
    return dx.astype(x.dtype), dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


group_norm.defvjp(_gn_fwd, _gn_bwd)


# -------------------------------------------------------------------- GN+SiLU
@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm_silu(x, gamma, beta, groups: int, eps: float = 1e-5):
    """SiLU(GroupNorm(x)); returns x.dtype."""
    mean, rstd = _stats(x, groups, eps)
    z = _xhat(x, mean, rstd, groups) * gamma + beta
    return (z * jax.nn.sigmoid(z)).astype(x.dtype)


def _gns_fwd(x, gamma, beta, groups, eps):
    mean, rstd = _stats(x, groups, eps)
    z = _xhat(x, mean, rstd, groups) * gamma + beta
    return (z * jax.nn.sigmoid(z)).astype(x.dtype), (x, gamma, beta, mean, rstd)


def _gns_bwd(groups, eps, res, dy):
    x, gamma, beta, mean, rstd = res
    cdt = x.dtype
    xhat32 = _xhat(x, mean, rstd, groups)
    z = xhat32 * gamma + beta
    _, dsilu = _silu_and_grad(z)
    dz = dy.astype(cdt) * dsilu.astype(cdt)  # bf16 boundary: no f32 cotangent temp
    dz32 = dz.astype(jnp.float32)
    dgamma = jnp.sum(dz32 * xhat32, axis=(0, 1, 2))
    dbeta = jnp.sum(dz32, axis=(0, 1, 2))
    dx = _dx_from_dxhat(dz * gamma.astype(cdt), xhat32.astype(cdt), rstd, groups)
    return dx.astype(x.dtype), dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


group_norm_silu.defvjp(_gns_fwd, _gns_bwd)


# -------------------------------------------------------------- GN+FiLM+SiLU
@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def group_norm_film_silu(x, gamma, beta, scale, shift, groups: int, eps: float = 1e-5):
    """SiLU(GroupNorm(x)·(1+scale)+shift) — ADM scale-shift-norm conditioning.

    scale/shift: (B, 1, 1, C) (or broadcastable) time-embedding projections.
    """
    mean, rstd = _stats(x, groups, eps)
    g = _xhat(x, mean, rstd, groups) * gamma + beta
    z = g * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    return (z * jax.nn.sigmoid(z)).astype(x.dtype)


def _gnfs_fwd(x, gamma, beta, scale, shift, groups, eps):
    mean, rstd = _stats(x, groups, eps)
    g = _xhat(x, mean, rstd, groups) * gamma + beta
    z = g * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    return (z * jax.nn.sigmoid(z)).astype(x.dtype), (x, gamma, beta, scale, shift, mean, rstd)


def _gnfs_bwd(groups, eps, res, dy):
    x, gamma, beta, scale, shift, mean, rstd = res
    cdt = x.dtype
    xhat32 = _xhat(x, mean, rstd, groups)
    g = xhat32 * gamma + beta
    one_p_scale = 1.0 + scale.astype(jnp.float32)
    z = g * one_p_scale + shift.astype(jnp.float32)
    _, dsilu = _silu_and_grad(z)
    dz = dy.astype(cdt) * dsilu.astype(cdt)  # bf16 boundary: no f32 cotangent temp
    dz32 = dz.astype(jnp.float32)
    dscale = jnp.sum(dz32 * g, axis=(1, 2), keepdims=True)
    dshift = jnp.sum(dz32, axis=(1, 2), keepdims=True)
    dg = dz * one_p_scale.astype(cdt)
    dg32 = dg.astype(jnp.float32)
    dgamma = jnp.sum(dg32 * xhat32, axis=(0, 1, 2))
    dbeta = jnp.sum(dg32, axis=(0, 1, 2))
    dx = _dx_from_dxhat(dg * gamma.astype(cdt), xhat32.astype(cdt), rstd, groups)
    return (
        dx.astype(x.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(gamma.dtype),
        dscale.reshape(scale.shape).astype(scale.dtype),
        dshift.reshape(shift.shape).astype(shift.dtype),
    )


group_norm_film_silu.defvjp(_gnfs_fwd, _gnfs_bwd)


__all__ = ["group_norm", "group_norm_silu", "group_norm_film_silu"]
