"""On-device ODE integrators for flow-matching inference.

Replaces ``torchdyn.NeuralODE`` (ref: src/models/conditional_flow_matching.py:157-170,
configs/model/conditional_flow_matching.yaml:33-39). The reference integrates
``t_span = linspace(0, 1, num_steps)`` and returns the final state; here the
whole trajectory is a single compiled ``lax.scan`` (fixed-step Euler / midpoint /
Heun / RK4) or an adaptive ``lax.while_loop`` (dopri5) — no Python step loop,
so an N-step ``generate`` is one XLA program.

``num_steps`` counts *time nodes* (torchdyn semantics): ``num_steps=2`` is a
single integration step from t=0 to t=1.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

VelocityFn = Callable[[jax.Array, jax.Array], jax.Array]  # (t scalar, x) -> dx/dt


@functools.lru_cache(maxsize=1)
def _host_callbacks_supported() -> bool:
    """Whether the runtime implements host send/recv callbacks.

    Some PJRT runtimes (e.g. the axon dev-tunnel TPU client) raise
    UNIMPLEMENTED at *execution* time for any program containing
    ``jax.debug.print``/``callback``, so the dopri5 non-convergence warning
    must be compiled out there. Probed once with a silent no-op callback.
    """
    try:
        def probe(x):
            jax.debug.callback(lambda v: None, x)
            return x

        jax.block_until_ready(jax.jit(probe)(jnp.zeros(())))
        return True
    except Exception:
        return False

_FIXED_STEP_STAGES = {"euler": 1, "midpoint": 2, "heun": 2, "rk4": 4}


def _euler_step(fn: VelocityFn, t: jax.Array, x: jax.Array, dt: jax.Array) -> jax.Array:
    return x + dt * fn(t, x)


def _midpoint_step(fn: VelocityFn, t: jax.Array, x: jax.Array, dt: jax.Array) -> jax.Array:
    k1 = fn(t, x)
    return x + dt * fn(t + 0.5 * dt, x + 0.5 * dt * k1)


def _heun_step(fn: VelocityFn, t: jax.Array, x: jax.Array, dt: jax.Array) -> jax.Array:
    k1 = fn(t, x)
    k2 = fn(t + dt, x + dt * k1)
    return x + 0.5 * dt * (k1 + k2)


def _rk4_step(fn: VelocityFn, t: jax.Array, x: jax.Array, dt: jax.Array) -> jax.Array:
    k1 = fn(t, x)
    k2 = fn(t + 0.5 * dt, x + 0.5 * dt * k1)
    k3 = fn(t + 0.5 * dt, x + 0.5 * dt * k2)
    k4 = fn(t + dt, x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_STEPPERS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "heun": _heun_step,
    "rk4": _rk4_step,
}


def odeint_fixed(
    fn: VelocityFn,
    x0: jax.Array,
    num_steps: int,
    method: str = "euler",
    t0: float = 0.0,
    t1: float = 1.0,
    return_trajectory: bool = False,
) -> jax.Array:
    """Integrate dx/dt = fn(t, x) over ``linspace(t0, t1, num_steps)``.

    One ``lax.scan`` over the (num_steps - 1) intervals; compiled once per
    (method, num_steps, shape). Set ``return_trajectory=True`` to get all
    ``num_steps`` nodes stacked on a leading axis (node 0 is x0).
    """
    if method not in _STEPPERS:
        raise ValueError(f"Unknown fixed-step method '{method}'; options: {sorted(_STEPPERS)}")
    n_intervals = int(num_steps) - 1
    if n_intervals <= 0:
        return jnp.expand_dims(x0, 0) if return_trajectory else x0
    stepper = _STEPPERS[method]
    dt = jnp.asarray((t1 - t0) / n_intervals, dtype=jnp.float32)
    ts = t0 + dt * jnp.arange(n_intervals, dtype=jnp.float32)

    def body(x, t):
        x_next = stepper(fn, t, x, dt)
        return x_next, x_next if return_trajectory else None

    x_final, traj = jax.lax.scan(body, x0, ts)
    if return_trajectory:
        return jnp.concatenate([jnp.expand_dims(x0, 0), traj], axis=0)
    return x_final


# --------------------------------------------------------------------- dopri5
# Dormand–Prince 5(4) Butcher tableau.
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40)


def odeint_dopri5(
    fn: VelocityFn,
    x0: jax.Array,
    t0: float = 0.0,
    t1: float = 1.0,
    atol: float = 1e-4,
    rtol: float = 1e-4,
    max_steps: int = 1000,
) -> jax.Array:
    """Adaptive Dormand–Prince RK45 under ``lax.while_loop`` (dopri5 parity).

    Exploits the FSAL (first-same-as-last) property: stage 7 is evaluated at
    the accepted solution point (c=1, A row = b5), so it becomes the next
    step's stage 1 — 6 velocity-net evaluations per step instead of 7. The
    error norm is a scalar over the whole batch (one step size for all
    examples — torchdyn semantics; per-sample step control would force
    per-sample time states).
    """
    dtype = jnp.float32
    x0 = x0.astype(dtype)
    span = t1 - t0

    def eval_stages(t, x, h, k1):
        ks = [k1]
        for i in range(1, 7):
            xi = x
            for j, a in enumerate(_DP_A[i]):
                xi = xi + h * a * ks[j]
            ks.append(fn(t + _DP_C[i] * h, xi))
        return ks

    def err_norm(err, x, x_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x_new))
        return jnp.sqrt(jnp.mean(jnp.square(err / scale)))

    def cond(state):
        t, _, _, _, n = state
        return jnp.logical_and(t < t1 - 1e-9, n < max_steps)

    def body(state):
        t, x, h, k1, n = state
        h = jnp.minimum(h, t1 - t)
        ks = eval_stages(t, x, h, k1)
        x5 = x
        err = jnp.zeros_like(x)
        for k, (b5, b4) in zip(ks, zip(_DP_B5, _DP_B4)):
            x5 = x5 + h * b5 * k
            err = err + h * (b5 - b4) * k
        norm = err_norm(err, x, x5)
        accept = norm <= 1.0
        factor = jnp.clip(0.9 * jnp.power(jnp.maximum(norm, 1e-10), -0.2), 0.2, 5.0)
        h_new = jnp.clip(h * factor, span * 1e-5, span)
        t_new = jnp.where(accept, t + h, t)
        x_new = jnp.where(accept, x5, x)
        # FSAL: on acceptance ks[6] = fn(t_new, x_new); on rejection (t, x)
        # are unchanged so the cached k1 stays valid either way.
        k1_new = jnp.where(accept, ks[6], k1)
        return (t_new, x_new, h_new, k1_new, n + 1)

    h0 = jnp.asarray(span / 50.0, dtype)
    init = (
        jnp.asarray(t0, dtype),
        x0,
        h0,
        fn(jnp.asarray(t0, dtype), x0),
        jnp.asarray(0, jnp.int32),
    )
    t_final, x_final, _, _, n_final = jax.lax.while_loop(cond, body, init)
    # Non-convergence is otherwise silent (the loop exits at max_steps with t
    # frozen short of t1 and returns a partially integrated state): surface it
    # loudly — callers jit this, so a device-side print is the available
    # signal (matches torchdyn, which also cannot raise mid-solve). Compiled
    # out on runtimes without host callbacks (the probe explains).
    if _host_callbacks_supported():
        jax.lax.cond(
            jnp.abs(t_final - t1) > 1e-6 * jnp.maximum(jnp.abs(span), 1.0),
            lambda: jax.debug.print(
                "WARNING: dopri5 stopped at t={t} of {t1} after {n} steps "
                "(step size collapsed or max_steps hit); result is partially "
                "integrated",
                t=t_final, t1=t1, n=n_final,
            ),
            lambda: None,
        )
    return x_final


def integrate(
    fn: VelocityFn,
    x0: jax.Array,
    num_steps: int = 100,
    method: str = "euler",
    t0: float = 0.0,
    t1: float = 1.0,
    atol: float = 1e-4,
    rtol: float = 1e-4,
) -> jax.Array:
    """Unified entry: fixed-step scan methods or adaptive 'dopri5'."""
    if method == "dopri5":
        return odeint_dopri5(fn, x0, t0=t0, t1=t1, atol=atol, rtol=rtol)
    return odeint_fixed(fn, x0, num_steps, method=method, t0=t0, t1=t1)


class SolverConfig:
    """Inference-solver spec (NeuralODE-config replacement,
    ref: configs/model/conditional_flow_matching.yaml:33-39). ``sensitivity``
    is accepted for config parity and ignored: sampling is forward-only and
    differentiable through the scan if ever needed."""

    def __init__(
        self,
        solver: str = "euler",
        atol: float = 1e-4,
        rtol: float = 1e-4,
        sensitivity: str = "adjoint",
    ):
        self.solver = solver
        self.atol = atol
        self.rtol = rtol
        self.sensitivity = sensitivity

    def __call__(self, fn: VelocityFn, x0: jax.Array, num_steps: int) -> jax.Array:
        return integrate(
            fn, x0, num_steps=num_steps, method=self.solver, atol=self.atol, rtol=self.rtol
        )


__all__ = ["integrate", "odeint_fixed", "odeint_dopri5", "SolverConfig", "VelocityFn"]
