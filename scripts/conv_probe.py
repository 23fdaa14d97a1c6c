#!/usr/bin/env python
"""Microbenchmark: where does the train-step MFU go at the conv level?

Round-2 finding (BASELINE.md): the flagship 256px CFM UNet trains at ~52% MFU
while the same model infers at 74-80% — the gap must live in the backward
conv path. This probe times, per dominant UNet level shape, the XLA
``lax.conv_general_dilated`` forward / input-grad / weight-grad against a
9-tap matmul ("tapsum") decomposition whose autodiff produces plain matmul
grads. Output: one line per (shape, impl, pass) with ms and % MFU.

Run standalone in its own subprocess (axon HBM hygiene):
    python scripts/conv_probe.py [shape_idx ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO_ROOT / ".jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

V5E_BF16_FLOPS = 197e12
# (B, H, W, Cin, Cout) — the four level shapes of the flagship 256px UNet
# (128 base ch, mult (1,2,2,4)) at batch 32.
SHAPES = [
    (32, 256, 256, 128, 128),
    (32, 128, 128, 256, 256),
    (32, 64, 64, 256, 256),
    (32, 32, 32, 512, 512),
]
WARMUP, REPS = 2, 10


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv_tapsum(x, w):
    """3x3 SAME conv as 9 shifted (BHW, Cin) x (Cin, Cout) matmuls."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W, w.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + H, dx : dx + W, :]
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", patch, w[dy, dx], preferred_element_type=jnp.float32
            )
    return out.astype(x.dtype)


def timed(step, carry_init, n_iter: int = 16) -> float:
    """ms per iteration of ``carry = step(carry)`` chained n_iter times INSIDE
    one jitted lax.scan — per-call dispatch through the axon tunnel costs
    ~25-30 ms, so op-level timing must amortize it inside a single program."""

    @jax.jit
    def chained(carry):
        def body(c, _):
            return step(c), ()

        out, _ = jax.lax.scan(body, carry, None, length=n_iter)
        return out

    out = chained(carry_init)
    for _ in range(WARMUP):
        out = chained(carry_init)
    # pull a scalar: block_until_ready returns early through the axon tunnel
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = chained(carry_init)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / REPS / n_iter


def probe(shape) -> None:
    B, H, W, Cin, Cout = shape
    flops = 2 * B * H * W * 9 * Cin * Cout
    kx, kw, kg = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, H, W, Cin), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, Cin, Cout), jnp.bfloat16) * 0.05
    dy = jax.random.normal(kg, (B, H, W, Cout), jnp.bfloat16)

    for name, conv in (("xla", conv_xla), ("tapsum", conv_tapsum)):
        # Feedback keeps the chain data-dependent (Cin == Cout at every UNet
        # level, so outputs are re-feedable); small scales stop blow-up.
        def fwd_step(x_, conv=conv):
            return (conv(x_, w) * 0.01).astype(x.dtype)

        def dx_step(dy_, conv=conv):
            dx_ = jax.vjp(lambda x_: conv(x_, w), x)[1](dy_)[0]
            return (dx_ * 0.01).astype(dy.dtype)

        def dw_step(w_, conv=conv):
            dw_ = jax.vjp(lambda ww: conv(x, ww), w_)[1](dy)[0]
            return (dw_ * 1e-4).astype(w.dtype)

        def both_step(carry, conv=conv):
            x_, w_ = carry
            dx_, dw_ = jax.vjp(conv, x_, w_)[1](dy)
            return ((dx_ * 0.01).astype(x.dtype), (dw_ * 1e-4).astype(w.dtype))

        for pname, step, init, f in (
            ("fwd", fwd_step, x, flops),
            ("dx", dx_step, dy, flops),
            ("dw", dw_step, w, flops),
            ("dx+dw", both_step, (x, w), 2 * flops),
        ):
            try:
                dt = timed(step, init)
                mfu = f / dt / V5E_BF16_FLOPS
                print(
                    f"B{B} {H}x{W} c{Cin}->{Cout} {name:7s} {pname:6s} "
                    f"{dt*1e3:8.2f} ms  {mfu*100:5.1f}% MFU",
                    flush=True,
                )
            except Exception as exc:  # OOM etc — keep probing
                print(f"B{B} {H}x{W} c{Cin}->{Cout} {name:7s} {pname:6s} FAILED: "
                      f"{str(exc)[:100]}", flush=True)


def main() -> None:
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(SHAPES)))
    for i in idxs:
        probe(SHAPES[i])


if __name__ == "__main__":
    main()
