#!/usr/bin/env python
"""A/B the fused Pallas conv pipeline against XLA at the flagship shapes.

Modes (run each in its OWN process — axon HBM hygiene):
  kernel <i>   — isolated norm_act_conv vs XLA composite at level shape i
                 (fwd and fwd+bwd, scan-chained to amortize dispatch)
  step <on|off>— full flagship 256px train step, batch 32, fused_conv on/off
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
SHAPES = [
    (32, 256, 256, 128, 128),
    (32, 128, 128, 256, 256),
    (32, 64, 64, 256, 256),
    (32, 32, 32, 512, 512),
    # 512px batch-4 levels (the round-4 512px MFU question: is the train
    # step's 37.9% at the per-op XLA ceiling for THESE shapes?)
    (4, 512, 512, 128, 128),
    (4, 256, 256, 256, 256),
    (4, 128, 128, 256, 256),
    (4, 64, 64, 512, 512),
]
WARMUP, REPS, N_ITER = 2, 8, 12


def timed(step, carry_init, *consts, n_iter=N_ITER) -> float:
    """consts are threaded as explicit args — a closed-over 512 MB tensor
    becomes an embedded program constant and blows the remote compile
    helper's request size limit (HTTP 413)."""

    @jax.jit
    def chained(carry, *cs):
        def body(c, _):
            return step(c, *cs), ()

        out, _ = jax.lax.scan(body, carry, None, length=n_iter)
        return out

    out = chained(carry_init, *consts)
    for _ in range(WARMUP):
        out = chained(carry_init, *consts)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = chained(carry_init, *consts)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    return (time.perf_counter() - t0) / REPS / n_iter


def bench_kernel(i: int, only: str | None = None) -> None:
    from stain2stain_tpu.ops import pallas_conv as pc
    from stain2stain_tpu.ops.s2b_conv import space_to_batch_conv

    B, H, W, C, D = SHAPES[i]
    flops = 2 * B * H * W * 9 * C * D
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.bfloat16)
    w = (jax.random.normal(ks[1], (3, 3, C, D), jnp.float32) * 0.05).astype(jnp.bfloat16)
    bias = jnp.zeros((D,), jnp.float32)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    dy = jax.random.normal(ks[2], (B, H, W, D), jnp.bfloat16)

    def xla_op(x, w):
        mean, rstd = pc.gn_stats(x, 32)
        z = (
            x.astype(jnp.float32) * (rstd * gamma[None])[:, None, None, :]
            + (beta[None] - mean * rstd * gamma[None])[:, None, None, :]
        )
        n = (z * jax.nn.sigmoid(z)).astype(jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            n, w.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def fused_op(x, w):
        return pc.norm_act_conv(x, w, bias, gamma, beta, groups=32, act="silu")

    def s2b_op(x, w):
        # Space-to-batch probe for the 512px batch-4 question: XLA's conv
        # tiling starves at batch 4 (roofline512.py found the step at the
        # per-op ceiling), so split each image into 2x2 halo-padded tiles and
        # run the SAME conv at 4x the batch / quarter the spatial dims. GN
        # stays in the full layout (its stats are per-sample over all of HxW).
        mean, rstd = pc.gn_stats(x, 32)
        z = (
            x.astype(jnp.float32) * (rstd * gamma[None])[:, None, None, :]
            + (beta[None] - mean * rstd * gamma[None])[:, None, None, :]
        )
        n = (z * jax.nn.sigmoid(z)).astype(jnp.bfloat16)
        return space_to_batch_conv(n, w.astype(jnp.bfloat16), factor=2)

    for name, op in (("xla", xla_op), ("fused", fused_op), ("s2b", s2b_op)):
        if only and name != only:
            continue
        if D == C:
            dt = timed(lambda x_, op=op: (op(x_, w) * 0.01).astype(jnp.bfloat16), x)
            print(f"L{i} {name:6s} fwd     {dt*1e3:7.2f} ms  {flops/dt/V5E_BF16_FLOPS*100:5.1f}% MFU", flush=True)

        def fb(x_, dy_, op=op):
            # Differentiate w.r.t. x AND w, and fold y/dw into the live output
            # — grad-of-x alone lets XLA dead-code-eliminate the weight grad
            # and most of the forward (a dx-only probe "measured" 125% MFU).
            y, vjp = jax.vjp(lambda xx, ww: op(xx, ww), x_, w)
            dx, dw = vjp(dy_.astype(y.dtype))
            live = dx * 0.01 + y.astype(dx.dtype) * 1e-6 + jnp.sum(dw) * 1e-9
            return live.astype(jnp.bfloat16)

        dt = timed(fb, x, dy)
        print(f"L{i} {name:6s} fwd+bwd {dt*1e3:7.2f} ms  {3*flops/dt/V5E_BF16_FLOPS*100:5.1f}% MFU", flush=True)


def bench_step(fused: bool) -> None:
    import bench

    result = bench.measure_train(256, (32,), fused_conv=fused)
    print("RESULT", result, flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "kernel":
        bench_kernel(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else None)
    elif sys.argv[1] == "step":
        bench_step(sys.argv[2] == "on")
