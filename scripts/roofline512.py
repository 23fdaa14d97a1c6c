#!/usr/bin/env python
"""Roofline analysis of the flagship train step from XLA's own cost model.

VERDICT round-3 ask #3 asked for a profile showing where the 512px step's
time goes. The remat-granularity sweep (scripts/exp512.py) found time nearly
flat while recompute FLOPs changed (block:2 drops 1.35 TFLOP vs block yet
saves only 11 ms), which smells bandwidth-bound. This probe closes the
question with the compiler's numbers: AOT-compile the identical measured
step (bench._make_train_step) and print `cost_analysis()` FLOPs and
bytes-accessed, then derive the two roofline bounds

    t_mxu = flops / 197e12        (v5e bf16 peak)
    t_hbm = bytes / 819e9         (v5e HBM bandwidth)

against the measured step time. If t_hbm is the larger bound and close to
the measurement, the step is HBM-bound and MFU is capped at
t_mxu / t_hbm regardless of remat policy.

Compile-only (no execution); each point in its own subprocess.

Usage: python scripts/roofline512.py <point> | all
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

POINTS = {
    # measured (exp512.py / step_ablation.py, 2026-08-19, hash dropout + rbg):
    "p512_blk2_b4": dict(size=512, batch=4, use_checkpoint="block:2", measured_ms=597.6),
    "p512_blk_b4": dict(size=512, batch=4, use_checkpoint="block", measured_ms=608.7),
    "p512_lvl_b4": dict(size=512, batch=4, use_checkpoint="level", measured_ms=748.6),
    "p256_b32": dict(size=256, batch=32, use_checkpoint=False, measured_ms=612.7),
}

V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def run(point: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", str(REPO_ROOT / ".jax_compile_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import bench
    from stain2stain_tpu.training.state import TrainState

    cfg = dict(POINTS[point])
    size, batch = cfg.pop("size"), cfg.pop("batch")
    measured_ms = cfg.pop("measured_ms")

    task = bench.build(size, cfg.pop("use_checkpoint"), fused_attention=True)
    tx, _ = task.configure_optimizers()
    src = jnp.zeros((batch, size, size, 3), jnp.uint8)
    tgt = jnp.zeros((batch, size, size, 3), jnp.uint8)
    variables = task.init_variables(
        jax.random.key(1), (jnp.zeros((1, size, size, 3), jnp.float32),)
    )
    state = TrainState.create(variables, tx)
    step = jax.jit(bench._make_train_step(task, tx), donate_argnums=(0,))
    rng = jax.random.key(2, impl="rbg")
    t0 = time.time()
    compiled = step.lower(state, src, tgt, rng).compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    print(f"ROOFLINE {point}: compile {time.time()-t0:.0f}s", flush=True)
    interesting = {
        k: v for k, v in cost.items()
        if k in ("bytes accessed", "flops", "transcendentals", "optimal_seconds")
    }
    for k in sorted(interesting):
        print(f"ROOFLINE {point}:   {k} = {interesting[k]:.4g}", flush=True)
    t_mxu = flops / V5E_BF16_FLOPS * 1e3
    t_hbm = byts / V5E_HBM_BPS * 1e3
    bound = max(t_mxu, t_hbm)
    print(
        f"ROOFLINE {point}:   t_mxu={t_mxu:.1f}ms t_hbm={t_hbm:.1f}ms "
        f"measured={measured_ms:.1f}ms "
        f"binding={'HBM' if t_hbm > t_mxu else 'MXU'} "
        f"roofline_util={bound/measured_ms*100:.0f}% "
        f"mfu_cap_at_bw_bound={t_mxu/max(t_hbm, 1e-9)*100:.0f}%",
        flush=True,
    )


if __name__ == "__main__":
    if sys.argv[1] == "all":
        for point in sys.argv[2:] or POINTS:
            proc = subprocess.run(
                [sys.executable, __file__, point],
                capture_output=True, text=True, timeout=2400,
            )
            out = proc.stdout.strip()
            if out:
                print(out, flush=True)
            if proc.returncode != 0:
                tail = "\n".join(proc.stderr.splitlines()[-6:])
                print(f"ROOFLINE {point}: rc={proc.returncode}\n{tail}", flush=True)
            time.sleep(20)
    else:
        run(sys.argv[1])
