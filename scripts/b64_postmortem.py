#!/usr/bin/env python
"""Batch-64 @256px memory post-mortem (VERDICT round-3 ask #8).

Two rounds of OOM re-tests established that neither the dropout mask
residuals nor the attention softmax stats were the binding constraint at
batch 64. This script closes the question with the compiler's own numbers:
it AOT-compiles the flagship train step at several (batch, variant) points
WITHOUT executing, and prints XLA's memory analysis (argument / output /
temp / alias sizes) for each, so the binding allocation can be named from
the compiled program rather than guessed from OOM deltas.

Variants probed at batch 64 (the "exploit" axes from the verdict):
  plain      — the production step (donated state, f32 Adam moments)
  bf16mom    — Adam moments cast to bf16 (saves 2 x 284 MB for 71M params)
  nodrop     — dropout off (storage-free masks should make this a no-op)
  blockremat — block-granular remat

Compile-only: safe to run while nothing else uses the chip, costs no
measurement time. Each point in its own subprocess (axon compiler hygiene).

Usage: python scripts/b64_postmortem.py <point> | all
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
    "b32_plain": dict(batch=32),
    "b64_plain": dict(batch=64),
    "b64_bf16mom": dict(batch=64, bf16_moments=True),
    "b64_nodrop": dict(batch=64, dropout=0.0),
    "b64_blockremat": dict(batch=64, use_checkpoint="block"),
    "b48_plain": dict(batch=48),
    # Round-5 probes (VERDICT r4 ask #8): with batch 32 at 94% HBM, do the
    # remaining freed-HBM levers — donating the uint8 src/tgt input buffers
    # (donate_inputs: XLA may alias them into the temp pool) and bf16 Adam
    # moments (-0.57 GiB for 71M params) — open ANY intermediate batch?
    # Non-power-of-2 batches are legal on the MXU (the batch dim is just the
    # outermost spatial tile).
    "b40_plain": dict(batch=40),
    "b40_exploit": dict(batch=40, bf16_moments=True, donate_inputs=True),
    "b40_exploit_blk2": dict(batch=40, bf16_moments=True, donate_inputs=True,
                             use_checkpoint="block:2"),
    "b48_exploit": dict(batch=48, bf16_moments=True, donate_inputs=True),
    "b48_exploit_blk2": dict(batch=48, bf16_moments=True, donate_inputs=True,
                             use_checkpoint="block:2"),
}

HBM_BYTES = 16 * 1024**3  # v5e lite: 16 GiB HBM per chip


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
    batch = cfg.pop("batch")
    bf16_moments = cfg.pop("bf16_moments", False)
    dropout = cfg.pop("dropout", 0.1)
    use_checkpoint = cfg.pop("use_checkpoint", False)
    donate_inputs = cfg.pop("donate_inputs", False)

    task = bench.build(256, use_checkpoint, fused_attention=True, dropout=dropout)
    tx, _ = task.configure_optimizers()

    src = jnp.zeros((batch, 256, 256, 3), jnp.uint8)
    tgt = jnp.zeros((batch, 256, 256, 3), jnp.uint8)
    variables = task.init_variables(
        jax.random.key(1), (jnp.zeros((1, 256, 256, 3), jnp.float32),)
    )
    state = TrainState.create(variables, tx)
    if bf16_moments:
        # cast every f32 optimizer-state leaf with param shape to bf16 —
        # the moments; the int step counter and LR stay as-is
        import jax.tree_util as jtu

        state = state.replace(
            opt_state=jtu.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim > 0
                else x,
                state.opt_state,
            )
        )
    donate = (0, 1, 2) if donate_inputs else (0,)
    step = jax.jit(bench._make_train_step(task, tx), donate_argnums=donate)
    rng = jax.random.key(2, impl="rbg")
    t0 = time.time()
    compiled = step.lower(state, src, tgt, rng).compile()
    mem = compiled.memory_analysis()
    gib = 1024**3
    fields = {}
    for name in (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(mem, name, None)
        if v is not None:
            fields[name] = v
    total = (
        fields.get("argument_size_in_bytes", 0)
        + fields.get("output_size_in_bytes", 0)
        + fields.get("temp_size_in_bytes", 0)
        - fields.get("alias_size_in_bytes", 0)
    )
    print(f"B64PM {point}: compile {time.time()-t0:.0f}s", flush=True)
    for k, v in fields.items():
        print(f"B64PM {point}:   {k} = {v/gib:.3f} GiB", flush=True)
    print(
        f"B64PM {point}:   peak(arg+out+temp-alias) = {total/gib:.3f} GiB "
        f"({total/HBM_BYTES*100:.0f}% of 16 GiB HBM)",
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
                tail = "\n".join(proc.stderr.splitlines()[-8:])
                print(f"B64PM {point}: rc={proc.returncode}\n{tail}", flush=True)
            time.sleep(20)
    else:
        run(sys.argv[1])
