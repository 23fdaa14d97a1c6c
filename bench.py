#!/usr/bin/env python
"""Headline benchmark: flagship CFM train-step throughput on one TPU chip.

Measures 256×256 tiles/sec/chip for the full jitted training step (device-side
normalize + CFM path sample + ADM-UNet fwd/bwd + Adam update) of the flagship
velocity model (configs/model/conditional_flow_matching.yaml parity: 128 ch,
mult (1,2,2,4), 2 res-blocks, scale-shift norm, ~71M params), bf16 compute.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against an *estimated* PyTorch-on-H100 reference throughput derived from
the measured XLA FLOP count of this exact step:

    h100_tiles/sec = MFU_ref × 989e12 FLOP/s ÷ (step FLOPs / batch)

with MFU_ref = 0.40 (a well-tuned torch/cuDNN mixed-precision UNet train
loop). The north-star target is ≥ 2× that estimate, i.e. vs_baseline ≥ 2.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H100_BF16_FLOPS = 989e12
MFU_REF = 0.40
IMAGE_SIZE = 256
WARMUP, STEPS = 3, 20


def build_step():
    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.ops.cfm import ConditionalFlowMatcher
    from stain2stain_tpu.tasks import ConditionalFlowMatchingModule
    from stain2stain_tpu.training.optim import Adam
    from stain2stain_tpu.training.state import TrainState

    net = UNetModel(
        dim=(3, IMAGE_SIZE, IMAGE_SIZE),
        num_channels=128,
        num_res_blocks=2,
        channel_mult=(1, 2, 2, 4),
        attention_resolutions="16,8",
        dropout=0.1,
        num_heads=4,
        num_head_channels=32,
        use_scale_shift_norm=True,
        dtype=jnp.bfloat16,
    )
    task = ConditionalFlowMatchingModule(net=net, optimizer=lambda: Adam(lr=1e-4))
    tx, _ = task.configure_optimizers()

    def make(batch_size: int):
        src_rng, tgt_rng = jax.random.split(jax.random.key(0))
        src_u8 = jax.random.randint(src_rng, (batch_size, IMAGE_SIZE, IMAGE_SIZE, 3), 0, 256, jnp.uint8)
        tgt_u8 = jax.random.randint(tgt_rng, (batch_size, IMAGE_SIZE, IMAGE_SIZE, 3), 0, 256, jnp.uint8)
        variables = task.init_variables(
            jax.random.key(1), (jnp.zeros((batch_size, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32),)
        )
        state = TrainState.create(variables, tx)

        def train_step(state: TrainState, src, tgt, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            prep_rng, loss_rng = jax.random.split(step_rng)
            batch = task.prepare_batch((src, tgt), prep_rng, train=True)

            def loss_fn(params):
                loss, metrics, _ = task.loss_and_metrics(
                    {"params": params}, batch, loss_rng, train=True
                )
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return state.replace(step=state.step + 1, params=new_params, opt_state=new_opt), loss

        return jax.jit(train_step, donate_argnums=(0,)), state, src_u8, tgt_u8

    return make


def main() -> None:
    make = build_step()
    result = None
    step = state = src = tgt = None
    # 64 needs ~27 GB of HLO temps (up-path concat convs at 256²) — beyond
    # one v5e chip even with the fused attention; start at the largest size
    # that fits so a failed larger attempt can't fragment/pin HBM first.
    for batch_size in (32, 16, 8):
        try:
            # Drop the previous attempt's device buffers before allocating the
            # next size — stale params/opt-state/batches otherwise pin HBM and
            # cascade the OOM down every batch size.
            del step, state, src, tgt
            step = state = src = tgt = None
            step, state, src, tgt = make(batch_size)
            rng = jax.random.key(2)
            lowered = step.lower(state, src, tgt, rng)
            compiled = lowered.compile()
            cost = compiled.cost_analysis() or {}
            step_flops = float(cost.get("flops", 0.0))
            for _ in range(WARMUP):
                state, loss = step(state, src, tgt, rng)
            float(loss)  # full host sync — the axon tunnel's block_until_ready
            # returns before remote execution completes, so timing must
            # materialize a value to host every step.
            t0 = time.perf_counter()
            for _ in range(STEPS):
                state, loss = step(state, src, tgt, rng)
                float(loss)
            dt = time.perf_counter() - t0
            result = (batch_size, STEPS * batch_size / dt, step_flops)
            print(f"# measured at batch={batch_size}: {dt/STEPS*1e3:.1f} ms/step", file=sys.stderr)
            break
        except Exception as exc:  # OOM at this batch → halve
            msg = str(exc).lower()
            if "resource_exhausted" in msg or "out of memory" in msg:
                head = str(exc).splitlines()[0][:160]
                print(f"# batch={batch_size} OOM ({head}), trying smaller", file=sys.stderr)
                continue
            raise
    if result is None:
        raise RuntimeError("benchmark OOMed at every batch size")

    batch_size, tiles_per_sec, step_flops = result
    if step_flops > 0:
        h100_est = MFU_REF * H100_BF16_FLOPS / (step_flops / batch_size)
        vs_baseline = tiles_per_sec / h100_est
    else:
        vs_baseline = 0.0
    print(
        json.dumps(
            {
                "metric": "cfm_train_tiles_per_sec_per_chip_256",
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
