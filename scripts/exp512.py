#!/usr/bin/env python
"""512px operating-point experiments (VERDICT round-3 ask #3).

Each mode in its OWN process (axon HBM hygiene):
  attn_b4    — batch 4, level remat, Pallas attention ON (round-2 crash retest)
  einsum_b8  — batch 8, level remat, einsum attention (fused-norm headroom)
  fusedconv  — batch 4, NO remat, fused_conv=True (the kernel's VJP stores no
               normalized activations — substitute for remat at the
               memory-bound point)
  fusedconv_blk — batch 4, block remat, fused_conv=True

Post-FastDropout probes (dropout residuals are now storage-free, so remat
granularity can potentially be relaxed — ops/dropout.py):
  drop_blk_b4  — batch 4, BLOCK remat (cheaper recompute than level), Pallas
                 attention, rbg
  drop_lvl_b6  — batch 6, level remat, Pallas attention, rbg (batch-6 retry)

Usage: python scripts/exp512.py <mode> | all
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

MODES = {
    # dropout_impl="bits" pins the pre-round-4 PRNG-word mask on the rows that
    # were measured in round 3 (the package default is now the counter hash)
    "attn_b4": dict(batch_sizes=(4,), use_checkpoint="level", fused_attention=True,
                    dropout_impl="bits"),
    "einsum_b8": dict(batch_sizes=(8, 6), use_checkpoint="level", fused_attention=False,
                      dropout_impl="bits"),
    "fusedconv": dict(batch_sizes=(4,), use_checkpoint=False, fused_attention=False,
                      fused_conv=True),
    "fusedconv_blk": dict(batch_sizes=(4,), use_checkpoint="block",
                          fused_attention=False, fused_conv=True),
    "drop_blk_b4": dict(batch_sizes=(4,), use_checkpoint="block",
                        fused_attention=True, prng_impl="rbg", dropout_impl="bits"),
    "drop_lvl_b6": dict(batch_sizes=(6,), use_checkpoint="level",
                        fused_attention=True, prng_impl="rbg", dropout_impl="bits"),
    # Round-4 probes (VERDICT ask #3: push 512px past 45% MFU). The round-2
    # "no-remat OOMs at 512px" conclusion PREDATES the fused-norm residual fix
    # (f32 GroupNorm residuals were the OOM cause, docs/architecture.md):
    # batch-4 no-remat activations are ~half the 256px batch-32 footprint that
    # fits, so remat may no longer be needed at all.
    "noremat_b4": dict(batch_sizes=(4,), use_checkpoint=False,
                       fused_attention=True, prng_impl="rbg"),
    "noremat_b2": dict(batch_sizes=(2,), use_checkpoint=False,
                       fused_attention=True, prng_impl="rbg"),
    # hash dropout (fusible counter mask, ops/dropout.py): at 512px the
    # level-remat backward regenerates every mask, so mask cost is paid ~2x —
    # threefry was ~40% of the step, rbg less, hash should be ~free.
    "hash_lvl_b4": dict(batch_sizes=(4,), use_checkpoint="level",
                        fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    "hash_noremat_b4": dict(batch_sizes=(4,), use_checkpoint=False,
                            fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    # block remat recomputes ~1 ResBlock per residual instead of a whole
    # UNet level — cheaper replay than "level" if batch 4 fits under it
    "hash_blk_b4": dict(batch_sizes=(4,), use_checkpoint="block",
                        fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    # remat-free batch 2 (half the activation footprint of noremat_b4); the
    # trainer covers effective batch 4 via accumulate_grad_batches=2
    "hash_noremat_b2": dict(batch_sizes=(2,), use_checkpoint=False,
                            fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    # Measured so far (2026-08-19): noremat OOMs at b4 AND b2; block b4 = 608.7
    # ms (37.9% MFU) — the best fitting point. Next levers:
    #   hash_blk_b8   — block remat at batch 8/6: occupancy, not recompute
    #   blk2_b4/b6    — partial-depth remat ("block:2"): remat only the two
    #                   shallowest levels (most activation bytes), store the
    #                   deep levels + mid (~half the recompute FLOPs back)
    "hash_blk_b8": dict(batch_sizes=(8, 6), use_checkpoint="block",
                        fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    "blk2_b4": dict(batch_sizes=(4,), use_checkpoint="block:2",
                    fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    "blk2_b6": dict(batch_sizes=(6,), use_checkpoint="block:2",
                    fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    "blk3_b4": dict(batch_sizes=(4,), use_checkpoint="block:3",
                    fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    "lvl2_b4": dict(batch_sizes=(4,), use_checkpoint="level:2",
                    fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    # Round-4 space-to-batch probes: the roofline (scripts/roofline512.py)
    # showed the block:2 step executes at only 37% of its compute bound and
    # isolated convs at the 512px batch-4 shapes reach just 31-50% MFU — XLA's
    # conv tiling starves at batch 4. s2b_conv=f re-expresses each ResBlock
    # 3x3 conv as a batch-rich one over f×f halo tiles (ops/s2b_conv.py),
    # numerics unchanged (tests/test_s2b_conv.py).
    "s2b_blk2_b4": dict(batch_sizes=(4,), use_checkpoint="block:2", s2b_conv=2,
                        fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
    "s2b4_blk2_b4": dict(batch_sizes=(4,), use_checkpoint="block:2", s2b_conv=4,
                         fused_attention=True, prng_impl="rbg", dropout_impl="hash"),
}


def run(mode: str) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(REPO_ROOT / ".jax_compile_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import bench

    cfg = dict(MODES[mode])
    impl = cfg.pop("dropout_impl", None)
    if impl:  # force a specific mask impl (the package default is "hash")
        import stain2stain_tpu.models.unet as unet_mod
        from stain2stain_tpu.ops.dropout import FastDropout as _FD

        unet_mod.FastDropout = lambda rate: _FD(rate, impl=impl)
    batch_sizes = cfg.pop("batch_sizes")
    result = bench.measure_train(512, batch_sizes, **cfg)
    print(f"EXP512 {mode}: {result}", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "all":
        for mode in sys.argv[2:] or MODES:
            t0 = time.time()
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, mode], capture_output=True,
                    text=True, timeout=2400,
                )
            except subprocess.TimeoutExpired:
                print(f"EXP512 {mode}: TIMEOUT", flush=True)
                time.sleep(120)
                continue
            for line in proc.stderr.splitlines():
                if line.startswith("#") or "Error" in line or "error:" in line:
                    print(f"[{mode}] {line[:300]}", flush=True)
            print(proc.stdout.strip() or f"EXP512 {mode}: rc={proc.returncode}",
                  f"({time.time()-t0:.0f}s)", flush=True)
            time.sleep(90)
    else:
        run(sys.argv[1])
