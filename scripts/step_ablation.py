#!/usr/bin/env python
"""Train-step ablations for the flagship 256px operating point.

Each mode runs in its OWN process (axon HBM hygiene — see bench.py):
  base      — dropout 0.1, threefry PRNG (the headline configuration)
  rbg       — dropout 0.1, TPU hardware RBG PRNG for the step RNG
  nodrop    — dropout 0.0 (bounds the total dropout+RNG cost)
  nodrop_na — dropout 0.0 AND no attention (bounds mid-attention cost)

Usage: python scripts/step_ablation.py <mode>
       python scripts/step_ablation.py all   (spawns one subprocess per mode)
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
    "base": dict(dropout=0.1, prng_impl="threefry2x32"),
    "rbg": dict(dropout=0.1, prng_impl="rbg"),
    "nodrop": dict(dropout=0.0),
    "nodrop_na": dict(dropout=0.0, attention=False),
}


def run(mode: str) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(REPO_ROOT / ".jax_compile_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import bench

    cfg = dict(MODES[mode])
    if not cfg.pop("attention", True):
        import stain2stain_tpu.models.unet as unet_mod

        # attention_resolutions="" — build() hardcodes "16,8"; patch the
        # module's resolver so the mid block skips attention too.
        orig = unet_mod.UNetModel._attention_ds
        unet_mod.UNetModel._attention_ds = lambda self: ()
    result = bench.measure_train(256, (32,), **cfg)
    print(f"ABLATION {mode}: {result}", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "all":
        for mode in MODES:
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, __file__, mode], capture_output=True, text=True,
                timeout=1200,
            )
            for line in proc.stderr.splitlines():
                if line.startswith("#"):
                    print(f"[{mode}] {line}", flush=True)
            print(proc.stdout.strip(), f"({time.time()-t0:.0f}s)", flush=True)
            time.sleep(60)
    else:
        run(sys.argv[1])
