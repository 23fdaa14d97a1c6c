#!/usr/bin/env python
"""Seed the persistent XLA compile cache with the test suite's shared programs.

The fast test tier's cold time is dominated by one-time XLA compiles through
the TPU tunnel (README "test tiers"); almost every e2e test reuses the same
tiny-net programs (32px, 8-ch UNet — the smoke_synthetic shape, also used by
tests/test_infer.py, test_eval.py, test_e2e_real_images.py). Running this
once precompiles them into .jax_compile_cache so a subsequent `make test`
starts warm:

- smoke_synthetic fit programs: init, train step (batch 4, augment), eval
  step, checkpoint-restore test step
- the 2-step and 8-step Euler generate programs used by the image-logging
  and infer paths
- the multitask + class-conditional smoke variants (their tasks compile
  distinct train/eval programs)

Usage: python scripts/warm_cache.py [--skip-variants]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))


def run_experiment(name: str, tmp: Path, extra=(), data_dir: Path | None = None) -> None:
    from src.train import train
    from stain2stain_tpu.config import compose

    t0 = time.time()
    cfg = compose(
        REPO_ROOT / "configs",
        "train.yaml",
        [
            f"experiment={name}",
            f"data.data_dir={data_dir or f'{tmp}/synthetic'}",
            "logger=csv",
            "trainer.max_epochs=1",
            "test=true",
            *extra,
        ],
    )
    out = tmp / f"out_{name}"
    out.mkdir(parents=True, exist_ok=True)
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    train(cfg)
    print(f"# warmed {name} in {time.time() - t0:.0f}s", flush=True)


def main() -> None:
    import tempfile

    skip_variants = "--skip-variants" in sys.argv
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        # image logging ON compiles the 2-step generate used by epoch hooks
        run_experiment("smoke_synthetic", tmp, ["model.log_images=true"])
        if not skip_variants:
            run_experiment("smoke_multitask", tmp)
            # any2any reads a domain-folder layout, not the paired-CSV tree
            from stain2stain_tpu.data.synthetic import generate_domain_folders

            generate_domain_folders(tmp / "domains", n_images=8, size=48)
            run_experiment("smoke_any2any", tmp, data_dir=tmp / "domains")
    print("# compile cache warmed", flush=True)


if __name__ == "__main__":
    main()
