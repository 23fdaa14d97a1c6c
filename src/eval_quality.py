"""Quality-parity evaluation CLI: SSIM / PSNR / FID of translated stains.

The harness SURVEY.md §6 calls for (the reference publishes no numbers):

    python src/eval_quality.py ckpt_path=<dir> data=... model=... \
        num_steps=50 [n_batches=8]

Prints one JSON line with ssim/psnr/fid over the test split.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

from stain2stain_tpu.config import Config, config_main, instantiate
from stain2stain_tpu.inference import load_state
from stain2stain_tpu.ops.metrics import evaluate_quality
from stain2stain_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config) -> dict:
    datamodule = instantiate(cfg["data"])
    task = instantiate(cfg["model"])
    state = load_state(cfg["ckpt_path"])

    datamodule.prepare_data()
    datamodule.setup("test")
    loader = datamodule.test_dataloader() or datamodule.val_dataloader()
    if loader is None:
        raise RuntimeError("No test/val loader for quality evaluation")

    metrics = evaluate_quality(
        task,
        state.variables,
        loader,
        num_steps=int(cfg.get("num_steps", 50)),
        max_batches=cfg.get("n_batches"),
    )
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
