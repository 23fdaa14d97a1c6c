"""Simple flow-matching inference CLI (config-driven).

Re-design of /root/reference/src/infer_simple_flowmatching.py:40-118 — which
hard-codes cluster ckpt/data paths and loads the ckpt at import time. Here:

    python src/infer_simple_flowmatching.py ckpt_path=<dir> \
        data.data_dir=<tiles> num_steps=2

iterates the test split and writes source/generated/target PNG panels.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

from stain2stain_tpu.config import Config, config_main
from stain2stain_tpu.inference import basic_panels, run_inference


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config):
    num_steps = int(cfg.get("num_steps", 2))
    return run_inference(
        cfg, lambda task, variables, prepared: basic_panels(task, variables, prepared, num_steps)
    )


if __name__ == "__main__":
    main()
