"""Any↔any multi-stain inference CLI (config-driven).

Replaces the reference's notebook loop (notebooks/infer_any2any.ipynb cells
10-14: a Python loop calling ``generate`` once per target class). TPU-first
upgrade: ``generate_all_classes`` batches the stain-code axis so every target
domain integrates in ONE compiled call (SURVEY.md §3.5 north-star).

    python src/infer_any2any.py ckpt_path=<dir> \
        model=class_conditional_flow_matching \
        data=class_conditional_he_amyloid num_steps=100
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
from stain2stain_tpu.inference import run_inference
from stain2stain_tpu.ops.image import denormalize


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config):
    num_steps = int(cfg.get("num_steps", 100))
    class_names = cfg.get("class_names") or {}

    def panels(task, variables, prepared):
        src = prepared[0]
        # (num_classes, B, H, W, C) from one compiled call
        all_cls = task.generate_all_classes(variables, src, num_steps=num_steps)
        out = {"source": denormalize(src)}
        for c in range(all_cls.shape[0]):
            name = class_names.get(c, f"class_{c}") if isinstance(class_names, dict) else f"class_{c}"
            out[f"to_{name}"] = denormalize(all_cls[c])
        return out

    return run_inference(cfg, panels)


if __name__ == "__main__":
    main()
