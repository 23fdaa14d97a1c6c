"""Multitask-multiclass inference CLI (config-driven).

Re-design of /root/reference/src/infer_multitask_multiclassloss.py:40-118
(hard-coded script, 50 ODE steps, ``generate`` returns (img, pred_mask)):

    python src/infer_multitask_multiclassloss.py ckpt_path=<dir> \
        model=conditional_flow_matching_multitask_multiclass \
        data=paired_data_multiclass_seg_mask +num_classes=2

Writes source/generated/target/pred-mask/gt-mask panels.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

import numpy as np

from stain2stain_tpu.config import Config, config_main
from stain2stain_tpu.inference import run_inference
from stain2stain_tpu.ops.image import denormalize


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config):
    num_steps = int(cfg.get("num_steps", 50))

    def panels(task, variables, prepared):
        src, tgt = prepared[0], prepared[1]
        gen, pred_mask = task.generate(variables, src, num_steps=num_steps)
        out = {
            "source": denormalize(src),
            "generated": denormalize(gen),
            "target": denormalize(tgt),
            "pred_mask": np.asarray(pred_mask, dtype=np.float32),
        }
        if len(prepared) > 2:
            out["gt_mask"] = np.asarray(prepared[2], dtype=np.float32)
        return out

    return run_inference(cfg, panels)


if __name__ == "__main__":
    main()
