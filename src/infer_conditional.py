"""Mask-conditioned inference CLI (config-driven).

Covers the mask-conditioned / toggled-mask model family
(/root/reference/src/models/conditional_flow_matching_conditional_mask.py:172-198):
generation concatenates the (optionally zeroed) mask at every ODE step.

    python src/infer_conditional.py ckpt_path=<dir> \
        model=conditional_flow_matching_masked_condition \
        data=paired_data_mask_he_amyloid [+zero_mask=true]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

import jax.numpy as jnp
import numpy as np

from stain2stain_tpu.config import Config, config_main
from stain2stain_tpu.inference import run_inference
from stain2stain_tpu.ops.image import denormalize


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config):
    num_steps = int(cfg.get("num_steps", 50))
    zero_mask = bool(cfg.get("zero_mask", False))

    def panels(task, variables, prepared):
        src, tgt, mask = prepared[0], prepared[1], prepared[2]
        gen_mask = jnp.zeros_like(mask) if zero_mask else mask
        gen = task.generate(variables, src, num_steps=num_steps, mask=gen_mask)
        return {
            "source": denormalize(src),
            "generated": denormalize(gen),
            "target": denormalize(tgt),
            "mask": np.asarray(mask, dtype=np.float32),
        }

    return run_inference(cfg, panels)


if __name__ == "__main__":
    main()
