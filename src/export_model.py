"""Export a trained checkpoint as a sealed serving artifact.

    python src/export_model.py ckpt_path=<dir> data=... model=... \
        num_steps=50 +batch=8 +image_size=256 +out=model.stablehlo

Produces one StableHLO program (params baked in, ODE sampler unrolled) that
``stain2stain_tpu.serving.load_generator`` can run without any model code.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

from stain2stain_tpu.config import Config, config_main, instantiate
from stain2stain_tpu.inference import load_state
from stain2stain_tpu.serving import export_generator


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config):
    task = instantiate(cfg["model"])
    state = load_state(cfg["ckpt_path"])
    out = cfg.get("out") or str(Path(cfg["paths"]["output_dir"]) / "generator.stablehlo")
    return export_generator(
        task,
        state.variables,
        out,
        batch=int(cfg.get("batch", 8)),
        image_size=int(cfg.get("image_size", cfg["model"]["net"]["dim"][-1])),
        num_steps=int(cfg.get("num_steps", 50)),
        in_channels=int(cfg["model"]["net"]["dim"][0]),
    )


if __name__ == "__main__":
    main()
