"""Serving CLI: long-lived stain-translation HTTP server.

No reference equivalent — the reference's deployment path is hard-coded
infer scripts (/root/reference/src/infer_simple_flowmatching.py:20-34);
this keeps one compiled fixed-shape generator resident on the TPU and
translates arbitrary-size images over HTTP (stain2stain_tpu/server.py):

    python src/serve.py ckpt_path=<dir> model=... port=8000 \
        num_steps=2 tile=256 overlap=32 wsi_batch=16

    curl -X POST --data-binary @slide.png -H 'Content-Type: image/png' \
        http://localhost:8000/translate -o translated.png
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
from stain2stain_tpu.server import TranslationServer, serve_forever
from stain2stain_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config):
    task = instantiate(cfg["model"])
    variables = load_state(cfg["ckpt_path"]).variables
    target_class = cfg.get("target_class")
    server = TranslationServer(
        task,
        variables,
        num_steps=int(cfg.get("num_steps", 2)),
        tile=int(cfg.get("tile", 256)),
        overlap=int(cfg.get("overlap", 32)),
        batch=int(cfg.get("wsi_batch", 16)),
        target_class=None if target_class is None else int(target_class),
    )
    log.info(f"Generator compiled: {server.info}")
    serve_forever(server, host=str(cfg.get("host", "0.0.0.0")), port=int(cfg.get("port", 8000)))


if __name__ == "__main__":
    main()
