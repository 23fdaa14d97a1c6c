"""Evaluation entrypoint (parity: /root/reference/src/eval.py:38-99).

``python src/eval.py ckpt_path=/path/to/ckpt [data=... model=...]`` —
instantiates datamodule/model/loggers/Trainer and runs the test loop on the
given checkpoint.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

from stain2stain_tpu.config import Config, config_main, instantiate
from stain2stain_tpu.utils import (
    RankedLogger,
    extras,
    instantiate_loggers,
    log_hyperparameters,
    task_wrapper,
)

log = RankedLogger(__name__, rank_zero_only=True)


@task_wrapper
def evaluate(cfg: Config) -> tuple[dict, dict]:
    if not cfg.get("ckpt_path"):
        raise ValueError("ckpt_path is required for evaluation (eval.yaml sets it to ???)")

    log.info(f"Instantiating datamodule <{cfg['data']['_target_']}>")
    datamodule = instantiate(cfg["data"])

    log.info(f"Instantiating model <{cfg['model']['_target_']}>")
    model = instantiate(cfg["model"])

    log.info("Instantiating loggers...")
    logger = instantiate_loggers(cfg.get("logger"))

    log.info(f"Instantiating trainer <{cfg['trainer']['_target_']}>")
    trainer = instantiate(cfg["trainer"], logger=logger)

    object_dict = {
        "cfg": cfg,
        "datamodule": datamodule,
        "model": model,
        "logger": logger,
        "trainer": trainer,
    }
    if logger:
        log.info("Logging hyperparameters!")
        log_hyperparameters(object_dict)

    log.info("Starting testing!")
    metrics = trainer.test(model, datamodule, ckpt_path=cfg["ckpt_path"])
    return metrics, object_dict


@config_main(config_path="../configs", config_name="eval.yaml")
def main(cfg: Config) -> Optional[dict]:
    from stain2stain_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    extras(cfg)
    metric_dict, _ = evaluate(cfg)
    return metric_dict


if __name__ == "__main__":
    main()
