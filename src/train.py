"""Training entrypoint (parity: /root/reference/src/train.py:43-161).

``python src/train.py experiment=smoke_synthetic`` — composes the config tree
(first-party Hydra-equivalent), instantiates datamodule/task/callbacks/loggers/
Trainer, runs fit (+ optional test on the best checkpoint) and returns the
optimized metric for sweepers. ``-m``/``--multirun`` sweeps comma-separated
overrides; attaching ``hparams_search=...`` runs the TPE study instead.
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
    get_metric_value,
    instantiate_callbacks,
    instantiate_loggers,
    log_hyperparameters,
    task_wrapper,
)
from stain2stain_tpu.utils.seed import seed_everything

log = RankedLogger(__name__, rank_zero_only=True)


def _resolve_ckpt_path(ckpt_path: Optional[str]) -> Optional[str]:
    """Resolve ``wandb-artifact://`` checkpoint references (ref train.py:74-99).

    With the wandb client installed the artifact is downloaded; without it
    (this image) a local-cache lookup under WANDB_CACHE_DIR is attempted and a
    clear error raised otherwise. Plain paths pass through.
    """
    if not ckpt_path or not str(ckpt_path).startswith("wandb-artifact://"):
        return ckpt_path
    ref = str(ckpt_path)[len("wandb-artifact://") :]
    try:
        import wandb  # noqa: F401

        api = wandb.Api()
        artifact = api.artifact(ref)
        ckpt_dir = artifact.download()
        return str(Path(ckpt_dir))
    except ImportError:
        cache = Path(os.environ.get("WANDB_CACHE_DIR", "wandb_artifacts")) / ref.replace("/", "_").replace(":", "_")
        if cache.exists():
            log.info(f"Resolved wandb artifact from local cache: {cache}")
            return str(cache)
        raise FileNotFoundError(
            f"ckpt_path '{ckpt_path}' is a wandb artifact but the wandb client is not "
            f"installed and no local cache was found at {cache}."
        )


@task_wrapper
def train(cfg: Config) -> tuple[dict, dict]:
    """Train (and optionally test on the best checkpoint). Returns
    (metric_dict, object_dict) — ref src/train.py:43-134."""
    if cfg.get("seed") is not None:
        seed_everything(cfg["seed"], workers=True)

    log.info(f"Instantiating datamodule <{cfg['data']['_target_']}>")
    datamodule = instantiate(cfg["data"])

    log.info(f"Instantiating model <{cfg['model']['_target_']}>")
    model = instantiate(cfg["model"])

    log.info("Instantiating callbacks...")
    callbacks = instantiate_callbacks(cfg.get("callbacks"))

    log.info("Instantiating loggers...")
    logger = instantiate_loggers(cfg.get("logger"))

    log.info(f"Instantiating trainer <{cfg['trainer']['_target_']}>")
    trainer = instantiate(cfg["trainer"], callbacks=callbacks, logger=logger)

    object_dict = {
        "cfg": cfg,
        "datamodule": datamodule,
        "model": model,
        "callbacks": callbacks,
        "logger": logger,
        "trainer": trainer,
    }

    if logger:
        log.info("Logging hyperparameters!")
        log_hyperparameters(object_dict)

    ckpt_path = _resolve_ckpt_path(cfg.get("ckpt_path"))

    if cfg.get("train", True):
        log.info("Starting training!")
        trainer.fit(model, datamodule, ckpt_path=ckpt_path)

    train_metrics = dict(trainer.callback_metrics)

    test_metrics: dict = {}
    if cfg.get("test"):
        log.info("Starting testing!")
        ckpt_cb = trainer.checkpoint_callback
        best = ckpt_cb.best_model_path if ckpt_cb else ""
        if not best:
            log.warning("Best ckpt not found! Using current weights for testing...")
            best = None
        test_metrics = trainer.test(model, datamodule, ckpt_path=best)
        log.info(f"Best ckpt path: {best}")

    return {**train_metrics, **test_metrics}, object_dict


@config_main(config_path="../configs", config_name="train.yaml")
def main(cfg: Config) -> Optional[float]:
    from stain2stain_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    extras(cfg)

    if cfg.get("sweeper"):
        from stain2stain_tpu.sweep import run_study

        return run_study(cfg, lambda c: train(c)[0])

    metric_dict, _ = train(cfg)
    return get_metric_value(metric_dict, cfg.get("optimized_metric"))


if __name__ == "__main__":
    main()
