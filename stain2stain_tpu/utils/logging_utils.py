"""Hyperparameter logging to every configured logger.

Parity for /root/reference/src/utils/logging_utils.py:33-57: pushes selected
config sections plus total/trainable parameter counts, process-0 only.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from .pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


def log_hyperparameters(object_dict: dict) -> None:
    if jax.process_index() != 0:
        return
    cfg = object_dict["cfg"]
    trainer = object_dict["trainer"]
    if not trainer.loggers:
        log.warning("Logger not found! Skipping hyperparameter logging...")
        return

    hparams: dict[str, Any] = {}
    hparams["model"] = cfg.get("model").to_container() if cfg.get("model") else {}
    if trainer.state is not None:
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(trainer.state.params))
        n_buffers = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(trainer.state.extra_vars)
        )
        hparams["model/params/total"] = n_params + n_buffers
        hparams["model/params/trainable"] = n_params
        hparams["model/params/non_trainable"] = n_buffers
    hparams["data"] = cfg.get("data").to_container() if cfg.get("data") else {}
    hparams["trainer"] = cfg.get("trainer").to_container() if cfg.get("trainer") else {}
    for key in ("extras", "task_name", "tags", "ckpt_path", "seed"):
        if key in cfg:
            hparams[key] = cfg.get(key)

    for logger in trainer.loggers:
        logger.log_hyperparams(hparams)


__all__ = ["log_hyperparameters"]
