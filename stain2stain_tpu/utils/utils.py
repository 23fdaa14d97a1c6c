"""Task orchestration helpers: extras, task_wrapper, get_metric_value.

Parity for /root/reference/src/utils/utils.py:12-119: pre-run housekeeping
(warnings filter, tag enforcement, config tree print), an exception-safe task
decorator that always closes loggers so multiruns keep going, and metric
retrieval for hyperparameter sweeps.
"""

from __future__ import annotations

import warnings
from importlib.util import find_spec
from typing import Any, Callable, Optional

from stain2stain_tpu.config import Config

from .pylogger import RankedLogger
from .rich_utils import enforce_tags, print_config_tree

log = RankedLogger(__name__, rank_zero_only=True)


def extras(cfg: Config) -> None:
    """Apply optional pre-task utilities controlled by ``cfg.extras``."""
    if not cfg.get("extras"):
        log.warning("Extras config not found! <cfg.extras=null>")
        return
    extras_cfg = cfg.get("extras")
    if extras_cfg.get("ignore_warnings"):
        log.info("Disabling python warnings! <extras.ignore_warnings=True>")
        warnings.filterwarnings("ignore")
    if extras_cfg.get("enforce_tags"):
        log.info("Enforcing tags! <extras.enforce_tags=True>")
        enforce_tags(cfg, save_to_file=True)
    if extras_cfg.get("print_config"):
        log.info("Printing config tree with Rich! <extras.print_config=True>")
        print_config_tree(cfg, resolve=False, save_to_file=True)


def task_wrapper(task_func: Callable) -> Callable:
    """Wrap a task: log exceptions, always finalize loggers, mark output dir."""

    def wrap(cfg: Config):
        try:
            metric_dict, object_dict = task_func(cfg=cfg)
        except Exception as ex:
            log.exception("")
            raise ex
        finally:
            out_dir = cfg.get("paths", Config({})).get("output_dir") if cfg.get("paths") else None
            if out_dir:
                log.info(f"Output dir: {out_dir}")
            if find_spec("wandb"):
                import wandb

                if wandb.run:
                    log.info("Closing wandb!")
                    wandb.finish()
        return metric_dict, object_dict

    return wrap


def get_metric_value(metric_dict: dict, metric_name: Optional[str]) -> Optional[float]:
    """Retrieve the optimized metric for sweepers (ref utils.py:98-119)."""
    if not metric_name:
        log.info("Metric name is None! Skipping metric value retrieval...")
        return None
    if metric_name not in metric_dict:
        raise ValueError(
            f"Metric value not found! <metric_name={metric_name}>\n"
            "Make sure metric name logged by the task module is correct!\n"
            "Make sure `optimized_metric` name in `hparams_search` config is correct!"
        )
    metric_value = float(metric_dict[metric_name])
    log.info(f"Retrieved metric value! <{metric_name}={metric_value}>")
    return metric_value


__all__ = ["extras", "task_wrapper", "get_metric_value"]
