"""Utility API (mirrors /root/reference/src/utils/__init__.py:1-5)."""

from .instantiators import instantiate_callbacks, instantiate_loggers
from .logging_utils import log_hyperparameters
from .pylogger import RankedLogger
from .rich_utils import enforce_tags, print_config_tree
from .seed import current_seed, seed_everything
from .utils import extras, get_metric_value, task_wrapper

__all__ = [
    "RankedLogger",
    "current_seed",
    "enforce_tags",
    "extras",
    "get_metric_value",
    "instantiate_callbacks",
    "instantiate_loggers",
    "log_hyperparameters",
    "print_config_tree",
    "seed_everything",
    "task_wrapper",
]
