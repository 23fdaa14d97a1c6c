"""First-party Hydra/OmegaConf-equivalent config system (TPU framework).

Public surface mirrors the parts of hydra/omegaconf the reference stack uses:
``compose`` (+ defaults lists / experiment overlays / CLI overrides),
``instantiate`` (``_target_`` trees), ``Config`` (DictConfig analog), and
``config_main`` (``@hydra.main`` analog with multirun).
"""

from .compose import ComposeError, compose, parse_overrides
from .instantiate import InstantiationError, get_class, get_method, get_object, instantiate
from .main import config_main, runtime_config
from .node import (
    MISSING,
    Config,
    InterpolationError,
    MissingMandatoryValue,
    register_resolver,
    select,
)

__all__ = [
    "Config",
    "ComposeError",
    "InstantiationError",
    "InterpolationError",
    "MISSING",
    "MissingMandatoryValue",
    "compose",
    "config_main",
    "get_class",
    "get_method",
    "get_object",
    "instantiate",
    "parse_overrides",
    "register_resolver",
    "runtime_config",
    "select",
]
