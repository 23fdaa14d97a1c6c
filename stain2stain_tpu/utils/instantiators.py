"""Callback/logger list instantiation from config nodes.

Parity for /root/reference/src/utils/instantiators.py:28-56: walk a config
group, instantiate every child with a ``_target_``.
"""

from __future__ import annotations

from stain2stain_tpu.config import Config, instantiate

from .pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


def instantiate_callbacks(callbacks_cfg) -> list:
    callbacks: list = []
    if not callbacks_cfg:
        log.warning("No callback configs found! Skipping..")
        return callbacks
    if not isinstance(callbacks_cfg, Config):
        raise TypeError("Callbacks config must be a Config (mapping)!")
    for key in callbacks_cfg:
        cb_conf = callbacks_cfg.get(key)
        if isinstance(cb_conf, Config) and "_target_" in cb_conf:
            log.info(f"Instantiating callback <{cb_conf['_target_']}>")
            callbacks.append(instantiate(cb_conf))
    return callbacks


def instantiate_loggers(logger_cfg) -> list:
    loggers: list = []
    if not logger_cfg:
        log.warning("No logger configs found! Skipping...")
        return loggers
    if not isinstance(logger_cfg, Config):
        raise TypeError("Logger config must be a Config (mapping)!")
    for key in logger_cfg:
        lg_conf = logger_cfg.get(key)
        if isinstance(lg_conf, Config) and "_target_" in lg_conf:
            log.info(f"Instantiating logger <{lg_conf['_target_']}>")
            loggers.append(instantiate(lg_conf))
    return loggers


__all__ = ["instantiate_callbacks", "instantiate_loggers"]
