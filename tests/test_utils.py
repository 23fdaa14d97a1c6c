"""Utility-layer tests: task_wrapper, RankedLogger, rich utils, seed."""

import logging

import pytest

from stain2stain_tpu.config import Config
from stain2stain_tpu.utils import get_metric_value, task_wrapper
from stain2stain_tpu.utils.pylogger import RankedLogger
from stain2stain_tpu.utils.rich_utils import print_config_tree
from stain2stain_tpu.utils.seed import current_seed, seed_everything


def test_task_wrapper_passes_through_and_reraises():
    @task_wrapper
    def ok(cfg):
        return {"m": 1.0}, {"obj": cfg}

    metrics, objects = ok(cfg=Config({"paths": {"output_dir": "/tmp"}}))
    assert metrics == {"m": 1.0}

    @task_wrapper
    def boom(cfg):
        raise RuntimeError("task failed")

    with pytest.raises(RuntimeError, match="task failed"):
        boom(cfg=Config({}))


def test_get_metric_value():
    assert get_metric_value({"val/loss": 0.5}, "val/loss") == 0.5
    assert get_metric_value({"val/loss": 0.5}, None) is None
    with pytest.raises(ValueError, match="Metric value not found"):
        get_metric_value({"val/loss": 0.5}, "val/acc")


def test_ranked_logger_prefixes_rank(caplog):
    log = RankedLogger("test_ranked", rank_zero_only=True)
    with caplog.at_level(logging.INFO, logger="test_ranked"):
        log.info("hello")
    assert any("[rank: 0]" in r.message and "hello" in r.message for r in caplog.records)


def test_print_config_tree_saves_file(tmp_path):
    cfg = Config(
        {
            "model": {"net": {"num_channels": 8}},
            "data": {"batch_size": 4},
            "extras": {},
            "paths": {"output_dir": str(tmp_path)},
            "runtime": {"output_dir": str(tmp_path)},
        }
    )
    print_config_tree(cfg, resolve=False, save_to_file=True)
    saved = tmp_path / "config_tree.log"
    assert saved.exists() and "num_channels" in saved.read_text()


def test_seed_everything_sets_current_seed():
    seed_everything(1234)
    assert current_seed() == 1234
    import random

    a = random.random()
    seed_everything(1234)
    assert random.random() == a  # python RNG reseeded deterministically
