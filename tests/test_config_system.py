"""Unit tests for the first-party Hydra-equivalent config system.

Covers the composition features the public config surface depends on
(reference behaviors: /root/reference/configs/train.yaml:6-30 defaults list,
experiment overlays with `override /group`, callbacks group-internal defaults,
interpolation incl. ${oc.env:...}).
"""

import os
import textwrap

import pytest

from stain2stain_tpu.config import (
    MISSING,
    ComposeError,
    Config,
    MissingMandatoryValue,
    compose,
    instantiate,
    select,
)


# ---------------------------------------------------------------- Config node
def test_dot_access_and_nesting():
    cfg = Config({"a": {"b": {"c": 3}}, "lst": [1, {"x": 2}]})
    assert cfg.a.b.c == 3
    assert cfg["a.b.c"] == 3
    assert cfg.lst[1].x == 2


def test_interpolation_absolute_and_typed():
    cfg = Config({"batch_size": 32, "data": {"batch_size": "${batch_size}"}})
    assert cfg.data.batch_size == 32  # full-string interp preserves int type


def test_interpolation_embedded_string():
    cfg = Config({"name": "run", "out": "logs/${name}/x"})
    assert cfg.out == "logs/run/x"


def test_env_resolver(monkeypatch):
    monkeypatch.setenv("S2S_TEST_VAR", "/tmp/rootx")
    cfg = Config({"root": "${oc.env:S2S_TEST_VAR}", "with_default": "${oc.env:S2S_NOPE,fallback}"})
    assert cfg.root == "/tmp/rootx"
    assert cfg.with_default == "fallback"


def test_missing_mandatory_value():
    cfg = Config({"ckpt_path": MISSING})
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.ckpt_path
    assert select(cfg, "ckpt_path", default=None) is None


def test_merge_deep_and_replace():
    a = Config({"m": {"x": 1, "y": 2}, "k": [1, 2]})
    a.merge({"m": {"y": 3, "z": 4}, "k": [9]})
    assert a.m.x == 1 and a.m.y == 3 and a.m.z == 4
    assert a.k == [9]  # lists replace


def test_setitem_dotted_creates_path():
    cfg = Config({})
    cfg["a.b.c"] = 7
    assert cfg.a.b.c == 7


# ------------------------------------------------------------------- compose
@pytest.fixture()
def tree(tmp_path):
    """A miniature config tree exercising every composition feature used."""

    def w(rel, content):
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(content))

    w(
        "train.yaml",
        """
        # @package _global_
        defaults:
          - _self_
          - data: mnist
          - model: mnist
          - callbacks: default
          - trainer: default
          - paths: default
          - experiment: null
          - optional local: default
          - debug: null
        task_name: train
        tags: ["dev"]
        train: true
        seed: null
        """,
    )
    w("data/mnist.yaml", "_target_: tests.test_config_system.FakeData\nbatch_size: 64\n")
    w("data/paired.yaml", "_target_: tests.test_config_system.FakeData\nbatch_size: 2\nimage_size: 256\n")
    w("model/mnist.yaml", "_target_: tests.test_config_system.FakeModel\nlr: 0.001\n")
    w(
        "callbacks/default.yaml",
        """
        defaults:
          - ckpt
          - early_stop
          - _self_
        ckpt:
          monitor: val/loss
        """,
    )
    w("callbacks/ckpt.yaml", "ckpt:\n  monitor: val/acc\n  save_top_k: 1\n")
    w("callbacks/early_stop.yaml", "early_stop:\n  patience: 3\n")
    w("trainer/default.yaml", "max_epochs: 10\naccelerator: cpu\ndevices: 1\n")
    w(
        "trainer/ddp.yaml",
        """
        defaults:
          - default
        strategy: ddp
        devices: 4
        """,
    )
    w(
        "paths/default.yaml",
        """
        root_dir: ${oc.env:PROJECT_ROOT}
        log_dir: ${paths.root_dir}/logs/
        """,
    )
    w(
        "experiment/exp1.yaml",
        """
        # @package _global_
        defaults:
          - override /data: paired
          - override /trainer: ddp
        batch_size: 32
        data:
          batch_size: ${batch_size}
        trainer:
          max_epochs: 100
        tags: ["exp1"]
        """,
    )
    w(
        "debug/default.yaml",
        """
        # @package _global_
        task_name: debug
        callbacks: null
        trainer:
          max_epochs: 1
        """,
    )
    w(
        "debug/fdr.yaml",
        """
        # @package _global_
        defaults:
          - default
        trainer:
          fast_dev_run: true
        """,
    )
    return tmp_path


class FakeData:
    def __init__(self, batch_size=1, image_size=None):
        self.batch_size = batch_size
        self.image_size = image_size


class FakeModel:
    def __init__(self, lr):
        self.lr = lr


def test_compose_basic(tree):
    cfg = compose(tree, "train", [])
    assert cfg.task_name == "train"
    assert cfg.data.batch_size == 64
    assert cfg.callbacks.ckpt.monitor == "val/loss"  # _self_ overrides sibling
    assert cfg.callbacks.ckpt.save_top_k == 1
    assert cfg.callbacks.early_stop.patience == 3
    assert cfg.trainer.max_epochs == 10
    assert "local" not in cfg  # optional group missing -> skipped


def test_compose_group_choice_override(tree):
    cfg = compose(tree, "train", ["data=paired", "trainer=ddp"])
    assert cfg.data.image_size == 256
    assert cfg.trainer.strategy == "ddp"
    assert cfg.trainer.max_epochs == 10  # inherited from trainer/default
    assert cfg.trainer.devices == 4


def test_compose_value_overrides(tree):
    cfg = compose(tree, "train", ["model.lr=0.1", "seed=42", "tags=[a,b]"])
    assert cfg.model.lr == 0.1
    assert cfg.seed == 42
    assert cfg.tags == ["a", "b"]


def test_compose_experiment_overlay(tree):
    cfg = compose(tree, "train", ["experiment=exp1"])
    assert cfg.data.image_size == 256  # override /data: paired
    assert cfg.data.batch_size == 32  # ${batch_size} from overlay body
    assert cfg.trainer.strategy == "ddp"  # override /trainer: ddp
    assert cfg.trainer.max_epochs == 100  # overlay body beats group body
    assert cfg.tags == ["exp1"]


def test_compose_cli_choice_beats_experiment(tree):
    cfg = compose(tree, "train", ["experiment=exp1", "trainer=default"])
    assert "strategy" not in cfg.trainer
    assert cfg.trainer.max_epochs == 100  # overlay body still merges


def test_compose_debug_inheritance(tree):
    cfg = compose(tree, "train", ["debug=fdr"])
    assert cfg.task_name == "debug"
    assert cfg.get("callbacks") is None
    assert cfg.trainer.max_epochs == 1
    assert cfg.trainer.fast_dev_run is True


def test_compose_append_and_delete(tree):
    cfg = compose(tree, "train", ["+extra.flag=7", "~model.lr"])
    assert cfg.extra.flag == 7
    assert "lr" not in cfg.model


def test_compose_missing_group_errors(tree):
    with pytest.raises(ComposeError):
        compose(tree, "train", ["data=nope"])


# --------------------------------------------------------------- instantiate
def test_instantiate_recursive_and_partial(tree):
    cfg = compose(tree, "train", [])
    data = instantiate(cfg.data)
    assert isinstance(data, FakeData) and data.batch_size == 64
    model = instantiate(cfg.model, lr=0.5)
    assert model.lr == 0.5

    part = instantiate(Config({"_target_": "tests.test_config_system.FakeModel", "_partial_": True}))
    assert part(lr=1).lr == 1


def test_instantiate_nested_targets():
    cfg = Config(
        {
            "_target_": "tests.test_config_system.FakeData",
            "batch_size": {"_target_": "builtins.int", "_args_": ["8"]},
        }
    )
    obj = instantiate(cfg)
    assert obj.batch_size == 8


def test_instantiate_none_passthrough():
    assert instantiate(None) is None
