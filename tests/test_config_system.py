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


def test_root_without_self_merges_body(tmp_path):
    """Hydra's implicit _self_: a root config with a defaults list but no
    _self_ entry still merges its own body (review r3 — it was dropped)."""
    (tmp_path / "g").mkdir()
    (tmp_path / "g" / "a.yaml").write_text("x: 1\n")
    (tmp_path / "root.yaml").write_text("defaults:\n  - g: a\ntop: 42\n")
    cfg = compose(tmp_path, "root")
    assert cfg["top"] == 42 and cfg["g"]["x"] == 1


def test_instantiate_mandatory_supplied_by_kwargs():
    from stain2stain_tpu.config import instantiate
    from stain2stain_tpu.config.node import Config

    out = instantiate(Config({"_target_": "builtins.dict", "a": "???"}), a=5)
    assert out == {"a": 5}


def test_instantiate_recurses_into_positional_args():
    from stain2stain_tpu.config import instantiate
    from stain2stain_tpu.config.node import Config

    cfg = Config({"_target_": "builtins.list",
                  "_args_": [[{"_target_": "builtins.int", "_args_": ["7"]}]]})
    assert instantiate(cfg) == [7]


def test_config_pop_dotted_and_int_contains():
    from stain2stain_tpu.config.node import Config

    c = Config({"a": {"b": 1}, 0: "x"})
    assert c.pop("a.b", 99) == 1
    assert "b" not in c["a"]
    assert 0 in c  # int keys (class-id maps) must not TypeError


def test_hydra_runtime_interpolation_reference_syntax():
    from stain2stain_tpu.config.node import Config

    c = Config({"runtime": {"output_dir": "/out"},
                "a": "${hydra:runtime.output_dir}", "b": "${hydra:output_dir}"})
    assert c["a"] == "/out" and c["b"] == "/out"


def test_dotted_override_updates_list_element():
    from stain2stain_tpu.config.node import Config

    c = Config({"a": {"layers": [1, 2, 3]}})
    c["a.layers.0"] = 99
    assert c["a"]["layers"] == [99, 2, 3]
    with pytest.raises(KeyError):
        c["a.layers.0.x"] = 1  # scalar element is not a mapping


def test_overlay_override_of_absent_group_errors(tmp_path):
    (tmp_path / "experiment").mkdir()
    (tmp_path / "experiment" / "e.yaml").write_text(
        "# @package _global_\ndefaults:\n  - override /logger: csv\n"
    )
    (tmp_path / "root.yaml").write_text("defaults:\n  - _self_\n  - experiment: null\n")
    with pytest.raises(ComposeError, match="not in the root defaults list"):
        compose(tmp_path, "root", ["experiment=e"])


def test_subtree_assignment_rebinds_interpolations():
    from stain2stain_tpu.config.node import Config

    src = Config({"paths": {"root": "/SRC"}, "model": {"net": {"dir": "${paths.root}/net"}}})
    dst = Config({"paths": {"root": "/DST"}})
    dst["model"] = src.get_raw("model")
    assert dst["model"]["net"]["dir"] == "/DST/net"
    # and the source tree is untouched
    assert src["model"]["net"]["dir"] == "/SRC/net"
