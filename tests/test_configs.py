"""Config-tree composition + instantiation tests.

Mirror of the reference's config validation (tests/test_configs.py:6-37) plus
per-experiment composition coverage (its test_sweeps.py experiment glob):
every experiment overlay must compose and its data/model/trainer nodes must
instantiate.
"""

from pathlib import Path

import pytest

from stain2stain_tpu.config import compose, instantiate

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"

EXPERIMENTS = sorted(
    str(p.relative_to(CONFIG_DIR / "experiment")).removesuffix(".yaml")
    for p in (CONFIG_DIR / "experiment").rglob("*.yaml")
)


def _instantiate_main_nodes(cfg, tmp="/tmp/s2s_cfg_test"):
    # runtime.output_dir is injected by the entrypoint (config_main) at run
    # start; tests compose without running, so inject it like the reference's
    # conftest pins paths.output_dir to tmp_path.
    cfg["runtime"] = {"output_dir": str(tmp), "cwd": str(tmp)}
    datamodule = instantiate(cfg["data"])
    model = instantiate(cfg["model"])
    trainer = instantiate(cfg["trainer"], callbacks=[], logger=None)
    return datamodule, model, trainer


def test_train_config_composes_and_instantiates():
    cfg = compose(CONFIG_DIR, "train.yaml", [])
    assert cfg["task_name"] == "train"
    dm, model, trainer = _instantiate_main_nodes(cfg)
    assert trainer.max_epochs == 10
    assert model.net is not None


def test_eval_config_composes():
    cfg = compose(CONFIG_DIR, "eval.yaml", ["ckpt_path=/tmp/x"])
    assert cfg["task_name"] == "eval"
    _instantiate_main_nodes(cfg)


@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_every_experiment_composes_and_instantiates(experiment):
    cfg = compose(CONFIG_DIR, "train.yaml", [f"experiment={experiment}"])
    dm, model, trainer = _instantiate_main_nodes(cfg)
    assert model is not None and dm is not None


def test_experiment_overlay_pins_values():
    cfg = compose(CONFIG_DIR, "train.yaml", ["experiment=multitask_he2ihc_amyloid"])
    assert cfg["seed"] == 1987
    assert cfg["data"]["batch_size"] == 32  # ${batch_size} interpolation
    assert cfg["trainer"]["devices"] == 4
    assert cfg["model"]["_target_"].endswith("MultitaskFlowMatchingModule")


def test_cli_override_wins_over_experiment():
    cfg = compose(
        CONFIG_DIR, "train.yaml", ["experiment=multitask_he2ihc_amyloid", "batch_size=4"]
    )
    assert cfg["data"]["batch_size"] == 4


def test_scientific_notation_floats():
    cfg = compose(CONFIG_DIR, "train.yaml", [])
    lr = cfg["model"]["optimizer"]["lr"]
    assert isinstance(lr, float) and lr == pytest.approx(1e-4)


def test_debug_overlays_compose():
    for debug in ("default", "fdr", "limit", "overfit", "profiler"):
        cfg = compose(CONFIG_DIR, "train.yaml", [f"debug={debug}"])
        assert cfg["task_name"] == "debug"
    cfg = compose(CONFIG_DIR, "train.yaml", ["debug=fdr"])
    assert cfg["trainer"]["fast_dev_run"] is True


def test_missing_data_alias_fixed():
    # SURVEY.md §2.7 quirk 1: the reference's he2ihc_he_amyloid experiment
    # points at a nonexistent data config; our alias makes it compose.
    cfg = compose(CONFIG_DIR, "train.yaml", ["experiment=he2ihc_he_amyloid"])
    assert cfg["data"]["_target_"].endswith("PairedDataModule")


def test_callbacks_default_monitors_logged_metric():
    # quirk 2: early stopping must monitor val/loss (val/f1 is never logged)
    cfg = compose(CONFIG_DIR, "train.yaml", [])
    assert cfg["callbacks"]["early_stopping"]["monitor"] == "val/loss"
    # quirk 3: checkpoint filename carries metric interpolation
    assert "{val/loss" in cfg["callbacks"]["model_checkpoint"]["filename"]


def test_hparams_search_attaches_sweeper():
    cfg = compose(
        CONFIG_DIR, "train.yaml", ["hparams_search=mnist_optuna", "experiment=example"]
    )
    assert cfg["optimized_metric"] == "val/acc_best"
    sweeper = instantiate(cfg["sweeper"])
    assert sweeper.n_trials == 20 and sweeper.direction == "maximize"


def test_infer_config_composes():
    cfg = compose(CONFIG_DIR, "infer.yaml", ["ckpt_path=/tmp/ck", "num_steps=4"])
    assert cfg["num_steps"] == 4
    assert cfg["task_name"] == "infer"
