"""Train→eval round trip (mirror of reference tests/test_eval.py:13-39):
train briefly, then eval the saved checkpoint through src/eval.py and assert
the test metric matches the train-time test metric exactly (checkpoint
fidelity + deterministic eval keys)."""

import pytest

# slow tier: e2e train->eval round trips (run with `pytest -m slow`)
pytestmark = pytest.mark.slow

from pathlib import Path


from src.eval import evaluate
from src.train import train
from stain2stain_tpu.config import compose

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def test_train_then_eval_metric_parity(tmp_path):
    overrides = [
        "experiment=smoke_synthetic",
        f"data.data_dir={tmp_path}/synthetic",
        "trainer.max_epochs=1",
        "test=true",
        "logger=csv",
    ]
    cfg = compose(CONFIG_DIR, "train.yaml", overrides)
    out = tmp_path / "out"
    out.mkdir()
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp_path)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    train_metrics, objects = train(cfg)
    last = objects["trainer"].checkpoint_callback.last_model_path

    eval_cfg = compose(
        CONFIG_DIR,
        "eval.yaml",
        [
            "data=synthetic",
            f"data.data_dir={tmp_path}/synthetic",
            f"ckpt_path={last}",
            "model.net.dim=[3,32,32]",
            "model.net.num_channels=8",
            "model.net.num_res_blocks=1",
            "model.net.channel_mult=[1,2]",
            "model.net.attention_resolutions=''",
            "model.net.num_heads=1",
            "model.net.dropout=0.0",
        ],
    )
    out2 = tmp_path / "out_eval"
    out2.mkdir()
    eval_cfg["runtime"] = {"output_dir": str(out2), "cwd": str(tmp_path)}
    eval_cfg["extras"]["print_config"] = False
    eval_cfg["extras"]["enforce_tags"] = False
    eval_metrics, _ = evaluate(eval_cfg)

    # exact parity: deterministic per-(seed, batch) eval keys
    assert eval_metrics["test/loss"] == pytest.approx(train_metrics["test/loss"], abs=1e-6)


def test_ckpt_path_last_restores_saved_weights(tmp_path):
    """trainer.test(ckpt_path="last") must load the last checkpoint, not
    silently evaluate whatever is in memory (Lightning semantics; round-1
    treated the literal "last" as skip-restore)."""
    import jax
    import jax.numpy as jnp

    cfg = compose(
        CONFIG_DIR,
        "train.yaml",
        [
            "experiment=smoke_synthetic",
            f"data.data_dir={tmp_path}/synthetic",
            "trainer.max_epochs=1",
            "test=false",
            "logger=csv",
        ],
    )
    out = tmp_path / "out"
    out.mkdir()
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp_path)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    _, objects = train(cfg)
    trainer = objects["trainer"]
    model = objects["model"]
    datamodule = objects["datamodule"]
    baseline = trainer.test(model, datamodule, ckpt_path="last")

    # corrupt the in-memory weights; "last" must restore the saved ones
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, trainer.state.params)
    )
    corrupted = trainer._run_eval(datamodule.test_dataloader(), prefix="test")
    assert corrupted["test/loss"] != pytest.approx(baseline["test/loss"])

    restored = trainer.test(model, datamodule, ckpt_path="last")
    assert restored["test/loss"] == pytest.approx(baseline["test/loss"], abs=1e-6)

    # no checkpoint callback knowledge -> loud error, not silent wrong numbers
    from stain2stain_tpu.training import Trainer

    fresh = Trainer(default_root_dir=str(tmp_path / "fresh"), logger=None)
    with pytest.raises(ValueError, match="ModelCheckpoint"):
        fresh.test(model, datamodule, ckpt_path="last")
