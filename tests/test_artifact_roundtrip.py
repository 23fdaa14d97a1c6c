"""Model-artifact round trip without a tracking service.

The reference trains with W&B ``log_model: all`` and later resolves
``wandb-artifact://`` checkpoint references (/root/reference/src/train.py:74-99,
configs/logger/wandb.yaml:12). The wandb client is absent in this image, so
the offline path must carry those semantics end to end: WandbLogger.log_model
mirrors the checkpoint into the WANDB_CACHE_DIR layout that
src/train.py::_resolve_ckpt_path reads back.
"""

import json
from pathlib import Path

import pytest

from src.train import _resolve_ckpt_path
from stain2stain_tpu.training.loggers import WandbLogger


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = tmp_path / "ckpt" / "last"
    d.mkdir(parents=True)
    (d / "state.json").write_text(json.dumps({"step": 7}))
    (d / "weights.bin").write_bytes(b"\x00" * 64)
    return d


def test_log_model_then_resolve_artifact(tmp_path, monkeypatch, recwarn):
    monkeypatch.setenv("WANDB_CACHE_DIR", str(tmp_path / "wandb_cache"))
    logger = WandbLogger(save_dir=str(tmp_path / "logs"), project="stain2stain", name="runA")
    d = tmp_path / "ckpt" / "best"
    d.mkdir(parents=True)
    (d / "state.json").write_text(json.dumps({"step": 3}))
    logger.log_model(str(d), {"epoch": 3, "val/loss": 0.5})
    ref = logger.artifact_ref()
    assert ref == "stain2stain/model-runA:latest"

    resolved = _resolve_ckpt_path(f"wandb-artifact://{ref}")
    assert resolved is not None and Path(resolved).exists()
    assert json.loads((Path(resolved) / "state.json").read_text())["step"] == 3

    # re-logging overwrites the alias (log_model: all → latest tracks newest)
    (d / "state.json").write_text(json.dumps({"step": 9}))
    logger.log_model(str(d))
    resolved2 = _resolve_ckpt_path(f"wandb-artifact://{ref}")
    assert json.loads((Path(resolved2) / "state.json").read_text())["step"] == 9

    # the JSONL record carries the ref for auditability
    jsonl = (Path(tmp_path / "logs") / "wandb" / "metrics.jsonl").read_text()
    assert "model_artifact" in jsonl and ref in jsonl


def test_resolve_missing_artifact_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("WANDB_CACHE_DIR", str(tmp_path / "empty_cache"))
    with pytest.raises(FileNotFoundError, match="wandb artifact"):
        _resolve_ckpt_path("wandb-artifact://stain2stain/model-missing:latest")


def test_plain_paths_pass_through(ckpt_dir):
    assert _resolve_ckpt_path(str(ckpt_dir)) == str(ckpt_dir)
    assert _resolve_ckpt_path(None) is None
