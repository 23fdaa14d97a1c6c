"""Experiment loggers: CSV, TensorBoard, W&B and parity stubs.

The reference selects among seven Lightning logger backends by config
(/root/reference/configs/logger/*.yaml). The same config surface is kept;
backends whose client library is absent in the image (wandb, mlflow, neptune,
comet, aim) degrade to a warn-once no-op that still records metrics to a local
JSONL file, so runs never fail on a missing tracking service.
"""

from __future__ import annotations

import csv
import json
import warnings
from pathlib import Path
from typing import Any, Optional

import numpy as np


class Logger:
    """Logger interface: hyperparams, scalar metrics, image panels."""

    name: str = "logger"

    def log_hyperparams(self, params: dict) -> None:
        pass

    def log_metrics(self, metrics: dict, step: int) -> None:
        pass

    def log_images(self, tag: str, images: dict, step: int) -> None:
        """images: mapping name → (N, H, W, C) float array in [0, 1]."""

    def log_model(self, ckpt_path: str, metadata: Optional[dict] = None) -> None:
        """Register a checkpoint as a model artifact (W&B ``log_model`` parity,
        ref configs/logger/wandb.yaml:12). Default: record the path."""

    def finalize(self, status: str = "success") -> None:
        pass


class CSVLogger(Logger):
    """metrics.csv + hparams.json under save_dir/name/version_N
    (lightning CSVLogger layout, cfg configs/logger/csv.yaml)."""

    name = "csv"

    def __init__(self, save_dir: str = "logs", name: str = "csv", prefix: str = "", version: Optional[int] = None):
        base = Path(save_dir) / name
        if version is None:
            existing = [int(p.name.split("_")[1]) for p in base.glob("version_*") if p.name.split("_")[-1].isdigit()]
            version = max(existing, default=-1) + 1
        self.log_dir = base / f"version_{version}"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self._rows: list[dict] = []
        self._fields: set[str] = {"step"}

    def log_hyperparams(self, params: dict) -> None:
        (self.log_dir / "hparams.json").write_text(json.dumps(params, indent=2, default=str))

    # rewrite cadence: a run that crashes/preempts mid-fit must not lose its
    # whole metrics history (the columns evolve — train/val/test keys appear
    # over time — so the file is rewritten, Lightning-CSVLogger style, every
    # N rows rather than appended)
    flush_every = 50

    def log_metrics(self, metrics: dict, step: int) -> None:
        row = {"step": step}
        for k, v in metrics.items():
            key = f"{self.prefix}{k}" if self.prefix else k
            row[key] = float(v)
            self._fields.add(key)
        self._rows.append(row)
        if len(self._rows) % self.flush_every == 0:
            self._write()

    def _write(self) -> None:
        fields = sorted(self._fields)
        with open(self.log_dir / "metrics.csv", "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fields)
            writer.writeheader()
            writer.writerows(self._rows)

    def finalize(self, status: str = "success") -> None:
        if not self._rows:
            return
        self._write()


class TensorBoardLogger(Logger):
    name = "tensorboard"

    def __init__(self, save_dir: str = "logs", name: str = "tensorboard", default_hp_metric: bool = True, prefix: str = ""):
        from tensorboardX import SummaryWriter

        self.log_dir = Path(save_dir) / name
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.writer = SummaryWriter(str(self.log_dir))
        self.prefix = prefix

    def log_hyperparams(self, params: dict) -> None:
        self.writer.add_text("hparams", json.dumps(params, indent=2, default=str))

    def log_metrics(self, metrics: dict, step: int) -> None:
        for k, v in metrics.items():
            self.writer.add_scalar(f"{self.prefix}{k}", float(v), step)

    def log_images(self, tag: str, images: dict, step: int) -> None:
        for name, imgs in images.items():
            arr = np.asarray(imgs)
            for i, img in enumerate(arr[:8]):
                self.writer.add_image(f"{tag}/{name}_{i}", img, step, dataformats="HWC")

    def finalize(self, status: str = "success") -> None:
        self.writer.close()


class _FallbackFileLogger(Logger):
    """Local JSONL sink used when a tracking client library is unavailable."""

    def __init__(self, save_dir: str, name: str):
        self.log_dir = Path(save_dir) / name
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._file = open(self.log_dir / "metrics.jsonl", "a")
        self.name = name

    def log_hyperparams(self, params: dict) -> None:
        self._file.write(json.dumps({"hparams": params}, default=str) + "\n")

    def log_metrics(self, metrics: dict, step: int) -> None:
        self._file.write(json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}}) + "\n")

    def log_model(self, ckpt_path: str, metadata: Optional[dict] = None) -> None:
        self._file.write(
            json.dumps({"model_artifact": str(ckpt_path), **(metadata or {})}, default=str) + "\n"
        )
        self._file.flush()

    def log_images(self, tag: str, images: dict, step: int) -> None:
        out = self.log_dir / "images" / f"step_{step}"
        out.mkdir(parents=True, exist_ok=True)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for name, imgs in images.items():
                arr = np.asarray(imgs)
                for i, img in enumerate(arr[:8]):
                    plt.imsave(out / f"{tag}_{name}_{i}.png", np.clip(img, 0, 1))
        except Exception:  # image dump is best-effort
            pass

    def finalize(self, status: str = "success") -> None:
        self._file.close()


def _service_logger(service: str):
    """Build a logger class for an external tracking service with fallback."""

    class ServiceLogger(_FallbackFileLogger):
        def __init__(self, save_dir: str = "logs", project: str = "stain2stain", offline: bool = False, **kwargs: Any):
            self.project = project
            self.kwargs = kwargs
            self._client = None
            try:
                __import__(service)
                available = True
            except ImportError:
                available = False
            if not available:
                warnings.warn(
                    f"{service} is not installed; {service} logging degrades to a local JSONL file.",
                    stacklevel=2,
                )
            super().__init__(save_dir=str(save_dir), name=service)
            if available and service == "wandb":
                import wandb

                self._client = wandb.init(
                    project=project,
                    dir=str(save_dir),
                    mode="offline" if offline else None,
                    config=None,
                    **{k: v for k, v in kwargs.items() if k in ("name", "group", "tags", "id", "job_type", "entity")},
                )

        def log_metrics(self, metrics: dict, step: int) -> None:
            super().log_metrics(metrics, step)
            if self._client is not None:
                self._client.log({k: float(v) for k, v in metrics.items()}, step=step)

        def artifact_ref(self, alias: str = "latest") -> str:
            """The ``wandb-artifact://`` reference this run's model resolves as
            (reference semantics: ``log_model: all`` registers ``model-<run>``
            with a ``latest`` alias, configs/logger/wandb.yaml:12)."""
            run_name = self.kwargs.get("name") or getattr(self._client, "id", None) or "run"
            return f"{self.project}/model-{run_name}:{alias}"

        def log_model(self, ckpt_path: str, metadata: Optional[dict] = None) -> None:
            """Upload a checkpoint as a model artifact; offline, mirror it into
            the WANDB_CACHE_DIR layout that ``wandb-artifact://`` resolution
            reads (src/train.py _resolve_ckpt_path) so the round trip —
            train with log_model, later train/eval from
            ``ckpt_path=wandb-artifact://<ref>`` — works without a service."""
            super().log_model(ckpt_path, {**(metadata or {}), "artifact_ref": self.artifact_ref()})
            if self._client is not None and service == "wandb":
                import wandb

                name = self.artifact_ref().split("/")[-1].split(":")[0]
                artifact = wandb.Artifact(name, type="model", metadata=metadata or {})
                p = Path(ckpt_path)
                if p.is_dir():
                    artifact.add_dir(str(p))
                else:
                    artifact.add_file(str(p))
                self._client.log_artifact(artifact, aliases=["latest"])
                return
            import os
            import shutil

            ref = self.artifact_ref()
            cache = Path(os.environ.get("WANDB_CACHE_DIR", "wandb_artifacts")) / ref.replace(
                "/", "_"
            ).replace(":", "_")
            if cache.exists():
                shutil.rmtree(cache)
            p = Path(ckpt_path)
            if p.is_dir():
                shutil.copytree(p, cache)
            else:
                cache.mkdir(parents=True, exist_ok=True)
                shutil.copy2(p, cache / p.name)

        def finalize(self, status: str = "success") -> None:
            super().finalize(status)
            if self._client is not None:
                self._client.finish()

    ServiceLogger.__name__ = f"{service.capitalize()}Logger"
    return ServiceLogger


WandbLogger = _service_logger("wandb")
MLFlowLogger = _service_logger("mlflow")
NeptuneLogger = _service_logger("neptune")
CometLogger = _service_logger("comet_ml")
AimLogger = _service_logger("aim")


__all__ = [
    "Logger",
    "CSVLogger",
    "TensorBoardLogger",
    "WandbLogger",
    "MLFlowLogger",
    "NeptuneLogger",
    "CometLogger",
    "AimLogger",
]
