"""Trainer callbacks: checkpointing, early stopping, summaries, progress.

Parity surface for the reference's Lightning callbacks
(/root/reference/configs/callbacks/*.yaml): ModelCheckpoint (monitor/top-k/
save_last/every_n_epochs/filename patterns), EarlyStopping (patience/
min_delta/check_finite), RichModelSummary and RichProgressBar, plus the
epoch-end qualitative image panels the reference buries in its LightningModules
(conditional_flow_matching.py:242-329) — here a first-class ImageLogger
callback running on process 0 only.
"""

from __future__ import annotations

import math
import re
import shutil
import time
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


class Callback:
    def on_fit_start(self, trainer, task) -> None: ...

    def on_train_epoch_start(self, trainer, task) -> None: ...

    def on_train_batch_end(self, trainer, task, metrics: dict) -> None: ...

    def on_train_epoch_end(self, trainer, task) -> None: ...

    def on_validation_epoch_end(self, trainer, task) -> None: ...

    def on_fit_end(self, trainer, task) -> None: ...

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


def _format_filename(pattern: str, metrics: dict, epoch: int) -> str:
    """Expand 'best-{epoch:03d}-{val/loss:.4f}' style patterns."""

    def repl(m: re.Match) -> str:
        key, fmt = m.group(1), m.group(2) or ""
        if key == "epoch":
            value: Any = epoch
        else:
            value = metrics.get(key, float("nan"))
        return format(value, fmt) if fmt else str(value)

    out = re.sub(r"\{([^{}:]+)(?::([^{}]+))?\}", repl, pattern)
    return out.replace("/", "_")


class ModelCheckpoint(Callback):
    """Top-k + last checkpointing on a monitored metric (Orbax-backed).

    Config parity: configs/callbacks/model_checkpoint.yaml:4-17 and the
    per-experiment overrides (every_n_epochs, filename patterns).
    """

    def __init__(
        self,
        dirpath: Optional[str] = None,
        filename: str = "epoch_{epoch:03d}",
        monitor: Optional[str] = "val/loss",
        mode: str = "min",
        save_last: bool = True,
        save_top_k: int = 1,
        every_n_epochs: int = 1,
        auto_insert_metric_name: bool = False,
        verbose: bool = False,
        save_weights_only: bool = False,
        save_on_train_epoch_end: Optional[bool] = None,
        log_model: bool = True,  # register saved ckpts with the loggers
    ):
        self.log_model = log_model
        # Lightning default (None → True for the 'last' write): save_last runs
        # on EVERY train epoch end, so with check_val_every_n_epoch=N a crash
        # loses at most one epoch, not N-1. False defers it to validation end.
        self.save_on_train_epoch_end = save_on_train_epoch_end is not False
        self.dirpath = dirpath
        self.filename = filename
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.save_top_k = save_top_k
        self.every_n_epochs = max(1, every_n_epochs or 1)
        self.verbose = verbose
        # (score, path) of kept checkpoints, best first
        self.kept: list[tuple[float, str]] = []
        self.best_model_path: str = ""
        self.best_model_score: Optional[float] = None
        self.last_model_path: str = ""

    def _dir(self, trainer) -> Path:
        d = Path(self.dirpath) if self.dirpath else Path(trainer.default_root_dir) / "checkpoints"
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def _save_last(self, trainer) -> None:
        if self.save_last:
            self.last_model_path = str(self._dir(trainer) / "last")
            trainer.save_checkpoint(self.last_model_path)

    # NOTE: these hooks run on EVERY process — checkpoint decisions derive
    # from globally-reduced callback_metrics (identical everywhere), and the
    # save itself must be collective (fsdp-sharded leaves are gathered across
    # hosts inside CheckpointIO.save; a rank-gated call would deadlock).
    # Filesystem side effects beyond the save are still rank-0-only.

    def on_train_epoch_end(self, trainer, task) -> None:
        if trainer.sanity_checking:
            return
        if self.save_on_train_epoch_end:
            self._save_last(trainer)

    def on_validation_epoch_end(self, trainer, task) -> None:
        if trainer.sanity_checking:
            return
        epoch = trainer.current_epoch
        metrics = trainer.callback_metrics
        base = self._dir(trainer)

        # Refresh 'last' after a REAL validation: the train-epoch-end write
        # (crash safety under check_val_every_n_epoch=N) predates this
        # epoch's validation, so a resume from it would replay the next epoch
        # with the plateau-scheduler/top-k state one validation behind. The
        # trainer also fires this hook on no-val-loader epochs (save_last
        # still must happen somewhere when save_on_train_epoch_end=False) —
        # skip the duplicate multi-hundred-MB write when nothing validated
        # and the train-epoch-end write already ran.
        if getattr(trainer, "_val_ran", True) or not self.save_on_train_epoch_end:
            self._save_last(trainer)

        if self.monitor is None or self.monitor not in metrics:
            return
        if (epoch + 1) % self.every_n_epochs != 0:
            return
        score = float(metrics[self.monitor])
        if math.isnan(score):
            return
        if self.save_top_k == 0:
            return
        path = str(base / _format_filename(self.filename, metrics, epoch))
        if self.save_top_k == -1 or len(self.kept) < self.save_top_k or self._better(score, self.kept[-1][0]):
            trainer.save_checkpoint(path)
            # a path saved twice (e.g. two mid-epoch validations with an
            # epoch-only filename pattern) keeps ONE entry with its newest
            # score — duplicate entries would let the top-k pruner delete a
            # directory another surviving entry still references
            self.kept = [(sc, pa) for sc, pa in self.kept if pa != path]
            self.kept.append((score, path))
            self.kept.sort(key=lambda sp: sp[0], reverse=(self.mode == "max"))
            while self.save_top_k != -1 and len(self.kept) > self.save_top_k:
                _, drop = self.kept.pop()
                still_referenced = any(pa == drop for _, pa in self.kept)
                if (
                    trainer.is_global_zero
                    and drop != path
                    and not still_referenced
                    and Path(drop).exists()
                ):
                    shutil.rmtree(drop, ignore_errors=True)
            self.best_model_score, self.best_model_path = self.kept[0]
            if self.log_model and trainer.is_global_zero:
                for logger in trainer.loggers:
                    logger.log_model(path, {"epoch": epoch, self.monitor: score})
            if self.verbose:
                trainer.print(f"Saved checkpoint {path} ({self.monitor}={score:.5f})")

    def state_dict(self) -> dict:
        return {
            "kept": self.kept,
            "best_model_path": self.best_model_path,
            "best_model_score": self.best_model_score,
            "last_model_path": self.last_model_path,
        }

    def load_state_dict(self, state: dict) -> None:
        self.kept = [tuple(x) for x in state.get("kept", [])]
        self.best_model_path = state.get("best_model_path", "")
        self.best_model_score = state.get("best_model_score")
        self.last_model_path = state.get("last_model_path", "")


class EarlyStopping(Callback):
    """Stop when the monitored metric stops improving
    (config parity: configs/callbacks/early_stopping.yaml)."""

    def __init__(
        self,
        monitor: str = "val/loss",
        min_delta: float = 0.0,
        patience: int = 3,
        mode: str = "min",
        strict: bool = True,
        check_finite: bool = True,
        stopping_threshold: Optional[float] = None,
        divergence_threshold: Optional[float] = None,
        verbose: bool = False,
        check_on_train_epoch_end: Optional[bool] = None,
        log_rank_zero_only: bool = False,
    ):
        self.monitor = monitor
        self.min_delta = abs(min_delta)
        self.patience = patience
        self.mode = mode
        self.strict = strict
        self.check_finite = check_finite
        self.stopping_threshold = stopping_threshold
        self.divergence_threshold = divergence_threshold
        self.verbose = verbose
        self.wait = 0
        self.best = math.inf if mode == "min" else -math.inf

    def _improved(self, value: float) -> bool:
        if self.mode == "min":
            return value < self.best - self.min_delta
        return value > self.best + self.min_delta

    def on_validation_epoch_end(self, trainer, task) -> None:
        if trainer.sanity_checking:
            return
        metrics = trainer.callback_metrics
        if self.monitor not in metrics:
            if self.strict:
                raise RuntimeError(
                    f"EarlyStopping monitor '{self.monitor}' not found in logged metrics: {sorted(metrics)}"
                )
            return
        value = float(metrics[self.monitor])
        if self.check_finite and not math.isfinite(value):
            trainer.should_stop = True
            trainer.print(f"EarlyStopping: non-finite {self.monitor}={value}, stopping.")
            return
        if self.stopping_threshold is not None and (
            value <= self.stopping_threshold if self.mode == "min" else value >= self.stopping_threshold
        ):
            trainer.should_stop = True
            return
        if self.divergence_threshold is not None and (
            value >= self.divergence_threshold if self.mode == "min" else value <= self.divergence_threshold
        ):
            trainer.should_stop = True
            return
        if self._improved(value):
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                trainer.should_stop = True
                if self.verbose:
                    trainer.print(f"EarlyStopping triggered on {self.monitor} (best {self.best:.5f})")

    def state_dict(self) -> dict:
        return {"wait": self.wait, "best": self.best}

    def load_state_dict(self, state: dict) -> None:
        self.wait = state.get("wait", 0)
        self.best = state.get("best", self.best)


class ModelSummary(Callback):
    """Param-count summary at fit start (RichModelSummary parity)."""

    def __init__(self, max_depth: int = 1):
        self.max_depth = max_depth

    def on_fit_start(self, trainer, task) -> None:
        if not trainer.is_global_zero or trainer.state is None:
            return
        params = trainer.state.params
        leaves = jax.tree_util.tree_leaves(params)
        total = sum(int(np.prod(x.shape)) for x in leaves)
        extra = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(trainer.state.extra_vars)
        )
        trainer.print(
            f"Model parameters: {total/1e6:.2f}M trainable, {extra/1e6:.2f}M non-trainable buffers"
        )


RichModelSummary = ModelSummary


class ProgressBar(Callback):
    """Console progress with loss + throughput (RichProgressBar stand-in)."""

    def __init__(self, refresh_rate: int = 1, leave: bool = False):
        self.refresh_rate = refresh_rate
        self._t0 = None
        self._count = 0

    def on_train_epoch_start(self, trainer, task) -> None:
        self._t0 = time.time()
        self._count = 0

    def on_train_batch_end(self, trainer, task, metrics: dict) -> None:
        self._count += 1
        if not trainer.is_global_zero or self._count % max(1, 50 // self.refresh_rate):
            return
        dt = time.time() - self._t0
        loss = metrics.get("loss")
        loss_s = f" loss={float(loss):.4f}" if loss is not None else ""
        trainer.print(
            f"epoch {trainer.current_epoch} step {trainer.global_step}{loss_s} "
            f"({self._count / max(dt, 1e-6):.2f} it/s)"
        )

    def on_train_epoch_end(self, trainer, task) -> None:
        if trainer.is_global_zero and self._t0 is not None:
            dt = time.time() - self._t0
            trainer.print(f"epoch {trainer.current_epoch} done in {dt:.1f}s")


RichProgressBar = ProgressBar


class LearningRateMonitor(Callback):
    def __init__(self, logging_interval: Optional[str] = "epoch"):
        self.logging_interval = logging_interval

    def on_train_epoch_end(self, trainer, task) -> None:
        lr = trainer.current_lr
        if lr is not None:
            trainer.log_metrics({"lr": lr})


class ImageLogger(Callback):
    """Epoch-end source/generated/target panels via a cheap 2-step sampler
    (replaces the rank-0 wandb image hooks, conditional_flow_matching.py:242-329;
    collectives make an explicit barrier unnecessary)."""

    def __init__(self, num_steps: int = 2, every_n_epochs: int = 1):
        self.num_steps = num_steps
        self.every_n_epochs = max(1, every_n_epochs)

    def on_validation_epoch_end(self, trainer, task) -> None:
        if (
            trainer.sanity_checking
            or not getattr(task, "log_images", False)
            or (trainer.current_epoch + 1) % self.every_n_epochs
        ):
            return
        # Draw the key on EVERY process, THEN rank-gate the rendering:
        # consuming trainer._rng on process 0 only would desynchronize the
        # (replicated-by-contract) RNG across hosts for all later steps.
        rng = trainer.next_rng()
        if not trainer.is_global_zero:
            return
        batch = trainer.peek_val_batch() or trainer.peek_train_batch()
        if batch is None:
            return
        try:
            panels = task.render_panels(
                trainer.state.variables, batch, rng, num_steps=self.num_steps
            )
        except NotImplementedError:
            return
        panels = {k: np.asarray(v) for k, v in panels.items()}
        for logger in trainer.loggers:
            logger.log_images("val", panels, trainer.global_step)


__all__ = [
    "Callback",
    "ModelCheckpoint",
    "EarlyStopping",
    "ModelSummary",
    "RichModelSummary",
    "ProgressBar",
    "RichProgressBar",
    "LearningRateMonitor",
    "ImageLogger",
]
