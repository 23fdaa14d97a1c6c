"""Training harness: Trainer, callbacks, loggers, optimizers, train state.

Replaces the reference's external Lightning Trainer layer (SURVEY.md §1 L4)
with an explicit JAX loop over a device mesh.
"""

from .callbacks import (
    Callback,
    EarlyStopping,
    ImageLogger,
    LearningRateMonitor,
    ModelCheckpoint,
    ModelSummary,
    ProgressBar,
    RichModelSummary,
    RichProgressBar,
)
from .loggers import CSVLogger, Logger, TensorBoardLogger
from .optim import SGD, Adam, AdamW, ReduceLROnPlateau
from .state import CheckpointIO, TrainState
from .trainer import Trainer

__all__ = [
    "Trainer",
    "TrainState",
    "CheckpointIO",
    "Callback",
    "ModelCheckpoint",
    "EarlyStopping",
    "ModelSummary",
    "RichModelSummary",
    "ProgressBar",
    "RichProgressBar",
    "LearningRateMonitor",
    "ImageLogger",
    "Logger",
    "CSVLogger",
    "TensorBoardLogger",
    "Adam",
    "AdamW",
    "SGD",
    "ReduceLROnPlateau",
]
