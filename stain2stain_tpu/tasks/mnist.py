"""MNIST classifier task (Lightning-Hydra template demo parity).

TPU re-design of ``MNISTLitModule``
(/root/reference/src/models/mnist_module.py:10-217): SimpleDenseNet + cross
entropy, accuracy metrics per split, and the ``val/acc_best`` running max the
template's sweeps optimize. Kept because the reference's whole test pyramid
smokes on this config (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .base import TaskModule


class MNISTLitModule(TaskModule):
    batch_fields = ("raw", "label")
    monitor = "val/loss"
    # running max the template's Optuna sweep optimizes (ref :67-77)
    track_best = {"val/acc": ("max", "val/acc_best")}

    def __init__(self, net=None, optimizer=None, scheduler=None, compile: bool = True):
        super().__init__(net=net, optimizer=optimizer, scheduler=scheduler, log_images=False)

    def prepare_batch(self, batch, rng, train=False, augment=None):
        x, y = batch[0], batch[1]
        # torchvision ToTensor + Normalize((0.1307,), (0.3081,)) equivalence:
        # uint8 arrives raw from the loader; floats are assumed pre-normalized.
        if x.dtype == jnp.uint8:
            x = (x.astype(jnp.float32) / 255.0 - 0.1307) / 0.3081
        if x.ndim == 3:
            x = x[..., None]
        return x, y.astype(jnp.int32)

    def init_variables(self, rng: jax.Array, batch: tuple) -> Any:
        x = batch[0]
        return self.net.init(rng, jnp.zeros(x.shape, jnp.float32))

    def loss_and_metrics(self, variables, batch, rng, train):
        x, y = batch[0], batch[1]
        logits = self.net.apply(variables, x)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(log_probs, y[:, None], axis=-1))
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}, {}


__all__ = ["MNISTLitModule"]
