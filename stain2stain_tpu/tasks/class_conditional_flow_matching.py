"""Class-conditional (any↔any) flow-matching stain translation.

TPU re-design of ``ClassConditionalFlowMatchingLitModule``
(/root/reference/src/models/class_conditional_flow_matching.py:56-69,163-187):
the velocity net takes a target-stain class id ``y`` alongside (t, x); training
regresses MSE with the label of the *target* domain; inference integrates the
ODE with the requested target class injected at every step.

TPU-first upgrade over the reference's notebook loop
(notebooks/infer_any2any.ipynb cells 10-14): ``generate_all_classes`` folds the
per-class Python loop into **one** compiled call by batching the class axis —
sources are tiled across stain codes and integrated together, so any→all
translation is a single XLA program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from stain2stain_tpu.ops.image import denormalize
from stain2stain_tpu.ops.losses import mse_loss

from .base import FlowMatchingTask


class ClassConditionalFlowMatchingModule(FlowMatchingTask):
    batch_fields = ("image", "image", "label")

    def __init__(self, *args, num_classes: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_classes = num_classes

    def init_variables(self, rng: jax.Array, batch: tuple) -> Any:
        src = batch[0]
        x = jnp.zeros(src.shape, jnp.float32) if src.dtype != jnp.float32 else src
        t = jnp.zeros((x.shape[0],), jnp.float32)
        y = jnp.zeros((x.shape[0],), jnp.int32)
        return self.net.init(rng, t, x, y)

    def loss_and_metrics(self, variables, batch, rng, train):
        src, tgt, y = batch[0], batch[1], batch[2]
        fm_rng, drop_rng = jax.random.split(rng)
        t, xt, ut = self.flow_matcher.sample_location_and_conditional_flow(fm_rng, src, tgt)
        vt = self._apply_net(variables, t, xt, y=y, train=train, rng=drop_rng)
        loss = mse_loss(vt, ut)
        return loss, {"loss": loss}, {}

    def generate(
        self, variables, source: jax.Array, num_steps: int = 100, target_class: int | jax.Array = 0
    ) -> jax.Array:
        """ODE from source with the class label injected each step
        (ConditionalWrapper parity, class_conditional_flow_matching.py:163-187)."""
        if source.ndim == 3:
            source = source[None]
        y = jnp.broadcast_to(jnp.asarray(target_class, jnp.int32), (source.shape[0],))

        def velocity(t, x):
            return self._apply_net(variables, jnp.full((x.shape[0],), t), x, y=y, train=False)

        return self._integrate(velocity, source, num_steps)

    def generate_all_classes(
        self, variables, source: jax.Array, num_steps: int = 100
    ) -> jax.Array:
        """One compiled any→all call: returns (num_classes, B, H, W, C).

        Tiles the batch across the stain-code axis so all target domains
        integrate in a single XLA program (SURVEY.md §3.5 north-star).
        """
        if source.ndim == 3:
            source = source[None]
        n_cls, batch = self.num_classes, source.shape[0]
        tiled = jnp.tile(source, (n_cls, 1, 1, 1))
        y = jnp.repeat(jnp.arange(n_cls, dtype=jnp.int32), batch)

        def velocity(t, x):
            return self._apply_net(variables, jnp.full((x.shape[0],), t), x, y=y, train=False)

        out = self._integrate(velocity, tiled, num_steps)
        return out.reshape(n_cls, batch, *source.shape[1:])

    def render_panels(self, variables, batch, rng, num_steps: int = 2) -> dict:
        """Generate with each example's OWN sampled target class — the base
        implementation's target_class=0 default would translate ~(1-1/K) of
        the panel to the wrong stain while 'target' shows another class."""
        prepared = self.prepare_batch(batch, rng, train=False)
        src, tgt, y = prepared[0], prepared[1], prepared[2]
        n = min(self.n_images_log, src.shape[0])
        gen = self.generate(variables, src[:n], num_steps=num_steps, target_class=y[:n])
        return {
            "source": denormalize(src[:n]),
            "generated": denormalize(gen),
            "target": denormalize(tgt[:n]),
        }


__all__ = ["ClassConditionalFlowMatchingModule"]
