"""Task-module base: the functional JAX replacement for LightningModules.

Each reference LightningModule (SURVEY.md §2.2) bundles a net + loss recipe +
``generate()`` sampler + optimizer config. Here a *task module* carries the
same configuration surface but exposes **pure functions** the Trainer jits:

- ``init_variables(rng, batch)``                — build param pytrees
- ``prepare_batch(batch, rng, train, augment)`` — on-device normalize+augment,
  traced into the train step (host never touches float pixels)
- ``loss_and_metrics(variables, batch, rng, train)`` — the model step
- ``generate(variables, source, num_steps, ...)`` — lax.scan ODE sampler,
  one compiled program per (num_steps, shape)

Canonical reference shape: src/models/conditional_flow_matching.py:53-170.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from stain2stain_tpu.ops.cfm import ConditionalFlowMatcher
from stain2stain_tpu.ops.image import denormalize, normalize_uint8, paired_random_crop_flip
from stain2stain_tpu.ops.solvers import SolverConfig


class TaskModule:
    """Base for all task modules. Subclasses define ``batch_fields`` — a tuple
    of per-field kinds: 'image' (uint8 RGB → [-1,1]), 'mask' (uint8 → float
    (B,H,W,1)), 'class_mask' (int ids, kept), 'label' (int), 'meta' (host-only).
    """

    batch_fields: Sequence[str] = ("image", "image")
    monitor: str = "val/loss"

    def __init__(
        self,
        net=None,
        optimizer: Optional[Callable] = None,
        scheduler: Optional[Callable] = None,
        compile: bool = True,  # parity knob; everything is jitted regardless
        log_images: bool = True,
        n_images_log: int = 5,
    ):
        self.net = net
        self.optimizer = optimizer
        self.scheduler = scheduler
        self.log_images = log_images
        self.n_images_log = n_images_log

    # ------------------------------------------------------------ batch prep
    def device_fields(self, batch: tuple) -> tuple:
        """Strip host-only fields (filenames) before device transfer."""
        return tuple(
            x for x, kind in zip(batch, self.batch_fields) if kind != "meta"
        )

    def prepare_batch(
        self,
        batch: tuple,
        rng: jax.Array,
        train: bool = False,
        augment: Optional[dict] = None,
    ) -> tuple:
        """On-device field conversion + *shared* random crop/flip (paired
        augmentation contract of ref paired_data_module.py:172-199)."""
        kinds = [k for k in self.batch_fields if k != "meta"][: len(batch)]
        arrays = []
        for x, kind in zip(batch, kinds):
            if kind == "image":
                x = normalize_uint8(x) if x.dtype == jnp.uint8 else x.astype(jnp.float32)
            elif kind == "mask":
                x = x.astype(jnp.float32)
                if x.ndim == 3:
                    x = x[..., None]
            elif kind == "class_mask":
                x = x.astype(jnp.int32)
                if x.ndim == 4:
                    x = x[..., 0]
            elif kind == "label":
                x = x.astype(jnp.int32)
            arrays.append(x)
        if train and augment:
            spatial = [
                (i, a) for i, (a, kind) in enumerate(zip(arrays, kinds)) if kind in ("image", "mask")
            ]
            cm = [
                (i, a[..., None].astype(jnp.float32))
                for i, (a, kind) in enumerate(zip(arrays, kinds))
                if kind == "class_mask"
            ]
            group = [a for _, a in spatial] + [a for _, a in cm]
            if group:
                out = paired_random_crop_flip(
                    rng,
                    group,
                    crop_size=augment["crop_size"],
                    hflip=augment.get("hflip", True),
                    vflip=augment.get("vflip", True),
                )
                for (i, _), o in zip(spatial, out[: len(spatial)]):
                    arrays[i] = o
                for (i, _), o in zip(cm, out[len(spatial):]):
                    arrays[i] = o[..., 0].astype(jnp.int32)
        return tuple(arrays)

    # ----------------------------------------------------------------- model
    def init_variables(self, rng: jax.Array, batch: tuple) -> Any:
        raise NotImplementedError

    def loss_and_metrics(
        self, variables: Any, batch: tuple, rng: jax.Array, train: bool
    ) -> tuple[jax.Array, dict, dict]:
        """Returns (loss, metrics dict, mutable-variable updates dict)."""
        raise NotImplementedError

    # ------------------------------------------------------------- optimizers
    def configure_optimizers(self):
        """Returns (optax transformation, host scheduler or None)."""
        tx = self.optimizer() if callable(self.optimizer) else self.optimizer
        sched = self.scheduler() if callable(self.scheduler) else self.scheduler
        return tx, sched

    # -------------------------------------------------------------- sampling
    def generate(self, variables: Any, source: jax.Array, num_steps: int = 100, **cond):
        raise NotImplementedError

    # --------------------------------------------------- qualitative logging
    def render_panels(
        self, variables: Any, batch: tuple, rng: jax.Array, num_steps: int = 2
    ) -> dict:
        """Source/generated/target [0,1] panels for the epoch-end image hook
        (ref: conditional_flow_matching.py:172-240 logs 2-step previews)."""
        prepared = self.prepare_batch(batch, rng, train=False)
        src, tgt = prepared[0], prepared[1]
        n = min(self.n_images_log, src.shape[0])
        gen = self.generate(variables, src[:n], num_steps=num_steps)
        if isinstance(gen, tuple):
            gen = gen[0]
        return {
            "source": denormalize(src[:n]),
            "generated": denormalize(gen),
            "target": denormalize(tgt[:n]),
        }


class FlowMatchingTask(TaskModule):
    """Shared machinery for CFM variants: path sampler + ODE generate()."""

    def __init__(
        self,
        net=None,
        flow_matcher: Optional[ConditionalFlowMatcher] = None,
        solver: Optional[SolverConfig] = None,
        optimizer=None,
        scheduler=None,
        compile: bool = True,
        log_images: bool = True,
        n_images_log: int = 5,
    ):
        super().__init__(
            net=net,
            optimizer=optimizer,
            scheduler=scheduler,
            compile=compile,
            log_images=log_images,
            n_images_log=n_images_log,
        )
        self.flow_matcher = flow_matcher or ConditionalFlowMatcher(sigma=0.0)
        if solver is not None and callable(solver) and not isinstance(solver, SolverConfig):
            solver = solver()  # _partial_ config parity
        self.solver = solver or SolverConfig(solver="euler")

    def _apply_net(self, variables, t, x, *, train: bool, rng=None, **kw):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.net.apply(variables, t, x, train=train, rngs=rngs, **kw)

    def _integrate(self, velocity_fn, x0: jax.Array, num_steps: int) -> jax.Array:
        return self.solver(velocity_fn, x0, num_steps)


__all__ = ["TaskModule", "FlowMatchingTask"]
