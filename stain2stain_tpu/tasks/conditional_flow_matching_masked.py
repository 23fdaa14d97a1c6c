"""Mask-weighted ("masked") conditional flow matching.

TPU re-design of the reference's ROI-upweighted variant
(/root/reference/src/models/conditional_flow_matching_masked.py:65-91,176-189):
batch is ``(src, tgt, binary mask)``; the velocity regression error inside the
mask is upweighted ``w = 1 + λ·mask`` (λ=10 default) and normalized by Σw;
inference is the plain unconditioned ODE from the source image.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from stain2stain_tpu.ops.losses import roi_weighted_mse

from .base import FlowMatchingTask


class MaskedFlowMatchingModule(FlowMatchingTask):
    batch_fields = ("image", "image", "mask")

    def __init__(
        self,
        *args,
        roi_lambda: float = 10.0,
        aux_loss_weight: float = 0.1,  # accepted for config parity; the
        # reference stores it but its masked loss never reads it (ref :22,76-91)
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.roi_lambda = roi_lambda
        self.aux_loss_weight = aux_loss_weight

    def init_variables(self, rng: jax.Array, batch: tuple) -> Any:
        src = batch[0]
        x = jnp.zeros(src.shape, jnp.float32) if src.dtype != jnp.float32 else src
        t = jnp.zeros((x.shape[0],), jnp.float32)
        return self.net.init(rng, t, x)

    def loss_and_metrics(self, variables, batch, rng, train):
        src, tgt, mask = batch[0], batch[1], batch[2]
        fm_rng, drop_rng = jax.random.split(rng)
        t, xt, ut = self.flow_matcher.sample_location_and_conditional_flow(fm_rng, src, tgt)
        vt = self._apply_net(variables, t, xt, train=train, rng=drop_rng)
        loss = roi_weighted_mse(vt, ut, mask, roi_lambda=self.roi_lambda)
        return loss, {"loss": loss}, {}

    def generate(self, variables, source: jax.Array, num_steps: int = 100) -> jax.Array:
        if source.ndim == 3:
            source = source[None]

        def velocity(t, x):
            return self._apply_net(variables, jnp.full((x.shape[0],), t), x, train=False)

        return self._integrate(velocity, source, num_steps)


__all__ = ["MaskedFlowMatchingModule"]
