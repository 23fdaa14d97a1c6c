"""Mask-conditioned conditional flow matching (mask as 4th input channel).

TPU re-design of /root/reference/src/models/conditional_flow_matching_conditional_mask.py:
the net takes 4 input channels — RGB state + the segmentation mask concatenated
along channels (ref :62-65) — and training is plain MSE on the velocity (ref
:79-80). Inference concatenates the provided mask at every ODE step
(MaskConditionedWrapper parity, ref :172-198).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from stain2stain_tpu.ops.losses import mse_loss

from stain2stain_tpu.ops.image import denormalize

from .base import FlowMatchingTask


class MaskConditionedFlowMatchingModule(FlowMatchingTask):
    batch_fields = ("image", "image", "mask")

    def __init__(self, *args, aux_loss_weight: float = 0.1, **kwargs):
        # aux_loss_weight: config-parity knob, unused (reference stores but
        # never reads it in this variant's loss).
        super().__init__(*args, **kwargs)

    def init_variables(self, rng: jax.Array, batch: tuple) -> Any:
        src = batch[0]
        x = jnp.zeros(src.shape, jnp.float32) if src.dtype != jnp.float32 else src
        mask = jnp.zeros((*x.shape[:-1], 1), jnp.float32)
        t = jnp.zeros((x.shape[0],), jnp.float32)
        return self.net.init(rng, t, jnp.concatenate([x, mask], axis=-1))

    def _velocity(self, variables, t, x, mask, *, train: bool, rng=None):
        x_with_mask = jnp.concatenate([x, mask.astype(x.dtype)], axis=-1)
        return self._apply_net(variables, t, x_with_mask, train=train, rng=rng)

    def loss_and_metrics(self, variables, batch, rng, train):
        src, tgt, mask = batch[0], batch[1], batch[2]
        fm_rng, drop_rng = jax.random.split(rng)
        t, xt, ut = self.flow_matcher.sample_location_and_conditional_flow(fm_rng, src, tgt)
        vt = self._velocity(variables, t, xt, mask, train=train, rng=drop_rng)
        loss = mse_loss(vt, ut)
        return loss, {"loss": loss}, {}

    def generate(
        self,
        variables,
        source: jax.Array,
        num_steps: int = 100,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        if source.ndim == 3:
            source = source[None]
        if mask is None:
            # Only the ToggleMask subclass trains on zeroed masks (its
            # classifier-free coin); this model never saw a zero mask, so
            # silently substituting one would return degraded translations
            # with no error. (Ref contract: conditional_mask.py:172-198
            # always concatenates the real mask at inference.)
            raise ValueError(
                "MaskConditionedFlowMatchingModule.generate requires the "
                "conditioning mask; only the mask-toggled variant supports "
                "unconditioned (zero-mask) generation"
            )
        if mask.ndim == 3:
            mask = mask[None]

        def velocity(t, x):
            return self._velocity(variables, jnp.full((x.shape[0],), t), x, mask, train=False)

        return self._integrate(velocity, source, num_steps)

    def render_panels(self, variables, batch, rng, num_steps: int = 2) -> dict:
        prepared = self.prepare_batch(batch, rng, train=False)
        src, tgt, mask = prepared[0], prepared[1], prepared[2]
        n = min(self.n_images_log, src.shape[0])
        gen = self.generate(variables, src[:n], num_steps=num_steps, mask=mask[:n])
        return {
            "source": denormalize(src[:n]),
            "generated": denormalize(gen),
            "target": denormalize(tgt[:n]),
            "mask": mask[:n],
        }


__all__ = ["MaskConditionedFlowMatchingModule"]
