"""Mask-toggled conditional flow matching (classifier-free-style training).

TPU re-design of /root/reference/src/models/conditional_flow_matching_conditional_toggle_mask.py:
like the mask-conditioned variant, but during training the whole batch's mask
is zeroed with probability 0.5 (one coin per step, ref :77-79), so the model
learns both conditioned and unconditioned generation; at inference the mask is
zeroed (ref :185 — generation runs unconditioned by default), with the option
to pass a real mask.

RNG discipline: torch's implicit-global coin flip becomes an explicit key
split off the step PRNG; ``lax.select`` keeps the branch jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stain2stain_tpu.ops.losses import mse_loss

from .conditional_flow_matching_conditional_mask import MaskConditionedFlowMatchingModule


class ToggleMaskFlowMatchingModule(MaskConditionedFlowMatchingModule):
    def __init__(self, *args, toggle_prob: float = 0.5, **kwargs):
        super().__init__(*args, **kwargs)
        self.toggle_prob = toggle_prob

    def loss_and_metrics(self, variables, batch, rng, train):
        src, tgt, mask = batch[0], batch[1], batch[2]
        fm_rng, drop_rng, toggle_rng = jax.random.split(rng, 3)
        if train and self.toggle_prob > 0:
            zero = jax.random.bernoulli(toggle_rng, self.toggle_prob)
            mask = jnp.where(zero, jnp.zeros_like(mask), mask)
        t, xt, ut = self.flow_matcher.sample_location_and_conditional_flow(fm_rng, src, tgt)
        vt = self._velocity(variables, t, xt, mask, train=train, rng=drop_rng)
        loss = mse_loss(vt, ut)
        return loss, {"loss": loss}, {}

    def generate(self, variables, source, num_steps: int = 100, mask=None):
        # mask=None runs on a zero mask — the reference's unconditioned
        # generation default (toggle_mask.py:185 zeroes the mask before
        # integrating); the model trained on zeroed masks via the coin flip.
        # Pass an explicit mask to generate conditioned.
        if source.ndim == 3:
            source = source[None]
        if mask is None:
            mask = jnp.zeros((*source.shape[:-1], 1), source.dtype)
        return super().generate(variables, source, num_steps=num_steps, mask=mask)


__all__ = ["ToggleMaskFlowMatchingModule"]
