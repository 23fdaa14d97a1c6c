"""Plain conditional-flow-matching stain translation task.

TPU re-design of ``ConditionalFlowMatchingLitModule``
(/root/reference/src/models/conditional_flow_matching.py:9-170): per step,
sample (t, xt, ut) on the straight-line path between the paired source and
target tiles and regress the velocity net with MSE(vt, ut); inference
integrates the learned ODE from the *source image* at t=0 to the target stain
at t=1 inside one compiled ``lax.scan``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from stain2stain_tpu.ops.losses import mse_loss

from .base import FlowMatchingTask


class ConditionalFlowMatchingModule(FlowMatchingTask):
    batch_fields = ("image", "image", "meta", "meta")

    def init_variables(self, rng: jax.Array, batch: tuple) -> Any:
        src = batch[0]
        x = jnp.zeros(src.shape, jnp.float32) if src.dtype != jnp.float32 else src
        t = jnp.zeros((x.shape[0],), jnp.float32)
        return self.net.init(rng, t, x)

    def loss_and_metrics(self, variables, batch, rng, train):
        src, tgt = batch[0], batch[1]
        fm_rng, drop_rng = jax.random.split(rng)
        t, xt, ut = self.flow_matcher.sample_location_and_conditional_flow(fm_rng, src, tgt)
        vt = self._apply_net(variables, t, xt, train=train, rng=drop_rng)
        loss = mse_loss(vt, ut)
        return loss, {"loss": loss}, {}

    def generate(self, variables, source: jax.Array, num_steps: int = 100) -> jax.Array:
        if source.ndim == 3:
            source = source[None]

        def velocity(t, x):
            return self._apply_net(variables, jnp.full((x.shape[0],), t), x, train=False)

        return self._integrate(velocity, source, num_steps)


__all__ = ["ConditionalFlowMatchingModule"]
