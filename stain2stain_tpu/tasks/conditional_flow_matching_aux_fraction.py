"""Aux-fraction CFM variant (deprecated in the reference, kept for parity).

TPU re-design of /root/reference/src/models/___conditional_flow_matching_masked.py
(underscore-prefixed, referenced by no config — SURVEY.md §2.2 row 9):

- flow loss: ``0.5·mean(mask·err²) + 0.5·mean(err²)`` (ref :89-101)
- auxiliary head: global-avg-pool of the velocity field → Dense(1) → sigmoid,
  regressing the mask's area fraction; ``L += w·MSE(frac_pred, mean(mask))``
  (ref :45-58,101-109); the fraction target is stop-gradient (torch.no_grad)
- inference: plain ODE on the velocity field only (``_velocity_field_only``
  wrapper, ref :229)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .base import FlowMatchingTask


class AuxFractionFlowMatchingModule(FlowMatchingTask):
    batch_fields = ("image", "image", "mask")

    def __init__(self, *args, aux_loss_weight: float = 0.1, **kwargs):
        super().__init__(*args, **kwargs)
        self.aux_loss_weight = aux_loss_weight

    def init_variables(self, rng: jax.Array, batch: tuple) -> Any:
        src = batch[0]
        x = jnp.zeros(src.shape, jnp.float32) if src.dtype != jnp.float32 else src
        t = jnp.zeros((x.shape[0],), jnp.float32)
        net_rng, head_rng = jax.random.split(rng)
        variables = self.net.init(net_rng, t, x)
        # Regression head: Dense(C→1) on the globally pooled velocity field;
        # C comes from the net's actual output (out_channels may differ from 3)
        chans = int(jax.eval_shape(
            lambda v, tt, xx: self.net.apply(v, tt, xx), variables, t, x
        ).shape[-1])
        w = jax.random.normal(head_rng, (chans, 1), jnp.float32) / jnp.sqrt(chans)
        params = dict(variables["params"])
        params["frac_head"] = {"kernel": w, "bias": jnp.zeros((1,), jnp.float32)}
        return {**variables, "params": params}

    def _split(self, variables):
        params = dict(variables["params"])
        head = params.pop("frac_head")
        return {**variables, "params": params}, head

    def _forward(self, variables, t, x, *, train: bool, rng=None):
        net_vars, head = self._split(variables)
        vt = self._apply_net(net_vars, t, x, train=train, rng=rng)
        pooled = jnp.mean(vt.astype(jnp.float32), axis=(1, 2))  # (B, C)
        frac = jax.nn.sigmoid(pooled @ head["kernel"] + head["bias"])[:, 0]
        return vt, frac

    def loss_and_metrics(self, variables, batch, rng, train):
        src, tgt, mask = batch[0], batch[1], batch[2]
        fm_rng, drop_rng = jax.random.split(rng)
        t, xt, ut = self.flow_matcher.sample_location_and_conditional_flow(fm_rng, src, tgt)
        vt, frac_pred = self._forward(variables, t, xt, train=train, rng=drop_rng)
        sq_err = jnp.square(vt.astype(jnp.float32) - ut.astype(jnp.float32))
        loss_masked = jnp.mean(mask.astype(jnp.float32) * sq_err)
        loss_unmasked = jnp.mean(sq_err)
        flow_loss = 0.5 * loss_masked + 0.5 * loss_unmasked
        frac_true = jax.lax.stop_gradient(jnp.mean(mask.astype(jnp.float32), axis=(1, 2, 3)))
        aux_loss = jnp.mean(jnp.square(frac_pred - frac_true))
        loss = flow_loss + self.aux_loss_weight * aux_loss
        return loss, {"loss": loss, "flow_loss": flow_loss, "aux_loss": aux_loss}, {}

    def generate(self, variables, source: jax.Array, num_steps: int = 100) -> jax.Array:
        if source.ndim == 3:
            source = source[None]

        def velocity(t, x):
            vt, _ = self._forward(variables, jnp.full((x.shape[0],), t), x, train=False)
            return vt

        return self._integrate(velocity, source, num_steps)


__all__ = ["AuxFractionFlowMatchingModule"]
