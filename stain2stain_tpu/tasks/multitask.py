"""Multitask (binary) flow matching + segmentation with a shared encoder.

TPU re-design of ``MultiTaskFlowMatchingLitModule``
(/root/reference/src/models/conditional_flow_matching_multitask.py:56-424):

    H&E → SharedEncoder → F ─┬→ FlowMatchingDecoder(F, skips, t_emb) → velocity
                             └→ SegmentationDecoder(F, skips)        → mask logits

Loss: ``L_FM + α·(w·Dice + (1−w)·BCE)`` (ref :190-194,246); both heads
backprop through the shared encoder (optimizer unions all params, ref :393-404
— here that's automatic: one params pytree nests encoder+both decoders).

TPU-first step fusion: the reference encodes **twice** per step (xt for the
flow head, the raw source for the seg head, ref :224-240). The inputs differ
so the features can't be shared, but the two encoder passes are batched into
ONE call on ``concat([xt, src])`` along the batch axis — a single 2B-batch conv
stack keeps the MXU at full tilt instead of two half-size launches.

Inference ``generate()`` (ref :419-424 → returns ``(generated_img, pred_mask)``):
the ODE integrates encoder→flow-decoder per step inside one ``lax.scan``; the
seg head runs once on the source.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from stain2stain_tpu.ops.image import denormalize
from stain2stain_tpu.ops.losses import bce_with_logits, dice_loss, mse_loss
from stain2stain_tpu.ops.time_embedding import timestep_embedding_sincos

from .base import FlowMatchingTask


def _merge_module_vars(**module_vars: dict) -> dict:
    """Nest per-module flax variable dicts under one tree: col → module → ..."""
    collections: set[str] = set()
    for v in module_vars.values():
        collections |= set(v.keys())
    return {
        col: {name: v[col] for name, v in module_vars.items() if col in v}
        for col in collections
    }


def _module_vars(variables: dict, name: str) -> dict:
    """Extract one module's variable dict back out of the merged tree."""
    return {col: tree[name] for col, tree in variables.items() if name in tree}


class SharedBackboneTask(FlowMatchingTask):
    """Common machinery for the shared-encoder multitask family."""

    batch_fields = ("image", "image", "mask")
    seg_metric_name = "seg_bce"

    def __init__(
        self,
        encoder=None,
        flow_decoder=None,
        seg_decoder=None,
        flow_matcher=None,
        solver=None,
        optimizer=None,
        scheduler=None,
        compile: bool = True,
        log_images: bool = True,
        seg_loss_weight: float = 1.0,
        dice_weight: float = 0.5,
        n_images_log: int = 5,
        time_emb_dim: int = 256,
    ):
        super().__init__(
            net=None,
            flow_matcher=flow_matcher,
            solver=solver,
            optimizer=optimizer,
            scheduler=scheduler,
            compile=compile,
            log_images=log_images,
            n_images_log=n_images_log,
        )
        self.encoder = encoder
        self.flow_decoder = flow_decoder
        self.seg_decoder = seg_decoder
        self.seg_loss_weight = seg_loss_weight
        self.dice_weight = dice_weight
        self.time_emb_dim = time_emb_dim

    # ----------------------------------------------------------- param mgmt
    def init_variables(self, rng: jax.Array, batch: tuple) -> Any:
        src = batch[0]
        x = jnp.zeros(src.shape, jnp.float32) if src.dtype != jnp.float32 else src
        e_rng, f_rng, s_rng = jax.random.split(rng, 3)
        enc_vars = self.encoder.init(e_rng, x)
        # shape-only probe: the decoders only need the encoder OUTPUT SHAPES
        # to init — eval_shape costs zero FLOPs vs a real forward pass
        out = jax.eval_shape(self.encoder.apply, enc_vars, x)
        bottleneck = jnp.zeros(out[0].shape, out[0].dtype)
        skips = [jnp.zeros(sd.shape, sd.dtype) for sd in out[1]]
        t_emb = timestep_embedding_sincos(jnp.zeros((x.shape[0],)), self.time_emb_dim)
        flow_vars = self.flow_decoder.init(f_rng, bottleneck, skips, t_emb)
        seg_vars = self.seg_decoder.init(s_rng, bottleneck, skips)
        return _merge_module_vars(
            encoder=enc_vars, flow_decoder=flow_vars, seg_decoder=seg_vars
        )

    # --------------------------------------------------------- forward parts
    def _encode(self, variables, x, *, train: bool):
        return self.encoder.apply(_module_vars(variables, "encoder"), x, train=train)

    def forward_flow(self, variables, t, x, *, train: bool = False):
        bottleneck, skips = self._encode(variables, x, train=train)
        t_emb = timestep_embedding_sincos(t, self.time_emb_dim)
        return self.flow_decoder.apply(
            _module_vars(variables, "flow_decoder"), bottleneck, skips, t_emb, train=train
        )

    def forward_segmentation(self, variables, x, *, train: bool = False):
        bottleneck, skips = self._encode(variables, x, train=train)
        return self.seg_decoder.apply(
            _module_vars(variables, "seg_decoder"), bottleneck, skips, train=train
        )

    def _fused_heads(self, variables, t, xt, src, *, train: bool):
        """One 2B-batch encoder pass feeding both heads (see module docstring).

        Returns ``(vt, seg_logits, var_updates)``. With ``norm='batch'``
        modules the updates carry the new running stats, nested per module
        exactly like ``init_variables``'s merged layout, so the trainer's
        ``extra_vars`` merge keeps them flowing (the GroupNorm default has no
        mutable collections and the updates dict stays empty).
        """
        batch = xt.shape[0]
        stats: dict = {}

        def run(module, name, *args):
            mvars = _module_vars(variables, name)
            if train and "batch_stats" in mvars:
                out, ups = module.apply(mvars, *args, train=train, mutable=["batch_stats"])
                stats[name] = ups["batch_stats"]
                return out
            return module.apply(mvars, *args, train=train)

        bottleneck, skips = run(
            self.encoder, "encoder", jnp.concatenate([xt, src], axis=0)
        )
        b_flow, b_seg = bottleneck[:batch], bottleneck[batch:]
        s_flow = [s[:batch] for s in skips]
        s_seg = [s[batch:] for s in skips]
        t_emb = timestep_embedding_sincos(t, self.time_emb_dim)
        vt = run(self.flow_decoder, "flow_decoder", b_flow, s_flow, t_emb)
        seg_logits = run(self.seg_decoder, "seg_decoder", b_seg, s_seg)
        return vt, seg_logits, ({"batch_stats": stats} if stats else {})

    # -------------------------------------------------------------- sampling
    def generate(self, variables, source: jax.Array, num_steps: int = 50):
        if source.ndim == 3:
            source = source[None]

        def velocity(t, x):
            return self.forward_flow(variables, jnp.full((x.shape[0],), t), x, train=False)

        img = self._integrate(velocity, source, num_steps)
        seg_logits = self.forward_segmentation(variables, source, train=False)
        return img, self.predict_mask(seg_logits)

    def predict_mask(self, seg_logits: jax.Array) -> jax.Array:
        raise NotImplementedError

    def render_panels(self, variables, batch, rng, num_steps: int = 2) -> dict:
        prepared = self.prepare_batch(batch, rng, train=False)
        src, tgt = prepared[0], prepared[1]
        n = min(self.n_images_log, src.shape[0])
        gen, pred_mask = self.generate(variables, src[:n], num_steps=num_steps)
        panels = {
            "source": denormalize(src[:n]),
            "generated": denormalize(gen),
            "target": denormalize(tgt[:n]),
            "pred_mask": pred_mask.astype(jnp.float32),
        }
        if len(prepared) > 2:
            panels["gt_mask"] = prepared[2].astype(jnp.float32)
        return panels


class MultitaskFlowMatchingModule(SharedBackboneTask):
    """Binary-mask multitask variant: Dice + BCE segmentation head."""

    batch_fields = ("image", "image", "mask")

    def loss_and_metrics(self, variables, batch, rng, train):
        src, tgt, gt_mask = batch[0], batch[1], batch[2]
        fm_rng, _ = jax.random.split(rng)
        t, xt, ut = self.flow_matcher.sample_location_and_conditional_flow(fm_rng, src, tgt)
        vt, seg_logits, var_updates = self._fused_heads(variables, t, xt, src, train=train)

        flow_loss = mse_loss(vt, ut)
        seg_dice = dice_loss(seg_logits, gt_mask)
        seg_bce = bce_with_logits(seg_logits, gt_mask)
        seg_loss = self.dice_weight * seg_dice + (1.0 - self.dice_weight) * seg_bce
        loss = flow_loss + self.seg_loss_weight * seg_loss
        metrics = {
            "loss": loss,
            "flow_loss": flow_loss,
            "seg_loss": seg_loss,
            "seg_dice": seg_dice,
            "seg_bce": seg_bce,
        }
        if not train:
            # Hard-threshold Dice/IoU (ref test_step :370-389) — logged as
            # val/... and test/... by the harness prefixing.
            pred = (jax.nn.sigmoid(seg_logits) > 0.5).astype(jnp.float32)
            gt = gt_mask.astype(jnp.float32)
            inter = jnp.sum(pred * gt)
            union_sum = jnp.sum(pred) + jnp.sum(gt)
            union_or = jnp.sum(jnp.clip(pred + gt, 0.0, 1.0))
            metrics["dice_coef"] = (2.0 * inter + 1e-7) / (union_sum + 1e-7)
            metrics["iou"] = (inter + 1e-7) / (union_or + 1e-7)
        return loss, metrics, var_updates

    def predict_mask(self, seg_logits: jax.Array) -> jax.Array:
        return (jax.nn.sigmoid(seg_logits) > 0.5).astype(jnp.float32)


__all__ = [
    "MultitaskFlowMatchingModule",
    "SharedBackboneTask",
    "_merge_module_vars",
    "_module_vars",
]
