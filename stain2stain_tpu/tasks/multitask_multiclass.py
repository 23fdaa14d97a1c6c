"""Multitask multiclass flow matching + segmentation (shared encoder).

TPU re-design of the multiclass ``MultiTaskFlowMatchingLitModule``
(/root/reference/src/models/conditional_flow_matching_multitask_multiclassloss.py:86-573):
same shared-backbone architecture as :mod:`.multitask` but with a C-class
segmentation head, ``L_FM + α·(w·MulticlassDice + (1−w)·CE)`` with
``ignore_index`` support (ref :31-83,236,288), per-class Dice/IoU eval metrics
(ref :449-476), and ``generate`` returning ``(ihc, argmax-mask)`` (ref :506-573).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stain2stain_tpu.ops.losses import (
    mse_loss,
    multiclass_dice_loss,
    per_class_dice_iou,
    softmax_cross_entropy,
)

from .multitask import SharedBackboneTask


class MultitaskMulticlassFlowMatchingModule(SharedBackboneTask):
    batch_fields = ("image", "image", "class_mask")

    def __init__(self, *args, num_classes: int = 2, ignore_index: int = -100, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_classes = num_classes
        self.ignore_index = ignore_index

    def loss_and_metrics(self, variables, batch, rng, train):
        src, tgt, gt_mask = batch[0], batch[1], batch[2]  # gt_mask: (B, H, W) int32
        fm_rng, _ = jax.random.split(rng)
        t, xt, ut = self.flow_matcher.sample_location_and_conditional_flow(fm_rng, src, tgt)
        vt, seg_logits, var_updates = self._fused_heads(variables, t, xt, src, train=train)

        flow_loss = mse_loss(vt, ut)
        seg_dice = multiclass_dice_loss(
            seg_logits, gt_mask, self.num_classes, ignore_index=self.ignore_index
        )
        seg_ce = softmax_cross_entropy(seg_logits, gt_mask, ignore_index=self.ignore_index)
        seg_loss = self.dice_weight * seg_dice + (1.0 - self.dice_weight) * seg_ce
        loss = flow_loss + self.seg_loss_weight * seg_loss
        metrics = {
            "loss": loss,
            "flow_loss": flow_loss,
            "seg_loss": seg_loss,
            "seg_dice": seg_dice,
            "seg_ce": seg_ce,
        }
        if not train:
            dice_c, iou_c = per_class_dice_iou(
                seg_logits, gt_mask, self.num_classes, ignore_index=self.ignore_index
            )
            metrics["dice_coef"] = jnp.mean(dice_c)
            metrics["iou"] = jnp.mean(iou_c)
        return loss, metrics, var_updates

    def predict_mask(self, seg_logits: jax.Array) -> jax.Array:
        return jnp.argmax(seg_logits, axis=-1).astype(jnp.int32)


__all__ = ["MultitaskMulticlassFlowMatchingModule"]
