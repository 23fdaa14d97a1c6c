"""Loss library for the stain-translation task modules.

Pure NHWC JAX functions matching the reference recipes numerically:

- plain CFM MSE                       (ref: src/models/conditional_flow_matching.py:72)
- ROI-upweighted MSE, w = 1 + λ·mask  (ref: conditional_flow_matching_masked.py:76-91)
- ROI Charbonnier                     (ref: conditional_flow_matching_ROI_loss.py:84-95)
- binary Dice + BCE-with-logits       (ref: conditional_flow_matching_multitask.py:29-54,190-194)
- multiclass Dice with ignore_index   (ref: conditional_flow_matching_multitask_multiclassloss.py:31-83)
- softmax cross-entropy w/ ignore_index, per-class Dice/IoU test metrics
  (ref: conditional_flow_matching_multitask_multiclassloss.py:236,449-476)

Losses reduce with global sums (not per-sample means) exactly as the reference
does, so loss magnitudes are comparable across frameworks. All math in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32)


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error over all elements."""
    return jnp.mean(jnp.square(_f32(pred) - _f32(target)))


def roi_weighted_mse(
    pred: jax.Array, target: jax.Array, mask: jax.Array, roi_lambda: float = 10.0
) -> jax.Array:
    """ROI-upweighted MSE: weights w = 1 + λ·mask, loss = Σw·err² / (Σw + 1e-8).

    ``mask``: (B, H, W, 1) in [0, 1]; weights broadcast over channels, and the
    normalizer sums the *broadcast* weights (torch ``expand_as`` semantics).
    """
    pred, target, mask = _f32(pred), _f32(target), _f32(mask)
    weights = 1.0 + roi_lambda * mask  # (B, H, W, 1)
    sq_err = jnp.square(pred - target)  # (B, H, W, C)
    num_channels = pred.shape[-1]
    weighted_sum = jnp.sum(weights * sq_err)
    weight_total = jnp.sum(weights) * num_channels
    return weighted_sum / (weight_total + 1e-8)


def charbonnier(pred: jax.Array, target: jax.Array, eps: float = 1e-3) -> jax.Array:
    diff = _f32(pred) - _f32(target)
    return jnp.sqrt(diff * diff + eps * eps)


def roi_charbonnier(
    pred: jax.Array, target: jax.Array, mask: jax.Array, eps: float = 1e-3
) -> jax.Array:
    """Charbonnier penalty averaged over ROI pixels (× channels)."""
    charb = charbonnier(pred, target, eps)  # (B, H, W, C)
    m = _f32(mask)  # (B, H, W, 1)
    num_channels = pred.shape[-1]
    return jnp.sum(charb * m) / (jnp.sum(m) * num_channels + 1e-8)


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Numerically-stable binary cross entropy on logits, mean-reduced."""
    logits, target = _f32(logits), _f32(target)
    # max(x,0) - x*t + log(1 + exp(-|x|))
    loss = jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def dice_loss(logits: jax.Array, target: jax.Array, smooth: float = 1.0) -> jax.Array:
    """Binary Dice loss over the whole batch (global sums, sigmoid probs)."""
    probs = jax.nn.sigmoid(_f32(logits)).reshape(-1)
    target = _f32(target).reshape(-1)
    intersection = jnp.sum(probs * target)
    dice = (2.0 * intersection + smooth) / (jnp.sum(probs) + jnp.sum(target) + smooth)
    return 1.0 - dice


def multiclass_dice_loss(
    logits: jax.Array,
    target: jax.Array,
    num_classes: int,
    smooth: float = 1.0,
    ignore_index: int = -100,
) -> jax.Array:
    """Multiclass Dice: softmax probs vs one-hot target, global per-class sums.

    ``logits``: (B, H, W, C); ``target``: (B, H, W) integer class ids.
    Pixels equal to ``ignore_index`` are excluded (when ignore_index >= 0).
    """
    probs = jax.nn.softmax(_f32(logits), axis=-1)  # (B, H, W, C)
    tgt = target.astype(jnp.int32)
    # Unlike the reference (which only masks when ignore_index >= 0 and would
    # crash on negative labels in one_hot), ignored pixels are always excluded.
    valid = (tgt != ignore_index).astype(jnp.float32)[..., None]  # (B,H,W,1)
    safe_tgt = jnp.where(tgt == ignore_index, 0, tgt)
    one_hot = jax.nn.one_hot(safe_tgt, num_classes, dtype=jnp.float32)  # (B,H,W,C)
    probs = probs * valid
    one_hot = one_hot * valid
    intersection = jnp.sum(probs * one_hot, axis=(0, 1, 2))  # (C,)
    union = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(one_hot, axis=(0, 1, 2))
    dice_per_class = (2.0 * intersection + smooth) / (union + smooth)
    return 1.0 - jnp.mean(dice_per_class)


def softmax_cross_entropy(
    logits: jax.Array, target: jax.Array, ignore_index: int = -100
) -> jax.Array:
    """Softmax CE with ignore_index, mean over valid pixels (torch semantics)."""
    logits = _f32(logits)
    tgt = target.astype(jnp.int32)
    valid = (tgt != ignore_index).astype(jnp.float32)
    safe_tgt = jnp.where(tgt == ignore_index, 0, tgt)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


# ---------------------------------------------------------------- test metrics
def per_class_dice_iou(
    logits: jax.Array,
    target: jax.Array,
    num_classes: int,
    ignore_index: int = -100,
    eps: float = 1e-7,
) -> tuple[jax.Array, jax.Array]:
    """Hard-argmax per-class Dice and IoU, returning two (C,) arrays."""
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, H, W)
    tgt = target.astype(jnp.int32)
    valid = tgt != ignore_index
    pred_oh = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32) * valid[..., None]
    tgt_oh = (
        jax.nn.one_hot(jnp.where(valid, tgt, 0), num_classes, dtype=jnp.float32)
        * valid[..., None]
    )
    intersection = jnp.sum(pred_oh * tgt_oh, axis=(0, 1, 2))
    pred_sum = jnp.sum(pred_oh, axis=(0, 1, 2))
    tgt_sum = jnp.sum(tgt_oh, axis=(0, 1, 2))
    union = pred_sum + tgt_sum - intersection
    dice = (2.0 * intersection + eps) / (pred_sum + tgt_sum + eps)
    iou = (intersection + eps) / (union + eps)
    return dice, iou


__all__ = [
    "mse_loss",
    "roi_weighted_mse",
    "charbonnier",
    "roi_charbonnier",
    "bce_with_logits",
    "dice_loss",
    "multiclass_dice_loss",
    "softmax_cross_entropy",
    "per_class_dice_iou",
]
