"""Core compute ops: CFM path sampling, losses, ODE solvers, image ops."""

from .cfm import ConditionalFlowMatcher, TargetConditionalFlowMatcher
from .image import center_resize, denormalize, normalize_uint8, paired_random_crop_flip
from .losses import (
    bce_with_logits,
    charbonnier,
    dice_loss,
    mse_loss,
    multiclass_dice_loss,
    per_class_dice_iou,
    roi_charbonnier,
    roi_weighted_mse,
    softmax_cross_entropy,
)
from .metrics import FeatureExtractor, evaluate_quality, fid, psnr, ssim
from .pallas_attention import attention, fused_attention
from .s2b_conv import space_to_batch_conv
from .solvers import integrate, odeint_dopri5, odeint_fixed
from .time_embedding import timestep_embedding_adm, timestep_embedding_sincos

__all__ = [
    "ConditionalFlowMatcher",
    "TargetConditionalFlowMatcher",
    "FeatureExtractor",
    "attention",
    "fused_attention",
    "evaluate_quality",
    "fid",
    "psnr",
    "ssim",
    "bce_with_logits",
    "center_resize",
    "charbonnier",
    "denormalize",
    "dice_loss",
    "integrate",
    "mse_loss",
    "multiclass_dice_loss",
    "normalize_uint8",
    "odeint_dopri5",
    "odeint_fixed",
    "paired_random_crop_flip",
    "per_class_dice_iou",
    "roi_charbonnier",
    "roi_weighted_mse",
    "softmax_cross_entropy",
    "timestep_embedding_adm",
    "timestep_embedding_sincos",
]
