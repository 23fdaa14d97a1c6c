"""Model zoo: ADM UNet velocity net, shared-encoder multitask family, demos."""

from .segmentation_unet import SegmentationUNet
from .shared_encoder import DoubleConv, Norm2d, SharedEncoder, TimeEmbedding
from .simple_dense_net import SimpleDenseNet
from .task_decoders import FlowMatchingDecoder, SegmentationDecoder, Up
from .unet import AttentionBlock, ResBlock, UNetModel
from .unet_4to3 import UNet4to3

__all__ = [
    "AttentionBlock",
    "DoubleConv",
    "FlowMatchingDecoder",
    "Norm2d",
    "ResBlock",
    "SegmentationDecoder",
    "SegmentationUNet",
    "SharedEncoder",
    "SimpleDenseNet",
    "TimeEmbedding",
    "UNet4to3",
    "UNetModel",
    "Up",
]
