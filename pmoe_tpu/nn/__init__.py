from .blocks import MLP, ConvBlock3, ECA, EfficientConvBlock, eca_kernel_size
from .unet import UNet, UNetECA
from .resnet import ResNetBackbone
from .mobilenet import MobileNetBackbone
from .backbone import get_backbone, SegmentationBackbone

__all__ = [
    "MLP", "ConvBlock3", "ECA", "EfficientConvBlock", "eca_kernel_size",
    "UNet", "UNetECA", "ResNetBackbone", "MobileNetBackbone",
    "get_backbone", "SegmentationBackbone",
]
