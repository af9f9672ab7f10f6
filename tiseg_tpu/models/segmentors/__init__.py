from .base import BaseSegmentor, parse_losses
from .unet import UNet, instance_postprocess

__all__ = ['BaseSegmentor', 'parse_losses', 'UNet', 'instance_postprocess']
