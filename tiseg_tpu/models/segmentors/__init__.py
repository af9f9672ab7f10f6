from .base import BaseSegmentor, parse_losses
from .unet import UNet, instance_postprocess
from .unet_s2d import UNetS2D
from .cunet import CUNet
from .dcan import DCAN
from .fullnet import FullNet
from .dist import DIST
from .hovernet import HoverNet
from .micronet import MicroNet, CMicroNet
from .cdnet import CDNet
from .multi_task_unet import MultiTaskCUNet, MultiTaskCUNetDebug, MultiTaskUNet
from .multi_task_cdnet import MultiTaskCDNet, MultiTaskCDNetDebug

__all__ = [
    'BaseSegmentor', 'parse_losses', 'UNet', 'UNetS2D', 'instance_postprocess', 'CUNet', 'DCAN', 'FullNet', 'DIST', 'HoverNet',
    'MicroNet', 'CMicroNet', 'CDNet', 'MultiTaskUNet', 'MultiTaskCUNet', 'MultiTaskCDNet', 'MultiTaskCDNetDebug', 'MultiTaskCUNetDebug'
]
