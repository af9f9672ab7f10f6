from .unet_head import UNetHead, UNetLayer
from .cd_head import CDHead, DGM, RU, AU
from .multi_task_heads import MultiTaskUNetHead, MultiTaskCDHead, MultiTaskCDHeadTwobranch, MultiTaskBranches

__all__ = [
    'UNetHead', 'UNetLayer', 'CDHead', 'DGM', 'RU', 'AU', 'MultiTaskUNetHead', 'MultiTaskCDHead',
    'MultiTaskCDHeadTwobranch', 'MultiTaskBranches'
]
