from .unet_head import UNetHead, UNetLayer
from .cd_head import CDHead, DGM, RU, AU

__all__ = ['UNetHead', 'UNetLayer', 'CDHead', 'DGM', 'RU', 'AU']
