from .sliding import (split_inference, tta_transform, reverse_tta_transform, tta_views, resize_bilinear,
                      chunked_apply, grid_offsets)

__all__ = [
    'split_inference', 'tta_transform', 'reverse_tta_transform', 'tta_views', 'resize_bilinear', 'chunked_apply',
    'grid_offsets'
]
