from .postprocess import (dynamic_watershed, hover_post_proc, align_foreground, mudslide_watershed)
from ...datasets.utils.direction import generate_direction_differential_map, label_to_vector

__all__ = [
    'dynamic_watershed', 'hover_post_proc', 'align_foreground', 'mudslide_watershed',
    'generate_direction_differential_map', 'label_to_vector'
]
