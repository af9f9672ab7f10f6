from .sliding import (split_inference, tta_forward_views, tta_transform, reverse_tta_transform, tta_views,
                      resize_bilinear, chunked_apply, grid_offsets)
from .ddm import generate_direction_differential_map, label_to_vector, angle_to_dir_class, regression_to_dir_map
from .ccl import connected_components, compact_labels, label, instance_postprocess_device
from .morph import (disk_offsets, diamond_offsets, square_offsets, grey_dilation, grey_erosion, binary_dilation,
                    binary_erosion, binary_fill_holes, remove_small_objects_labeled)

__all__ = [
    'split_inference', 'tta_transform', 'reverse_tta_transform', 'tta_views', 'resize_bilinear', 'chunked_apply',
    'grid_offsets', 'generate_direction_differential_map', 'label_to_vector', 'angle_to_dir_class',
    'regression_to_dir_map', 'connected_components', 'compact_labels', 'label', 'instance_postprocess_device',
    'disk_offsets', 'diamond_offsets', 'square_offsets', 'grey_dilation', 'grey_erosion', 'binary_dilation',
    'binary_erosion', 'binary_fill_holes', 'remove_small_objects_labeled'
]
