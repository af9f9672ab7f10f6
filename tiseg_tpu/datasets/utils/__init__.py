from .center import calculate_centerpoint
from .gradient import calculate_gradient, sobel_kernels
from .direction import (LABEL_TO_VECTOR, align_angle, angle_to_vector, angle_to_direction_label, vector_to_label,
                        label_to_vector, generate_direction_differential_map, get_dir_from_inst)
from .instance import (re_instance, fix_instance, convert_instance_to_semantic, get_tc_from_inst, to_one_hot,
                       assign_sem_class_to_insts)

__all__ = [
    'calculate_centerpoint', 'calculate_gradient', 'sobel_kernels', 'LABEL_TO_VECTOR', 'align_angle',
    'angle_to_vector', 'angle_to_direction_label', 'vector_to_label', 'label_to_vector',
    'generate_direction_differential_map', 'get_dir_from_inst', 're_instance', 'fix_instance',
    'convert_instance_to_semantic', 'get_tc_from_inst', 'to_one_hot', 'assign_sem_class_to_insts'
]
