from .train import train_segmentor, init_random_seed
from .test import single_device_test, multi_process_test, gather_object_shards, InferenceRunner

__all__ = [
    'train_segmentor', 'init_random_seed', 'single_device_test', 'multi_process_test', 'gather_object_shards',
    'InferenceRunner'
]
