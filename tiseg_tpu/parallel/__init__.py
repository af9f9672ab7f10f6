from .mesh import create_mesh, data_sharding, replicated, shard_batch, init_distributed
from .data import global_batch_from_local, local_batch_size

__all__ = [
    'create_mesh', 'data_sharding', 'replicated', 'shard_batch', 'init_distributed', 'global_batch_from_local',
    'local_batch_size'
]
