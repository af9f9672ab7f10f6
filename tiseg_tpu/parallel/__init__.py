from .mesh import create_mesh, data_sharding, replicated, shard_batch, init_distributed

__all__ = ['create_mesh', 'data_sharding', 'replicated', 'shard_batch', 'init_distributed']
