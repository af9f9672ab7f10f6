"""Multi-host data placement helpers.

The reference shards data across ranks with DistributedSampler + NCCL
gathers (tiseg/datasets/builder.py:74-75, tiseg/apis/test.py:98-104). The
TPU-native equivalents: every process loads its shard
(tiseg_tpu.datasets.EpochSampler), and per-host numpy batches become one
global jax.Array via ``make_array_from_process_local_data``; eval-side
python objects gather via multihost_utils (tiseg_tpu.apis.test).
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_from_local(mesh: Mesh, local_batch: Dict, axis: str = 'data') -> Dict:
    """Assemble per-process local batches into globally-sharded arrays.

    On a single process this is a plain sharded device_put; on multi-host
    each process contributes its local shard of the global batch.
    """
    sharding = NamedSharding(mesh, P(axis))

    def _put(x):
        if not isinstance(x, np.ndarray):
            return x
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(_put, local_batch)


def local_batch_size(global_batch_size: int) -> int:
    world = jax.process_count()
    assert global_batch_size % world == 0, (global_batch_size, world)
    return global_batch_size // world
