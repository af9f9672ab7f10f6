"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL/DDP stack
(tiseg/apis/train.py:83-97, configs/_base_/default_runtime.py:4): a 1-axis
``data`` mesh over all devices; batches are sharded over it, parameters are
replicated, and XLA inserts the gradient psum — there is no hand-written
communication. Multi-host entry is ``jax.distributed.initialize`` +
per-host data sharding (tiseg_tpu.parallel.data).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_names: Sequence[str] = ('data',), shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def data_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Batch-dim sharding for (B, ...) arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = 'data'):
    """Device-put a host batch pytree with the batch dim sharded over the
    mesh; metas (non-array leaves) pass through untouched. Multi-process:
    each process's loader supplies its LOCAL share of the global batch, so
    arrays assemble via ``make_array_from_process_local_data`` (a plain
    sharded device_put would demand the full global batch per process —
    caught by the real 2-process run in tests/test_distributed.py)."""
    ds = data_sharding(mesh, axis)
    multi = jax.process_count() > 1

    def _put(x):
        if not isinstance(x, np.ndarray):
            return x
        if multi:
            return jax.make_array_from_process_local_data(ds, x)
        return jax.device_put(x, ds)

    return jax.tree_util.tree_map(_put, batch)


def init_distributed(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host entry (`jax.distributed.initialize`); no-op for single
    process. The reference analog is mmcv ``init_dist`` (tools/train.py:84)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address, num_processes=num_processes,
                                   process_id=process_id)
