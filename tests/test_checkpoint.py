"""Checkpoint manager: periodic save / auto-resume / best-copy, and the
tools/test.py restore path."""
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tiseg_tpu.engine.checkpoint import CheckpointManager
from tiseg_tpu.engine.train_state import TrainState
from tiseg_tpu.models import build_segmentor

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), 'tools'))


@pytest.fixture(scope='module')
def seg_state():
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    tx = optax.adam(1e-3)
    state = TrainState.create(variables['params'], variables['batch_stats'], tx)
    return seg, state


def tree_equal(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(leaves_a, leaves_b))


def test_save_restore_roundtrip(tmp_path, seg_state):
    seg, state = seg_state
    mgr = CheckpointManager(str(tmp_path), max_keep=2)
    state = state.replace(step=jnp.int32(7))
    mgr.save(7, state)
    assert mgr.latest_step() == 7

    fresh = TrainState.create(jax.tree_util.tree_map(jnp.zeros_like, state.params),
                              jax.tree_util.tree_map(jnp.zeros_like, state.batch_stats), state.tx)
    restored, step = mgr.restore(fresh)
    assert step == 7
    assert int(restored.step) == 7
    assert tree_equal(restored.params, state.params)


def test_max_keep(tmp_path, seg_state):
    seg, state = seg_state
    mgr = CheckpointManager(str(tmp_path), max_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, state.replace(step=jnp.int32(s)))
    assert mgr.latest_step() == 3


def test_save_best_and_cli_restore(tmp_path, seg_state):
    seg, state = seg_state
    mgr = CheckpointManager(str(tmp_path), max_keep=2)
    mgr.save_best(state, 'Aji', 61.2)
    assert osp.isdir(osp.join(str(tmp_path), 'checkpoints', 'best'))

    from test import load_variables  # tools/test.py
    variables = load_variables(osp.join(str(tmp_path), 'checkpoints', 'best'), seg, hw=(64, 64))
    assert tree_equal(variables['params'], state.params)
    assert tree_equal(variables['batch_stats'], state.batch_stats)
