"""Fused device eval (inference + pallas post-processing in one jit) must
partition-match the host post-processing path."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from tiseg_tpu.models import build_segmentor

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, 'pallas_call', functools.partial(pl.pallas_call, interpret=True))
    yield


def test_unet_fused_eval_matches_host():
    # untrained-net argmax is speckle: maze-like geodesics need a large
    # sweep budget for exactness (real predictions are blob-like; the
    # defaults cover those — see tests/test_pallas_sweep.py)
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', radius=1, device_postprocess=True,
                                             pp_sweeps=64, pp_fill_sweeps=32)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32))

    out = seg.inference_and_postprocess(variables, img)
    assert out is not None
    dev_sem = np.asarray(out['sem_pred'][0])
    dev_inst = np.asarray(out['inst_pred'][0])

    seg.test_cfg['device_postprocess'] = False
    fused = seg.inference(variables, img)
    host = seg.postprocess({k: np.asarray(v[0]) for k, v in fused.items()})

    np.testing.assert_array_equal(dev_sem, host['sem_pred'])
    # partitions equal up to renaming
    assert ((dev_inst > 0) == (host['inst_pred'] > 0)).all()
    pairs = set(zip(host['inst_pred'][dev_inst > 0], dev_inst[dev_inst > 0]))
    assert len(pairs) == len({a for a, _ in pairs}) == len({b for _, b in pairs})


def test_fused_disabled_returns_none():
    seg = build_segmentor(dict(type='UNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    assert seg.inference_and_postprocess(variables, jnp.zeros((1, 64, 64, 3))) is None


def _partition_match(dev_inst, host_inst):
    assert ((dev_inst > 0) == (host_inst > 0)).all()
    pairs = set(zip(host_inst[dev_inst > 0], dev_inst[dev_inst > 0]))
    assert len(pairs) == len({a for a, _ in pairs}) == len({b for _, b in pairs})


def test_dcan_fused_eval_matches_host():
    seg = build_segmentor(dict(type='DCAN', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', radius=3, device_postprocess=True,
                                             pp_sweeps=64, pp_fill_sweeps=32)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32))

    out = seg.inference_and_postprocess(variables, img)
    assert out is not None
    seg.test_cfg['device_postprocess'] = False
    fused = seg.inference(variables, img)
    host = seg.postprocess({k: np.asarray(v[0]) for k, v in fused.items()})
    np.testing.assert_array_equal(np.asarray(out['sem_pred'][0]), host['sem_pred'])
    _partition_match(np.asarray(out['inst_pred'][0]), host['inst_pred'])


def test_dist_fused_eval_runs():
    seg = build_segmentor(dict(type='DIST', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', device_postprocess=True)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    img = jnp.asarray(np.random.default_rng(2).normal(size=(1, 64, 64, 3)).astype(np.float32)) * 0.1
    out = seg.inference_and_postprocess(variables, img)
    assert out is not None
    assert out['sem_pred'].shape == (1, 64, 64)
    assert out['inst_pred'].shape == (1, 64, 64)
    assert out['inst_pred'].dtype == jnp.int32
    # device-ws equivalence to the host pipeline is pinned separately in
    # tests/test_dist_ws_device.py (ridge placement may differ by a pixel)


@pytest.mark.parametrize('typ', ['MultiTaskUNet', 'MultiTaskCUNet', 'MultiTaskCDNet'])
def test_multitask_fused_eval_matches_host(typ, monkeypatch):
    # pin the host to the numpy wave align_foreground (same simultaneous-
    # wave max-id tie-break the device kernel implements; the native BFS
    # twin breaks equidistant ties by queue order instead)
    import tiseg_tpu.native as native

    def _no_native(*a, **kw):
        raise RuntimeError('force numpy path')

    monkeypatch.setattr(native, 'align_foreground', _no_native, raising=False)

    seg = build_segmentor(dict(type=typ, num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', device_postprocess=True,
                                             pp_sweeps=64, pp_fill_sweeps=32)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    img = jnp.asarray(np.random.default_rng(3).normal(size=(1, 64, 64, 3)).astype(np.float32))

    out = seg.inference_and_postprocess(variables, img)
    assert out is not None
    seg.test_cfg['device_postprocess'] = False
    fused = seg.inference(variables, img)
    host = seg.postprocess({k: np.asarray(v[0]) for k, v in fused.items()})
    np.testing.assert_array_equal(np.asarray(out['sem_pred'][0]), host['sem_pred'])
    _partition_match(np.asarray(out['inst_pred'][0]), host['inst_pred'].astype(np.int32))


def test_hovernet_fused_eval_runs():
    seg = build_segmentor(dict(type='HoverNet', num_classes=3, train_cfg=dict(),
                               test_cfg=dict(mode='whole', device_postprocess=True)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)) * 0.1
    out = seg.inference_and_postprocess(variables, img)
    assert out is not None
    assert out['sem_pred'].shape == (1, 64, 64)
    assert out['inst_pred'].dtype == jnp.int32
    # scale_factor != 1 falls back to the host path
    seg.test_cfg['scale_factor'] = 2
    assert seg.inference_and_postprocess(variables, img) is None
