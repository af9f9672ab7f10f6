"""UNet-S2D variant: flax/executor parity, int8 path, pred-path equality.

The variant is a numerics-changing performance model (no reference
analog; docs/ROUND5.md) selected only via bench.py's held-out accuracy
gate — these tests pin the EXECUTORS against the flax definition, not
against the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.models import build_segmentor
from tiseg_tpu.models.segmentors.base import BaseSegmentor
from tiseg_tpu.models.segmentors.unet_s2d import d2s2, s2d2


@pytest.fixture(scope='module')
def seg_and_vars():
    seg = build_segmentor(dict(type='UNetS2D', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', device_postprocess=True, radius=1)))
    v = seg.init_variables(jax.random.PRNGKey(0), hw=(64, 64))
    img = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))
    return seg, v, img


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).random((2, 8, 8, 3), np.float32))
    np.testing.assert_array_equal(np.asarray(d2s2(s2d2(x))), np.asarray(x))


def test_fast_executor_matches_flax(seg_and_vars):
    seg, v, img = seg_and_vars
    seg.test_cfg['int8_eval'] = False
    ref = BaseSegmentor.forward_heads(seg, v, img)['sem']
    fast = seg.forward_heads(v, img)['sem']
    assert fast.shape == (2, 64, 64, 2)
    np.testing.assert_allclose(np.asarray(fast, np.float32), np.asarray(ref, np.float32),
                               atol=2e-5, rtol=1e-5)


def test_loss_and_grad(seg_and_vars):
    seg, v, img = seg_and_vars
    batch = {'data': {'img': img},
             'label': {'sem_gt_inner': jnp.zeros((2, 64, 64), jnp.int32),
                       'loss_weight_map': jnp.ones((2, 64, 64), jnp.float32)}}
    def f(p):
        total, _ = seg.loss({'params': p, 'batch_stats': v['batch_stats']}, batch,
                            rng=jax.random.PRNGKey(0))
        return total
    g = jax.grad(f)(v['params'])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


@pytest.mark.slow
def test_int8_resident_and_pred_path(seg_and_vars):
    seg, v, img = seg_and_vars
    seg.test_cfg['int8_eval'] = False
    fast = seg.forward_heads(v, img)['sem']
    seg.calibrate_int8(v, img)
    seg.test_cfg['int8_eval'] = True
    q = seg.forward_heads(v, img)['sem']
    # int8 rounding stays small on logits at init-scale activations
    diff = float(jnp.max(jnp.abs(q.astype(jnp.float32) - fast.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(fast.astype(jnp.float32)))) + 1e-6
    assert diff / scale < 0.15, (diff, scale)
    # pred executor == argmax of the logits executor, bit-exact
    from tiseg_tpu.models.heads.s2d_exec import apply_s2d_q8
    prep = seg.prepare_inference(v)
    pred_exec = apply_s2d_q8(prep['s2d'], prep['int8'], img, dtype=seg.net.dtype, out='pred')
    np.testing.assert_array_equal(np.asarray(pred_exec),
                                  np.asarray(jnp.argmax(q, axis=-1).astype(jnp.int32)))
    out = seg.inference_and_postprocess(v, img)
    assert out['sem_pred'].shape == (2, 64, 64) and out['inst_pred'].shape == (2, 64, 64)
    seg.test_cfg['int8_eval'] = False
