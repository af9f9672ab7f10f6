"""Smoke tests for CDNet and MicroNet/CMicroNet (252x252 valid-conv sizes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.models import build_segmentor

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


def test_cdnet_smoke():
    HW = 64
    seg = build_segmentor(dict(type='CDNet', num_classes=2, train_cfg=dict(if_weighted_loss=True),
                               test_cfg=dict(mode='whole', radius=3, if_ddm=True,
                                             rotate_degrees=[0, 90], flip_directions=['none'])))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(HW, HW))
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, HW, HW, 3)).astype(np.float32)) * 0.1
    heads = seg.forward_heads(variables, img)
    assert heads['sem'].shape == (2, HW, HW, 3)
    assert heads['dir'].shape == (2, HW, HW, 9)
    assert heads['point'].shape == (2, HW, HW, 1)

    sem_wb = np.zeros((2, HW, HW), np.int32)
    sem_wb[:, 20:40, 20:40] = 1
    sem_wb[:, 20:22, 20:40] = 2
    dir_gt = np.zeros((2, HW, HW), np.int32)
    dir_gt[:, 20:40, 20:40] = 5
    point = np.zeros((2, HW, HW), np.float32)
    point[:, 30, 30] = 255.0
    batch = {
        'data': {'img': img},
        'label': {
            'sem_gt_w_bound': jnp.asarray(sem_wb),
            'dir_gt': jnp.asarray(dir_gt),
            'point_gt': jnp.asarray(point),
            'loss_weight_map': jnp.ones((2, HW, HW)),
        },
    }

    def loss_fn(params):
        total, (logs, _) = seg.loss({'params': params, 'batch_stats': variables['batch_stats']}, batch,
                                    rng=jax.random.PRNGKey(1))
        return total, logs

    (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables['params'])
    assert np.isfinite(float(total))
    assert 'dir_ce_loss' in logs and 'point_mse_loss' in logs
    gnorm = jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(jnp.abs(x)), grads, 0.0)
    assert float(gnorm) > 0

    fused = jax.jit(seg.inference)(variables, img[:1])
    assert fused['sem'].shape == (1, HW, HW, 3)
    assert fused['dir_map'].shape == (1, HW, HW)
    res = seg.postprocess({k: np.asarray(v[0]) for k, v in fused.items()})
    assert res['inst_pred'].shape == (HW, HW)


def test_ddm_jax_matches_numpy():
    from tiseg_tpu.ops.ddm import generate_direction_differential_map as ddm_jax
    from tiseg_tpu.datasets.utils.direction import generate_direction_differential_map as ddm_np
    rng = np.random.default_rng(0)
    dir_map = rng.integers(0, 9, (1, 32, 32))
    out_j = np.asarray(ddm_jax(jnp.asarray(dir_map), 9))
    out_n = ddm_np(dir_map, 9)
    np.testing.assert_allclose(out_j, out_n, atol=1e-5)


@pytest.mark.slow
def test_micronet_smoke():
    HW = 252
    seg = build_segmentor(dict(type='MicroNet', num_classes=2, train_cfg=dict(),
                               test_cfg=dict(mode='whole', radius=1)))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(HW, HW))
    img = jnp.zeros((1, HW, HW, 3), jnp.float32)
    heads = seg.forward_heads(variables, img)
    assert heads['sem'].shape == (1, HW, HW, 2)

    sem = np.zeros((1, HW, HW), np.int32)
    sem[:, 40:80, 40:80] = 1
    batch = {'data': {'img': img},
             'label': {'sem_gt_inner': jnp.asarray(sem), 'loss_weight_map': jnp.ones((1, HW, HW))}}
    total, (logs, _) = seg.loss({'params': variables['params'], 'batch_stats': variables['batch_stats']}, batch,
                                rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    assert 'sem_ce_loss_aux3' in logs


@pytest.mark.slow
def test_cmicronet_head_channels():
    seg = build_segmentor(dict(type='CMicroNet', num_classes=2, train_cfg=dict(), test_cfg=dict(mode='whole')))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(252, 252))
    heads = seg.forward_heads(variables, jnp.zeros((1, 252, 252, 3)))
    assert heads['sem'].shape[-1] == 3  # num_classes + boundary
