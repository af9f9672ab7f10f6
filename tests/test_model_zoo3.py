"""Smoke tests for the multi-task family (incl. the flag-driven loss zoo)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.models import build_segmentor

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow

HW = 64


def labels(n=2):
    sem = np.zeros((n, HW, HW), np.int32)
    sem[:, 10:30, 10:30] = 1
    sem_wb = sem.copy()
    sem_wb[:, 10:12, 10:30] = 2
    inst = np.zeros((n, HW, HW), np.int32)
    inst[:, 10:30, 10:30] = 1
    dir_gt = np.zeros((n, HW, HW), np.int32)
    dir_gt[:, 10:30, 10:30] = 4
    point = np.zeros((n, HW, HW), np.float32)
    point[:, 20, 20] = 255.0
    return {
        'sem_gt': jnp.asarray(sem),
        'sem_gt_inner': jnp.asarray(sem),
        'sem_gt_w_bound': jnp.asarray(sem_wb),
        'inst_gt': jnp.asarray(inst),
        'dir_gt': jnp.asarray(dir_gt),
        'reg_dir_gt': jnp.asarray(dir_gt.astype(np.float32) * 0.5),
        'point_gt': jnp.asarray(point),
        'dist_gt': jnp.asarray((sem > 0).astype(np.float32)),
        'loss_weight_map': jnp.ones((n, HW, HW)),
    }


def run_case(name, train_cfg, expect_logs=(), test_cfg=None):
    seg = build_segmentor(dict(type=name, num_classes=2, train_cfg=train_cfg,
                               test_cfg=dict(mode='whole', radius=1, **(test_cfg or {}))))
    variables = seg.init_variables(jax.random.PRNGKey(0), hw=(HW, HW))
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, HW, HW, 3)).astype(np.float32)) * 0.1
    batch = {'data': {'img': img}, 'label': labels()}
    total, (logs, _) = seg.loss({'params': variables['params'], 'batch_stats': variables['batch_stats']},
                                batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), logs
    for k in expect_logs:
        assert k in logs, f'{k} missing from {sorted(logs)}'

    fused = jax.jit(seg.inference)(variables, img[:1])
    res = seg.postprocess({k: np.asarray(v[0]) for k, v in fused.items()})
    assert res['inst_pred'].shape == (HW, HW)
    return seg


def test_multi_task_unet():
    run_case('MultiTaskUNet', dict(), ['three_class_ce_loss', 'sem_ce_loss'])


def test_multi_task_cunet():
    seg = run_case('MultiTaskCUNet', dict(), ['three_class_ce_loss', 'sem_dice_loss'])


def test_multi_task_cdnet_default():
    run_case('MultiTaskCDNet', dict(), ['tc_ce_loss', 'mask_ce_loss', 'dir_ce_loss', 'point_mse_loss'],
             test_cfg=dict(if_ddm=True))


def test_multi_task_cdnet_flags():
    run_case('MultiTaskCDNet',
             dict(use_variance=True, use_ac=True, ac_len_weight=1, use_tploss=True, tploss_weight=True,
                  dir_weight_map=True),
             ['mask_ac_loss', 'mask_variance_loss', 'dir_tp_loss'])


def test_multi_task_cdnet_regression_twobranch():
    run_case('MultiTaskCDNet', dict(use_regression=True, use_twobranch=True, use_distance=True),
             ['dir_degree_mse_loss'], test_cfg=dict(if_ddm=True))


def test_multi_task_cdnet_sigmoid_focal():
    run_case('MultiTaskCDNet', dict(use_sigmoid=True), ['mask_bce_loss'])
    run_case('MultiTaskCDNet', dict(use_focal=True), ['mask_focal_loss'])
