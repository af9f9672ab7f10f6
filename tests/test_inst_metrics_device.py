"""On-device AJI/PQ/semantic pre-eval vs the host numpy implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.ops.inst_metrics_jax import (pre_eval_bin_aji_device, pre_eval_bin_pq_device, sem_confusion_device)
from tiseg_tpu.utils.metrics import pre_eval_all_semantic_metric, pre_eval_bin_aji, pre_eval_bin_pq
from tiseg_tpu.utils.morphology import label as cc_label

from test_inst_metrics import random_blobs

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_aji_device_matches_host(seed):
    rng = np.random.default_rng(seed)
    gt = cc_label(random_blobs(rng))
    pred = cc_label(random_blobs(rng))
    i_h, u_h = pre_eval_bin_aji(pred, gt)
    i_d, u_d = pre_eval_bin_aji_device(jnp.asarray(pred), jnp.asarray(gt))
    assert float(i_d) == pytest.approx(i_h)
    assert float(u_d) == pytest.approx(u_h)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_pq_device_matches_host(seed):
    rng = np.random.default_rng(seed)
    gt = cc_label(random_blobs(rng))
    pred = cc_label(random_blobs(rng))
    tp, fp, fn, iou = pre_eval_bin_pq(pred, gt)
    tpd, fpd, fnd, ioud = pre_eval_bin_pq_device(jnp.asarray(pred), jnp.asarray(gt))
    assert (float(tpd), float(fpd), float(fnd)) == (tp, fp, fn)
    assert float(ioud) == pytest.approx(iou, abs=1e-4)


def test_aji_device_empty():
    z = jnp.zeros((32, 32), jnp.int32)
    g = z.at[4:10, 4:10].set(1)
    i, u = pre_eval_bin_aji_device(z, g)
    assert float(i) == 0.0 and float(u) == 0.0


def test_sem_confusion_device():
    rng = np.random.default_rng(3)
    pred = rng.integers(0, 3, (64, 64))
    gt = rng.integers(0, 3, (64, 64))
    dev = sem_confusion_device(jnp.asarray(pred), jnp.asarray(gt), 3)
    host = pre_eval_all_semantic_metric(pred, gt, 3, reduce_zero_label=False)
    for d, h in zip(dev, host):
        np.testing.assert_allclose(np.asarray(d), h)


def test_pre_eval_all_device_matches_host_package():
    """The fused on-device pre-eval (relabel + confusion + AJI + PQ) must
    produce the same per-image package as CustomDataset.pre_eval's host
    numpy path, including for non-contiguous (min-index) labels."""
    import jax.numpy as jnp
    from tiseg_tpu.ops.inst_metrics_jax import pre_eval_all_device
    from tiseg_tpu.utils.metrics.inst_metrics import pre_eval_bin_aji, pre_eval_bin_pq
    from tiseg_tpu.utils.metrics.sem_metrics import pre_eval_all_semantic_metric
    from tiseg_tpu.datasets.utils import re_instance

    rng = np.random.default_rng(0)
    hw = 96
    inst_gt = np.zeros((hw, hw), np.int32)
    inst_pred = np.zeros((hw, hw), np.int32)
    yy, xx = np.ogrid[:hw, :hw]
    for k in range(30):
        cy, cx = rng.integers(6, hw - 6, 2)
        r = rng.integers(2, 6)
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        inst_gt[m] = k + 1
        jy, jx = rng.integers(-2, 3, 2)
        m2 = (yy - cy - jy) ** 2 + (xx - cx - jx) ** 2 <= r * r
        # non-contiguous, min-index-style pred labels
        inst_pred[m2] = cy * hw + cx + 1
    sem_gt = (inst_gt > 0).astype(np.int32)
    sem_pred = (inst_pred > 0).astype(np.int32)

    sem, aji, pq = pre_eval_all_device(jnp.asarray(sem_pred), jnp.asarray(inst_pred),
                                       jnp.asarray(sem_gt), jnp.asarray(inst_gt), num_classes=2)
    want_sem = pre_eval_all_semantic_metric(sem_pred.astype(np.uint8), sem_gt.astype(np.uint8), 2)
    want_aji = pre_eval_bin_aji(re_instance(inst_pred), re_instance(inst_gt))
    want_pq = pre_eval_bin_pq(re_instance(inst_pred), re_instance(inst_gt))

    for got, want in zip(sem, want_sem):
        # host package is reduce_zero_label'd (classes 1..C-1)
        np.testing.assert_allclose(np.asarray(got)[1:], np.asarray(want), rtol=1e-6)
    np.testing.assert_allclose([float(x) for x in aji], [float(np.sum(x)) for x in want_aji], rtol=1e-4)
    np.testing.assert_allclose([float(x) for x in pq], [float(np.sum(x)) for x in want_pq], rtol=1e-6)
