"""On-device AJI/PQ/semantic pre-eval vs the host numpy implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.ops.inst_metrics_jax import (pre_eval_bin_aji_device, pre_eval_bin_pq_device, sem_confusion_device)
from tiseg_tpu.utils.metrics import pre_eval_all_semantic_metric, pre_eval_bin_aji, pre_eval_bin_pq
from tiseg_tpu.utils.morphology import label as cc_label

from test_inst_metrics import random_blobs


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
