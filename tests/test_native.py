"""Native C++ post-processing kernels vs their numpy twins."""
import numpy as np
import pytest

from tiseg_tpu import native
from tiseg_tpu.datasets.utils.center import calculate_centerpoint as center_np
from tiseg_tpu.models.utils.postprocess import align_foreground as align_np
from tiseg_tpu.utils.morphology import label as label_np

pytestmark = pytest.mark.skipif(not native.HAS_NATIVE, reason='no C++ toolchain')


def test_align_foreground_matches_numpy_partition():
    rng = np.random.default_rng(0)
    fore = rng.random((64, 64)) > 0.4
    pred = np.zeros((64, 64), np.int32)
    pred[10, 10] = 1
    pred[40, 40] = 2
    fore[10, 10] = fore[40, 40] = True
    out_c = native.align_foreground(pred.copy(), fore, 20)
    out_np = align_np(pred.copy(), fore, 20)
    # same coverage; tie-break on contested frontier pixels may differ
    np.testing.assert_array_equal(out_c > 0, out_np > 0)
    disagree = (out_c != out_np) & (out_c > 0)
    assert disagree.mean() < 0.05


def test_centerpoint_matches_numpy():
    yy, xx = np.ogrid[:32, :32]
    mask = (((yy - 14)**2 / 49) + ((xx - 18)**2 / 25) <= 1).astype(np.uint8)
    assert native.calculate_centerpoint(mask) == center_np(mask)


def test_label_cc8_matches_host():
    rng = np.random.default_rng(1)
    mask = rng.random((96, 96)) > 0.7
    out_c, n_c = native.label_cc8(mask)
    out_np = label_np(mask, connectivity=2)
    assert n_c == out_np.max()
    np.testing.assert_array_equal(out_c, out_np)
