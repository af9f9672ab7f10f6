"""Native C++ label-map kernels vs the numpy implementations."""
import numpy as np
import pytest

from tiseg_tpu import native
from tiseg_tpu.datasets.ops.label_maps import UNetLabelMake, instance_boxes, _pad_slices
from tiseg_tpu.datasets.utils.instance import fix_instance as np_fix_instance
from tiseg_tpu.utils import morphology as m

pytestmark = pytest.mark.skipif(not native.HAS_NATIVE, reason='no native toolchain')


def blobs(seed, hw=128, n=25):
    rng = np.random.default_rng(seed)
    inst = np.zeros((hw, hw), np.int32)
    yy, xx = np.ogrid[:hw, :hw]
    for k in range(1, n + 1):
        cy, cx = rng.integers(0, hw, 2)
        r = rng.integers(2, 8)
        inst[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = k
    # sprinkle tiny fragments + duplicated ids with disconnected parts
    inst[rng.random((hw, hw)) < 0.002] = 7
    return inst


def partitions_equal(a, b):
    assert ((a > 0) == (b > 0)).all()
    pairs = set(zip(a[a > 0].tolist(), b[a > 0].tolist()))
    return (len(pairs) == len({x for x, _ in pairs}) == len({y for _, y in pairs}))


@pytest.mark.parametrize('seed', [0, 1, 5])
def test_fix_instance_native(seed):
    inst = blobs(seed)
    want = np_fix_instance(inst)
    got = native.fix_instance(inst)
    assert got is not None
    assert partitions_equal(want, got)
    # same fragment filtering
    np.testing.assert_array_equal(got > 0, want > 0)


@pytest.mark.parametrize('seed', [0, 3])
def test_remove_1px_boundary_native(seed):
    inst = np_fix_instance(blobs(seed))
    lm = UNetLabelMake()
    want = lm._remove_1px_boundary(inst)
    got = native.remove_1px_boundary(inst)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('seed', [0, 3])
def test_unet_weight_map_native(seed):
    inst = np_fix_instance(blobs(seed))
    lm = UNetLabelMake()
    inner = lm._remove_1px_boundary(inst)  # ids may be sparse (eroded away)
    ids = list(np.unique(inner)[1:]) if inner.max() else []
    want = lm._get_weight_map(inner, ids)
    got = native.unet_weight_map(inner, int(inner.max()), lm.TRUNC, lm.w0, lm.sigma)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('seed,r0,r1', [(0, 3, 3), (3, 1, 1), (4, 2, 4)])
def test_bound_map_native(seed, r0, r1):
    inst = np_fix_instance(blobs(seed))
    # numpy oracle: the BoundLabelMake inner loop
    want = np.zeros(inst.shape, bool)
    d0, d1 = m.diamond(r0), m.diamond(r1)
    pad = max(r0, r1) + 1
    for inst_id, sl in instance_boxes(inst):
        view = _pad_slices(sl, pad, inst.shape)
        mask = inst[view] == inst_id
        bound = m.dilation(mask, d0) & (~m.erosion(mask, d1))
        want[view] |= bound
    got = native.bound_map(inst, r0, r1)
    np.testing.assert_array_equal(got, want)
