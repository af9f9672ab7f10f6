"""Native C++ label-map kernels vs the numpy implementations."""
import numpy as np
import pytest

from tiseg_tpu import native
from tiseg_tpu.datasets.ops.label_maps import DirectionLabelMake, UNetLabelMake, instance_boxes, _pad_slices
from tiseg_tpu.datasets.utils.center import calculate_centerpoint as np_centerpoint
from tiseg_tpu.datasets.utils.direction import LABEL_TO_VECTOR
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
def test_unet_weight_map_native(seed, monkeypatch):
    """Native banded EDT vs the pure-numpy twin (native disabled for the
    oracle): same float64 dtype, same banding radius — the raw maps agree
    to exp()-implementation noise and the CONSUMED float32(1 + w) value is
    bit-equal."""
    inst = np_fix_instance(blobs(seed))
    lm = UNetLabelMake()
    inner = lm._remove_1px_boundary(inst)  # ids may be sparse (eroded away)
    ids = list(np.unique(inner)[1:]) if inner.max() else []
    got = native.unet_weight_map(inner, int(inner.max()), lm.TRUNC, lm.w0, lm.sigma)
    monkeypatch.setattr(native, 'unet_weight_map', lambda *a, **k: None)
    want = lm._get_weight_map(inner, ids)
    np.testing.assert_array_equal((1 + got).astype(np.float32), (1 + want).astype(np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('seed', [0, 2, 7])
def test_all_centerpoints_bbox_fastpath_exact(seed):
    """The bbox-bounded bisection start (labelmaps.cpp centerpoints_impl)
    must be bit-identical to the reference 24-iteration search from
    [0, 1e6] (datasets/utils/center.py)."""
    inst = np_fix_instance(blobs(seed))
    got = native.all_centerpoints(inst, int(inst.max()))
    assert got is not None
    for k, _ in instance_boxes(inst):
        want = np_centerpoint((inst == k).astype(np.uint8))
        assert [int(got[k, 0]), int(got[k, 1])] == want


@pytest.mark.parametrize('seed,to_center', [(0, True), (3, True), (0, False)])
def test_dlm_point_maps_native(seed, to_center, monkeypatch):
    """One-call native per-instance stage vs the python bbox loop: dist is
    bit-equal (both cast the same f64 values to f32), gradient matches to
    f32 summation-order tolerance, centers/point map are identical."""
    inst = np_fix_instance(blobs(seed))
    monkeypatch.setattr(native, 'dlm_point_maps', lambda *a, **k: None)
    p_want, g_want, d_want = DirectionLabelMake.calculate_point_map(inst, to_center=to_center)
    monkeypatch.undo()
    p_got, g_got, d_got = DirectionLabelMake.calculate_point_map(inst, to_center=to_center)
    np.testing.assert_array_equal(d_got, d_want)
    np.testing.assert_allclose(g_got, g_want, rtol=1e-4, atol=2e-5)
    np.testing.assert_array_equal(p_got, p_want)


def test_dlm_point_maps_centralridge_no_background_crop(monkeypatch):
    """to_center=False with an instance filling its whole crop: scipy's EDT
    leaves the out-of-bounds sentinel (-1, 0), i.e. d = hypot(y+1, x) —
    the native kernel replicates it bit-for-bit."""
    inst = np.ones((16, 16), np.int32)
    p_got, g_got, d_got = DirectionLabelMake.calculate_point_map(inst, to_center=False)
    monkeypatch.setattr(native, 'dlm_point_maps', lambda *a, **k: None)
    p_want, g_want, d_want = DirectionLabelMake.calculate_point_map(inst, to_center=False)
    np.testing.assert_array_equal(d_got, d_want)
    np.testing.assert_allclose(g_got, g_want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize('seed', [0, 4])
def test_ddm_weight_native(seed, monkeypatch):
    """Native DDM weight map vs the python table path on identical
    dir/dist inputs."""
    inst = np_fix_instance(blobs(seed))
    _, g, dist = DirectionLabelMake.calculate_point_map(inst, to_center=True)
    dir_map = DirectionLabelMake.calculate_dir_map(inst, g, 8)
    got = native.ddm_weight(dir_map, dist, LABEL_TO_VECTOR[9])
    assert got is not None
    monkeypatch.setattr(native, 'ddm_weight', lambda *a, **k: None)
    want = DirectionLabelMake.calculate_weight_map(dir_map, dist, 8)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('seed', [0, 3])
def test_hv_map_native(seed, monkeypatch):
    """Native HV map vs the numpy per-instance loop: bit-equal (integer
    offsets, same f32 divisions)."""
    from tiseg_tpu.datasets.ops import HVLabelMake
    inst = np_fix_instance(blobs(seed))
    mk = lambda: {'inst_gt': inst.copy(), 'sem_gt': (inst > 0).astype(np.int32), 'seg_fields': []}
    got = HVLabelMake()(mk())['hv_gt']
    monkeypatch.setattr(native, 'hv_map', lambda *a, **k: None)
    want = HVLabelMake()(mk())['hv_gt']
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('seed,inst_norm', [(0, True), (3, True), (0, False)])
def test_dist_cdt_map_native(seed, inst_norm, monkeypatch):
    """Native chessboard distance map vs the numpy/scipy loop: bit-equal
    (exact integer chamfer, same f32 normalization)."""
    from tiseg_tpu.datasets.ops import DistanceLabelMake
    inst = np_fix_instance(blobs(seed))
    mk = lambda: {'inst_gt': inst.copy(), 'sem_gt': (inst > 0).astype(np.int32), 'seg_fields': []}
    got = DistanceLabelMake(inst_norm=inst_norm)(mk())['dist_gt']
    monkeypatch.setattr(native, 'dist_cdt_map', lambda *a, **k: None)
    want = DistanceLabelMake(inst_norm=inst_norm)(mk())['dist_gt']
    np.testing.assert_array_equal(got, want)


def test_dist_cdt_map_native_no_background_crop(monkeypatch):
    """Instance filling its whole (clamped) crop: scipy cdt yields -1 -> the
    normalized path skips it, the unnormalized path writes -1."""
    from tiseg_tpu.datasets.ops import DistanceLabelMake
    inst = np.ones((16, 16), np.int32)  # fills the image: crop has no bg px
    for norm in (True, False):
        mk = lambda: {'inst_gt': inst.copy(), 'sem_gt': (inst > 0).astype(np.int32), 'seg_fields': []}
        got = DistanceLabelMake(inst_norm=norm)(mk())['dist_gt']
        with monkeypatch.context() as mp:
            mp.setattr(native, 'dist_cdt_map', lambda *a, **k: None)
            want = DistanceLabelMake(inst_norm=norm)(mk())['dist_gt']
        np.testing.assert_array_equal(got, want)


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
