import math

import numpy as np
import pytest

from tiseg_tpu.datasets.ops import (BoundLabelMake, DirectionLabelMake, DistanceLabelMake, Formatting, HVLabelMake,
                                    Normalize, Pad, RandomCrop, RandomFlip, UNetLabelMake)
from tiseg_tpu.datasets.utils import (calculate_centerpoint, calculate_gradient, fix_instance,
                                      generate_direction_differential_map, get_dir_from_inst,
                                      assign_sem_class_to_insts)


def blob_data(shape=(64, 64), centers=((20, 20), (20, 34), (44, 44)), r=7):
    inst = np.zeros(shape, dtype=np.int32)
    yy, xx = np.ogrid[:shape[0], :shape[1]]
    for i, (cy, cx) in enumerate(centers, start=1):
        inst[(yy - cy)**2 + (xx - cx)**2 <= r**2] = i
    sem = (inst > 0).astype(np.uint8)
    return {
        'img': np.random.default_rng(0).integers(0, 255, (*shape, 3), dtype=np.uint8).astype(np.uint8),
        'sem_gt': sem,
        'inst_gt': inst,
        'seg_fields': ['sem_gt', 'inst_gt'],
        'data_info': {},
    }


def centerpoint_oracle(mask):
    """Direct per-pixel transliteration of the centerness definition."""
    H, W = mask.shape
    dirs = [(math.sin(2 * math.pi / 8 * i), math.cos(2 * math.pi / 8 * i)) for i in range(8)]
    best, bx, by = -1, -1, -1
    for i in range(H):
        for j in range(W):
            if mask[i, j] <= 0:
                continue
            mx, mn = 0.0, 1e7
            for dy, dx in dirs:
                lo, hi = 0.0, 1e6
                while abs(lo - hi) > 0.1:
                    mid = (lo + hi) / 2
                    y = int(np.rint(i + dy * mid))
                    x = int(np.rint(j + dx * mid))
                    if 0 <= y < H and 0 <= x < W and mask[y, x] > 0:
                        lo = mid
                    else:
                        hi = mid
                mx = max(mx, hi)
                mn = min(mn, lo)
            c = mn / mx
            if c > best:
                best, bx, by = c, i, j
    return [bx, by]


def test_centerpoint_matches_oracle():
    mask = np.zeros((24, 24), dtype=np.uint8)
    yy, xx = np.ogrid[:24, :24]
    mask[((yy - 10)**2 / 36 + (xx - 12)**2 / 16) <= 1] = 1
    got = calculate_centerpoint(mask)
    want = centerpoint_oracle(mask)
    assert got == want
    assert mask[got[0], got[1]] > 0


def test_sobel_gradient_direction():
    # a left-to-right ramp must give positive dx and ~zero dy in the interior
    ramp = np.tile(np.arange(32, dtype=np.float32), (32, 1))
    g = calculate_gradient(ramp, ksize=11)
    assert g.shape == (32, 32, 2)
    assert g[16, 16, 1] > 0
    assert abs(g[16, 16, 0]) < 1e-3


def test_fix_instance_splits_and_filters():
    inst = np.zeros((32, 32), dtype=np.int32)
    inst[2:8, 2:8] = 1      # big part of instance 1
    inst[20:26, 20:26] = 1  # disconnected second part -> should split
    inst[14, 14] = 2        # 1-pixel instance -> removed
    fixed = fix_instance(inst)
    ids = set(np.unique(fixed)) - {0}
    assert len(ids) == 2
    assert fixed[14, 14] == 0
    assert fixed[4, 4] != fixed[22, 22]


def test_bound_label_make():
    data = blob_data()
    out = BoundLabelMake(edge_id=2, selem_radius=1)(data)
    swb = out['sem_gt_w_bound']
    assert set(np.unique(swb)).issubset({0, 1, 2})
    assert (swb == 2).sum() > 0
    # boundary pixels ring each instance: every instance's pixels shrink
    assert ((swb == 1).sum() < (out['inst_gt'] > 0).sum())
    assert 'sem_gt_w_bound' in out['seg_fields']


def test_unet_label_make():
    data = blob_data(centers=((20, 20), (20, 32)), r=7)
    out = UNetLabelMake(w0=10.0, sigma=5.0)(data)
    inner = out['sem_gt_inner']
    w = out['loss_weight_map']
    assert inner.sum() < (out['inst_gt'] > 0).sum()  # eroded
    # weight peaks between the two instances (gap column ~26)
    gap = w[20, 25:28].max()
    far = w[50, 50]
    assert gap > far
    assert w.min() >= 1.0


def test_distance_label_make():
    data = blob_data()
    out = DistanceLabelMake()(data)
    d = out['dist_gt']
    assert d.max() == pytest.approx(1.0)
    assert np.all(d[out['inst_gt'] == 0] == 0)
    assert np.all(d[out['inst_gt'] > 0] > 0)


def test_hv_label_make():
    data = blob_data()
    out = HVLabelMake()(data)
    hv = out['hv_gt']
    assert hv.shape == (*data['inst_gt'].shape, 2)
    assert hv.min() >= -1.0 and hv.max() <= 1.0
    inst = out['inst_gt']
    assert np.all(hv[inst == 0] == 0)
    # x map increases left->right inside an instance
    ys, xs = np.nonzero(inst == 1)
    row = ys[len(ys) // 2]
    cols = xs[ys == row]
    assert hv[row, cols.min(), 0] < 0 < hv[row, cols.max(), 0]


def test_direction_label_make():
    data = blob_data()
    out = DirectionLabelMake(num_angles=8)(data)
    dir_gt = out['dir_gt']
    assert set(np.unique(dir_gt)).issubset(set(range(9)))
    assert np.all(dir_gt[out['inst_gt'] == 0] == 0)
    assert out['point_gt'].max() > 0
    assert out['dist_gt'].max() > 0
    assert out['loss_weight_map'].min() >= 1.0
    # all 3 instances got a center point
    assert (out['point_gt'] == out['point_gt'].max()).sum() >= 1


def test_ddm_discontinuity():
    dir_map = np.zeros((16, 16), dtype=np.int64)
    dir_map[:, :8] = 3  # pointing one way
    dir_map[:, 8:] = 7  # opposite
    ddm = generate_direction_differential_map(dir_map, 9)[0]
    assert ddm[8, 8] == 1.0 or ddm[8, 7] == 1.0
    uniform = np.full((16, 16), 3, dtype=np.int64)
    assert generate_direction_differential_map(uniform, 9).max() == 0


def test_get_dir_from_inst():
    inst = np.zeros((32, 32), dtype=np.int32)
    yy, xx = np.ogrid[:32, :32]
    inst[(yy - 16)**2 + (xx - 16)**2 <= 64] = 1
    d = get_dir_from_inst(inst, 8)
    assert np.all(d[inst == 0] == 0)
    assert d[inst > 0].min() >= 1


def test_assign_sem_class_to_insts():
    inst = np.zeros((16, 16), dtype=np.int32)
    sem = np.zeros((16, 16), dtype=np.int32)
    inst[2:6, 2:6] = 1
    sem[2:6, 2:6] = 1
    inst[10:14, 10:14] = 2
    sem[10:14, 10:14] = 3
    res = assign_sem_class_to_insts(inst, sem, 4)
    assert res[1] == [1]
    assert res[3] == [2]
    assert 0 in res  # background instance 0


def test_transforms_and_formatting():
    data = blob_data()
    np.random.seed(0)
    data = RandomFlip(prob=1.0, direction=['horizontal'])(data)
    data = RandomCrop(crop_size=(48, 48))(data)
    data = Pad(pad_size=64)(data)
    data = Normalize()(data)
    assert data['img'].shape == (64, 64, 3)
    assert data['img'].max() <= 1.0
    out = Formatting(data_keys=['img'], label_keys=['sem_gt', 'inst_gt'])(data)
    assert out['data']['img'].dtype == np.float32
    assert out['data']['img'].shape == (64, 64, 3)
    assert out['label']['sem_gt'].dtype == np.int32
    assert out['metas']['input_hw'] == (64, 64)
