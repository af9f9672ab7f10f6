import numpy as np
from scipy import ndimage

from tiseg_tpu.utils import morphology as m


def test_selems():
    assert m.diamond(1).tolist() == [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    d2 = m.disk(2)
    assert d2.shape == (5, 5)
    assert d2[0, 0] == 0 and d2[2, 0] == 1 and d2[2, 2] == 1


def test_label_multivalue_no_merge():
    # two touching regions with different values must stay separate components
    a = np.zeros((8, 8), dtype=np.int32)
    a[2:5, 2:4] = 3
    a[2:5, 4:6] = 7
    lab = m.label(a)
    assert lab.max() == 2
    assert len(np.unique(lab[a == 3])) == 1
    assert np.unique(lab[a == 3])[0] != np.unique(lab[a == 7])[0]


def test_label_8_connectivity():
    a = np.zeros((6, 6), dtype=bool)
    a[0, 0] = True
    a[1, 1] = True  # diagonal touch -> one component under 8-conn
    assert m.label(a).max() == 1


def test_remove_small_objects_bool_and_labeled():
    a = np.zeros((10, 10), dtype=bool)
    a[0:3, 0:3] = True  # size 9
    a[8, 8] = True  # size 1
    out = m.remove_small_objects(a, 5)
    assert out[1, 1] and not out[8, 8]

    lab = np.zeros((10, 10), dtype=np.int32)
    lab[0:3, 0:3] = 4
    lab[8, 8] = 9
    out = m.remove_small_objects(lab, 5)
    assert out[1, 1] == 4 and out[8, 8] == 0


def test_grey_dilation_label_map():
    lab = np.zeros((9, 9), dtype=np.int32)
    lab[4, 4] = 5
    out = m.dilation(lab, m.disk(2))
    assert out[4, 2] == 5 and out[2, 4] == 5 and out[2, 2] == 0


def test_erosion_border_high():
    img = np.ones((5, 5), dtype=np.uint8) * 7
    out = m.erosion(img, m.diamond(1))
    # erosion of a constant image should stay constant (border padded high)
    assert np.all(out == 7)


def test_reconstruction_erosion_hminima():
    # a 1-deep and a 5-deep basin; h=2 must erase only the shallow one
    img = np.full((20, 20), 10.0)
    img[4, 4] = 9.0
    img[14, 14] = 5.0
    markers = m.h_minima_markers(img, 2.0)
    assert markers[14, 14] > 0
    assert markers[4, 4] == 0


def test_watershed_two_markers():
    # distance-based split of two touching disks
    mask = np.zeros((32, 64), dtype=bool)
    yy, xx = np.ogrid[:32, :64]
    mask |= (yy - 16)**2 + (xx - 22)**2 <= 100
    mask |= (yy - 16)**2 + (xx - 42)**2 <= 100
    dist = ndimage.distance_transform_edt(mask)
    markers = np.zeros(mask.shape, dtype=np.int32)
    markers[16, 22] = 1
    markers[16, 42] = 2
    out = m.watershed(-dist, markers, mask=mask)
    assert set(np.unique(out[mask])) == {1, 2}
    assert out[16, 14] == 1 and out[16, 50] == 2
    # everything in the mask is labeled
    assert np.all(out[mask] > 0)


def test_fill_holes():
    a = np.zeros((10, 10), dtype=bool)
    a[2:8, 2:8] = True
    a[4:6, 4:6] = False
    assert m.binary_fill_holes(a)[4, 4]
