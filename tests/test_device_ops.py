"""On-device post-processing ops vs the host (scipy/skimage-semantics)
reference implementations."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from tiseg_tpu.ops.ccl import instance_postprocess_device, label as label_dev
from tiseg_tpu.ops.morph import (binary_dilation, binary_erosion, binary_fill_holes, diamond_offsets, disk_offsets,
                                 grey_dilation, remove_small_objects_labeled)
from tiseg_tpu.utils import morphology as m
from tiseg_tpu.models.segmentors.unet import instance_postprocess

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


def random_mask(seed, shape=(96, 96), n=10):
    rng = np.random.default_rng(seed)
    mask = np.zeros(shape, bool)
    yy, xx = np.ogrid[:shape[0], :shape[1]]
    for _ in range(n):
        cy, cx = rng.integers(0, shape[0]), rng.integers(0, shape[1])
        r = rng.integers(2, 9)
        mask |= (yy - cy)**2 + (xx - cx)**2 <= r**2
    return mask


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_ccl_matches_skimage_semantics(seed):
    mask = random_mask(seed)
    got = np.asarray(label_dev(jnp.asarray(mask), connectivity=2, max_instances=512))
    want = m.label(mask, connectivity=2)
    # min-index compaction reproduces raster-scan numbering exactly
    np.testing.assert_array_equal(got, want)


def test_ccl_4conn():
    mask = np.zeros((8, 8), bool)
    mask[0, 0] = mask[1, 1] = True  # diagonal: 2 components under 4-conn
    got = np.asarray(label_dev(jnp.asarray(mask), connectivity=1, max_instances=16))
    assert got.max() == 2


@pytest.mark.parametrize('seed', [0, 1])
def test_fill_holes_matches_scipy(seed):
    mask = random_mask(seed)
    mask[40:50, 40:50] = True
    mask[43:47, 43:47] = False
    got = np.asarray(binary_fill_holes(jnp.asarray(mask)))
    want = ndimage.binary_fill_holes(mask)
    np.testing.assert_array_equal(got, want)


def test_dilation_erosion_match_host():
    mask = random_mask(3)
    for r, offs, selem in [(1, diamond_offsets(1), m.diamond(1)), (2, disk_offsets(2), m.disk(2))]:
        got_d = np.asarray(binary_dilation(jnp.asarray(mask), offs))
        want_d = m.dilation(mask, selem)
        np.testing.assert_array_equal(got_d, want_d)
        got_e = np.asarray(binary_erosion(jnp.asarray(mask), offs))
        want_e = m.erosion(mask, selem)
        np.testing.assert_array_equal(got_e, want_e)


def test_grey_dilation_label_map():
    lab = np.zeros((16, 16), np.int32)
    lab[8, 8] = 7
    got = np.asarray(grey_dilation(jnp.asarray(lab), disk_offsets(2)))
    want = m.dilation(lab, m.disk(2))
    np.testing.assert_array_equal(got, want)


def test_remove_small_objects_labeled():
    lab = np.zeros((16, 16), np.int32)
    lab[0:4, 0:4] = 1
    lab[10, 10] = 2
    got = np.asarray(remove_small_objects_labeled(jnp.asarray(lab), 5, 64))
    assert got[1, 1] == 1 and got[10, 10] == 0


def _partition_equal(a, b):
    """instance maps equal up to label renaming."""
    assert (a > 0).sum() == (b > 0).sum()
    pairs = set(zip(a[a > 0].ravel(), b[a > 0].ravel()))
    # bijection check
    assert len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})


@pytest.mark.parametrize('seed', [0, 5])
def test_device_instance_postprocess_matches_host(seed):
    mask = random_mask(seed, n=8)
    sem = mask.astype(np.uint8)
    sem[50:54, 50:54] = 0  # carve a hole somewhere
    host_sem, host_inst = instance_postprocess(sem.copy(), radius=1)
    dev_sem, dev_inst = instance_postprocess_device(jnp.asarray(sem.astype(np.int32)), radius=1,
                                                    num_classes=2, max_instances=256)
    dev_sem, dev_inst = np.asarray(dev_sem), np.asarray(dev_inst)
    np.testing.assert_array_equal(dev_sem, host_sem)
    _partition_equal(host_inst, dev_inst)
