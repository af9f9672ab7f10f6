"""On-device HoVer post-processing vs the host cv2/scipy pipeline."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.models.utils.postprocess import hover_post_proc
from tiseg_tpu.ops.hover import gaussian_blur3, hover_post_proc_device, sobel

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


def test_sobel_matches_cv2_interior():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    got = np.asarray(sobel(jnp.asarray(x), 1, 0, ksize=21))
    want = cv2.Sobel(x, cv2.CV_64F, 1, 0, ksize=21)
    # borders differ (edge pad vs reflect101); interior matches up to f32
    # accumulation error (kernel weights sum to ~1e10 at ksize 21)
    np.testing.assert_allclose(got[12:-12, 12:-12], want[12:-12, 12:-12], rtol=1e-3)


def test_gaussian3_matches_cv2_interior():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 32)).astype(np.float32)
    got = np.asarray(gaussian_blur3(jnp.asarray(x)))
    want = cv2.GaussianBlur(x, (3, 3), 0)
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], rtol=1e-4, atol=1e-5)


def synthetic_hover_maps(shape=(96, 96), centers=((30, 30), (30, 52), (64, 64)), r=11):
    H, W = shape
    yy, xx = np.mgrid[:H, :W]
    fore = np.zeros(shape, np.float32)
    hv = np.zeros((*shape, 2), np.float32)
    for cy, cx in centers:
        m = (yy - cy)**2 + (xx - cx)**2 <= r * r
        fore[m] = 1.0
        hv[m, 0] = np.clip((xx[m] - cx) / r, -1, 1)
        hv[m, 1] = np.clip((yy[m] - cy) / r, -1, 1)
    return fore, hv


def test_hover_device_vs_host():
    fore, hv = synthetic_hover_maps()
    host = hover_post_proc(fore.copy(), hv.copy())
    dev = np.asarray(hover_post_proc_device(jnp.asarray(fore), jnp.asarray(hv)))
    n_host = len(np.unique(host)) - 1
    n_dev = len(np.unique(dev)) - 1
    assert n_dev == n_host == 3
    # foreground coverage identical, partitions highly consistent
    np.testing.assert_array_equal(dev > 0, host > 0)
    agree = ((dev > 0) & (host > 0))
    pairs = set(zip(host[agree].ravel(), dev[agree].ravel()))
    assert len(pairs) <= n_host + 2  # near-bijective mapping
