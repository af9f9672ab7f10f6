"""Pallas VMEM-resident post-processing (interpret mode on CPU) vs the
exact XLA device path."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, 'pallas_call', functools.partial(pl.pallas_call, interpret=True))
    # re-import modules that captured pl.pallas_call at import time is not
    # needed: they reference pl.pallas_call at call time
    yield


def blob_mask(seed, shape=(64, 64), n=8):
    rng = np.random.default_rng(seed)
    mask = np.zeros(shape, bool)
    yy, xx = np.ogrid[:shape[0], :shape[1]]
    for _ in range(n):
        cy, cx = rng.integers(0, shape[0]), rng.integers(0, shape[1])
        r = rng.integers(2, 8)
        mask |= (yy - cy)**2 + (xx - cx)**2 <= r * r
    return mask


@pytest.mark.parametrize('seed', [0, 1])
def test_ccl_pallas_matches_exact(seed):
    from tiseg_tpu.ops.ccl import connected_components
    from tiseg_tpu.ops.pallas_postproc import ccl_pallas
    mask = blob_mask(seed)
    got = np.asarray(ccl_pallas(jnp.asarray(mask), rounds=64, connectivity=2))
    want = np.asarray(connected_components(jnp.asarray(mask), 2))
    np.testing.assert_array_equal(got, want)


def test_fill_holes_pallas_matches_exact():
    from tiseg_tpu.ops.morph import binary_fill_holes
    from tiseg_tpu.ops.pallas_postproc import fill_holes_pallas
    mask = blob_mask(2)
    mask[20:32, 20:32] = True
    mask[24:28, 24:28] = False
    got = np.asarray(fill_holes_pallas(jnp.asarray(mask)))
    want = np.asarray(binary_fill_holes(jnp.asarray(mask)))
    np.testing.assert_array_equal(got, want)


def test_instance_postprocess_pallas_matches_exact():
    from tiseg_tpu.ops.ccl import instance_postprocess_device
    from tiseg_tpu.ops.pallas_postproc import instance_postprocess_pallas
    mask = blob_mask(3)
    sem = mask.astype(np.int32)
    sp, ip = instance_postprocess_pallas(jnp.asarray(sem), radius=1, num_classes=2, ccl_rounds=64)
    se, ie = instance_postprocess_device(jnp.asarray(sem), radius=1, num_classes=2, max_instances=256)
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(se))
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(ie))


def test_watershed_pallas_matches_device_watershed():
    import numpy as np
    from scipy import ndimage
    from tiseg_tpu.ops.pallas_postproc import watershed_pallas
    from tiseg_tpu.ops.watershed import watershed as ws_xla

    mask = np.zeros((48, 80), bool)
    yy, xx = np.ogrid[:48, :80]
    mask |= (yy - 24)**2 + (xx - 30)**2 <= 144
    mask |= (yy - 24)**2 + (xx - 52)**2 <= 144
    dist = ndimage.distance_transform_edt(mask)
    markers = np.zeros(mask.shape, np.int32)
    markers[24, 30] = 1
    markers[24, 52] = 2

    got = np.asarray(watershed_pallas(jnp.asarray(-dist), jnp.asarray(markers), jnp.asarray(mask)))
    want = np.asarray(ws_xla(jnp.asarray(-dist), jnp.asarray(markers), jnp.asarray(mask)))
    assert np.all(got[mask] > 0)
    agree = (got == want) | ~mask
    assert agree.mean() > 0.98
