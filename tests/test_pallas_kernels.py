"""Pallas stencil kernels (interpret mode on CPU) vs the XLA shift path."""
import jax.numpy as jnp
import numpy as np
import pytest

from tiseg_tpu.ops.morph import grey_dilation, grey_erosion, square_offsets
from tiseg_tpu.ops.pallas_kernels import neighborhood_max_3x3, neighborhood_min_3x3

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize('seed', [0, 1])
def test_pallas_max_matches_xla(seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 1000, (32, 128)).astype(np.int32)
    got = np.asarray(neighborhood_max_3x3(jnp.asarray(x), interpret=True))
    want = np.asarray(grey_dilation(jnp.asarray(x), square_offsets(3)))
    np.testing.assert_array_equal(got, want)


def test_pallas_min_matches_xla():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1000, (16, 128)).astype(np.int32)
    got = np.asarray(neighborhood_min_3x3(jnp.asarray(x), interpret=True))
    want = np.asarray(grey_erosion(jnp.asarray(x), square_offsets(3)))
    np.testing.assert_array_equal(got, want)


def test_pallas_batched():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 9, (4, 16, 128)).astype(np.int32)
    got = np.asarray(neighborhood_max_3x3(jnp.asarray(x), interpret=True))
    want = np.asarray(grey_dilation(jnp.asarray(x), square_offsets(3)))
    np.testing.assert_array_equal(got, want)
