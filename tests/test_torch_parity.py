"""Numerical parity with the reference's torch ops (SURVEY.md hard part #6):
bilinear resize (align_corners=False), 3x3 SAME conv vs torch padding=1,
ConvTranspose k4/s2 SAME vs torch padding=1, 2x2 max pool, rot90/flip TTA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from tiseg_tpu.ops.sliding import resize_bilinear, reverse_tta_transform, tta_transform  # noqa: E402

# compile-heavy (8-virtual-device CPU mesh): excluded from the <5-min core tier
# (`pytest -m 'not slow'`); the full suite runs them all.
pytestmark = pytest.mark.slow


def rand(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_bilinear_resize_matches_torch():
    x = rand(1, 13, 17, 4)
    out_hw = (37, 53)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(xt, size=out_hw, mode='bilinear', align_corners=False)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_downscale_resize_matches_torch():
    x = rand(1, 64, 64, 2, seed=1)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (17, 23)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(xt, size=(17, 23), mode='bilinear', align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_conv3x3_same_matches_torch_pad1():
    x = rand(2, 16, 16, 5, seed=2)
    w = rand(3, 3, 5, 7, seed=3)  # HWIO
    got = jax.lax.conv_general_dilated(jnp.asarray(x), jnp.asarray(w), (1, 1), 'SAME',
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
    want = F.conv2d(xt, wt, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_convtranspose_same_matches_torch_pad1():
    from flax import linen as nn
    x = rand(2, 8, 8, 3, seed=4)
    w = rand(4, 4, 3, 6, seed=5)  # flax HWIO (in, out)
    mod = nn.ConvTranspose(6, (4, 4), (2, 2), padding='SAME', use_bias=False)
    got = mod.apply({'params': {'kernel': jnp.asarray(w)}}, jnp.asarray(x))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # flax ConvTranspose (transpose_kernel=False) == torch conv_transpose2d
    # with a spatially flipped kernel: any torch transconv weight port must
    # flip kH/kW. torch layout: (in, out, kH, kW).
    wt = torch.from_numpy(w[::-1, ::-1].copy().transpose(2, 3, 0, 1))
    want = F.conv_transpose2d(xt, wt, stride=2, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_maxpool_matches_torch():
    from flax import linen as nn
    x = rand(2, 16, 16, 3, seed=6)
    got = nn.max_pool(jnp.asarray(x), (2, 2), strides=(2, 2))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.max_pool2d(xt, 2, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want)


def test_tta_matches_torch_rot_flip():
    x = rand(1, 8, 8, 2, seed=7)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for rot in (0, 90, 180, 270):
        for flip in ('none', 'horizontal', 'vertical', 'diagonal'):
            got = np.asarray(tta_transform(jnp.asarray(x), rot, flip))
            t = torch.rot90(xt, k=(rot // 90) % 4, dims=(-2, -1))
            if flip == 'horizontal':
                t = torch.flip(t, dims=[-1])
            elif flip == 'vertical':
                t = torch.flip(t, dims=[-2])
            elif flip == 'diagonal':
                t = torch.flip(t, dims=[-2, -1])
            want = t.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_array_equal(got, want)
