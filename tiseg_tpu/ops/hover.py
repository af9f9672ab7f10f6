"""On-device HoVer-Net instance recovery (jnp, jit-able).

TPU-native twin of the host pipeline (tiseg_tpu.models.utils.postprocess.
hover_post_proc; reference hovernet.py:283-365): threshold foreground,
CCL + small-object removal, min-max normalize the H/V maps, ksize-21
Sobel edges, ``overall = max(sobelh, sobelv)``, marker extraction
(fill + 5x5 ellipse opening), marker watershed on the blurred inverse
energy. Sobel/Gaussian are plain convolutions (MXU/VPU-friendly); the
flood steps are the scan/wave ops from tiseg_tpu.ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ccl import connected_components
from .morph import binary_dilation, binary_erosion, binary_fill_holes
from .watershed import watershed


def _cv2_sobel_kernel(ksize: int):
    """cv2.getDerivKernels-compatible separable Sobel: smooth = binomial
    row, derivative = difference of binomials."""
    def pascal(n):
        row = np.array([1.0])
        for _ in range(n):
            row = np.convolve(row, [1.0, 1.0])
        return row

    smooth = pascal(ksize - 1)
    # cv2's derivative kernel runs [-1, ..., +1]
    deriv = -np.convolve(pascal(ksize - 2), [1.0, -1.0]) if ksize >= 2 else np.array([1.0])
    return smooth.astype(np.float32), deriv.astype(np.float32)


def sobel(x: jnp.ndarray, dx: int, dy: int, ksize: int = 21) -> jnp.ndarray:
    """(H, W) cv2.Sobel twin (replicate border like cv2 BORDER_REFLECT101
    approximated by edge padding; interior values are exact)."""
    smooth, deriv = _cv2_sobel_kernel(ksize)
    kx = jnp.asarray(deriv if dx else smooth)
    ky = jnp.asarray(deriv if dy else smooth)
    pad = ksize // 2
    xp = jnp.pad(x, pad, mode='edge')[None, :, :, None]
    # separable: rows then cols
    k_row = kx.reshape(1, ksize, 1, 1)
    k_col = ky.reshape(ksize, 1, 1, 1)
    out = jax.lax.conv_general_dilated(xp, k_row, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = jax.lax.conv_general_dilated(out, k_col, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out[0, :, :, 0]


def gaussian_blur3(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.GaussianBlur(x, (3,3), 0) twin: sigma=0.8, kernel [1,2,1]/4."""
    k = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    xp = jnp.pad(x, 1, mode='edge')[None, :, :, None]
    out = jax.lax.conv_general_dilated(xp, k.reshape(1, 3, 1, 1), (1, 1), 'VALID',
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = jax.lax.conv_general_dilated(out, k.reshape(3, 1, 1, 1), (1, 1), 'VALID',
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out[0, :, :, 0]


def _minmax_norm(x: jnp.ndarray) -> jnp.ndarray:
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / jnp.where(hi > lo, hi - lo, 1.0)


ELLIPSE5 = tuple((dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)
                 if not (abs(dy) == 2 and abs(dx) == 2))  # cv2 MORPH_ELLIPSE (5,5)


@partial(jax.jit, static_argnames=('ksize', 'obj_size', 'rounds', 'num_levels', 'use_pallas'))
def hover_post_proc_device(fore_prob: jnp.ndarray, hv: jnp.ndarray, ksize: int = 21, obj_size: int = 10,
                           rounds: int = None, num_levels: int = 64, use_pallas: bool = True) -> jnp.ndarray:
    """(H, W) foreground prob + (H, W, 2) HV maps -> (H, W) int32 instances.

    ``use_pallas`` routes the flood steps through the VMEM-resident kernels
    (tiseg_tpu.ops.pallas_postproc); otherwise the exact fixed-point XLA
    scan path is used.
    """
    from .pallas_postproc import MAX_VMEM_PLANE
    sweep_ok = use_pallas and fore_prob.shape[0] * fore_prob.shape[1] <= MAX_VMEM_PLANE
    if sweep_ok:
        # segmented-sweep kernels: CCL+size-filter fused in VMEM (no
        # (H*W+1)-bin bincount), flood-fill in bend-count iterations
        from functools import partial as _p
        from .pallas_sweep import ccl_filter_sweep, fill_holes_sweep
        from .pallas_postproc import watershed_pallas
        sweeps = max(4, (rounds or 128) // 16)
        size_filter = _p(ccl_filter_sweep, sweeps=sweeps, connectivity=1)
        fill_fn = _p(fill_holes_sweep, sweeps=max(4, sweeps // 2))
        ws_fn = _p(watershed_pallas, num_levels=num_levels)
    else:
        from functools import partial as _p
        cc_fn = _p(connected_components, rounds=rounds)
        fill_fn = _p(binary_fill_holes, rounds=rounds)
        ws_fn = _p(watershed, num_levels=num_levels)

    H, W = fore_prob.shape
    blb = fore_prob >= 0.5
    if sweep_ok:
        blb = size_filter(blb, min_size=10) > 0
    else:
        cc = cc_fn(blb, connectivity=1)
        sizes = jnp.bincount(cc.reshape(-1), length=H * W + 1)
        blb = blb & (sizes[cc] >= 10)

    h_dir = _minmax_norm(hv[..., 0])
    v_dir = _minmax_norm(hv[..., 1])
    sobelh = 1.0 - _minmax_norm(sobel(h_dir, 1, 0, ksize))
    sobelv = 1.0 - _minmax_norm(sobel(v_dir, 0, 1, ksize))

    blbf = blb.astype(jnp.float32)
    overall = jnp.maximum(sobelh, sobelv)
    overall = jnp.maximum(overall - (1.0 - blbf), 0.0)

    dist = -gaussian_blur3((1.0 - overall) * blbf)

    marker = blb & ~(overall >= 0.4)
    marker = fill_fn(marker)
    marker = binary_dilation(binary_erosion(marker, ELLIPSE5), ELLIPSE5)  # 5x5 ellipse opening
    if sweep_ok:
        mk = size_filter(marker, min_size=obj_size)
    else:
        mk = cc_fn(marker, connectivity=1)
        mk_sizes = jnp.bincount(mk.reshape(-1), length=H * W + 1)
        mk = jnp.where(mk_sizes[mk] >= obj_size, mk, 0)

    return ws_fn(dist, mk, mask=blb, connectivity=1)
