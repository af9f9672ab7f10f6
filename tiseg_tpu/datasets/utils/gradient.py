"""Large-kernel Sobel-style gradient for distance maps.

Rebuild of tiseg/datasets/utils/gradient_calculation.py:7-51 without torch:
the kernel entry at offset (j_, i_) from center is ``i_/(i_^2+j_^2)`` for the
x-derivative and ``j_/(i_^2+j_^2)`` for the y-derivative; applied as
cross-correlation with zero padding (what F.conv2d does).
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage

_KERNEL_CACHE = {}


def sobel_kernels(ksize: int = 11):
    """Return (kernel_y, kernel_x), each (ksize, ksize) float32."""
    if ksize in _KERNEL_CACHE:
        return _KERNEL_CACHE[ksize]
    c = (ksize - 1) / 2.0
    ky = np.zeros((ksize, ksize), dtype=np.float32)
    kx = np.zeros((ksize, ksize), dtype=np.float32)
    for j in range(ksize):
        for i in range(ksize):
            if i == c and j == c:
                continue
            j_ = int(j - c)
            i_ = int(i - c)
            denom = float(i_ * i_ + j_ * j_)
            kx[j, i] = i_ / denom
            ky[j, i] = j_ / denom
    _KERNEL_CACHE[ksize] = (ky, kx)
    return ky, kx


def calculate_gradient(input_map: np.ndarray, ksize: int = 11) -> np.ndarray:
    """(H, W) -> (H, W, 2) with [..., 0]=dy-like, [..., 1]=dx-like response."""
    assert input_map.ndim == 2
    ky, kx = sobel_kernels(ksize)
    x = input_map.astype(np.float32)
    try:  # cv2.filter2D is cross-correlation with center anchor — identical
        # semantics to ndimage.correlate(mode='constant'), ~10x faster
        import cv2
        gy = cv2.filter2D(x, -1, ky, borderType=cv2.BORDER_CONSTANT)
        gx = cv2.filter2D(x, -1, kx, borderType=cv2.BORDER_CONSTANT)
    except ImportError:
        gy = ndimage.correlate(x, ky, mode='constant', cval=0.0)
        gx = ndimage.correlate(x, kx, mode='constant', cval=0.0)
    return np.stack([gy, gx], axis=-1)
