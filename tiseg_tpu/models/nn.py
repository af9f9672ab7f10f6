"""Flax NN building blocks (NHWC, TPU-native).

Conventions:
- all activations are NHWC; all convs channels-last (HWIO kernels) so XLA
  tiles them directly onto the MXU;
- BatchNorm carries a ``batch_stats`` collection. Under pjit data
  parallelism the batch statistics are computed over the FULL global batch
  (XLA inserts the cross-device reduction automatically), i.e. SyncBN
  semantics come for free — strictly stronger than the reference's
  per-device BN + optional mmcv SyncBN (tiseg/models/utils/
  syncbn2bn.py:22-43). The ``axis_name`` option additionally supports
  explicit pmap/shard_map contexts;
- ``dtype`` selects the compute dtype (bfloat16 on TPU); params stay f32.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvModule(nn.Module):
    """conv -> (BN) -> (act), the workhorse block."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 'SAME'
    use_norm: bool = True
    act: Optional[Callable] = nn.relu
    dilation: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides, padding=self.padding,
                    kernel_dilation=self.dilation, use_bias=not self.use_norm, dtype=self.dtype)(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.axis_name if train else None)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class TransposedConvModule(nn.Module):
    """4x4/stride-2 transposed conv -> BN -> ReLU (exact 2x upsample,
    equivalent to torch ConvTranspose2d(k=4, s=2, p=1))."""
    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.features, self.kernel_size, strides=self.strides, padding='SAME',
                             use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name if train else None)(x)
        return nn.relu(x)


def max_pool_2x(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def upsample_2x_nearest(x):
    """Kronecker 2x nearest upsample (HoVer-Net UpSample2x analog)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def pad_to_match(x, target_hw):
    """Center zero-pad x (NHWC) up to the target spatial size (the decoder
    skip-alignment fix, reference unet_head.py:44-48)."""
    dh = target_hw[0] - x.shape[1]
    dw = target_hw[1] - x.shape[2]
    if dh == 0 and dw == 0:
        return x
    return jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
