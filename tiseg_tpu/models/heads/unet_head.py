"""UNet decoder head (Flax, NHWC).

Rebuild of tiseg/models/heads/unet_head.py:24-106: five decode layers, each
= transposed-conv 4x4/s2 + BN/ReLU upsample, center-pad to the skip's
spatial size, channel concat, one 3x3 ConvModule; then a 1x1 classifier.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS
from ..nn import ConvModule, TransposedConvModule, pad_to_match


class UNetLayer(nn.Module):
    feed_dims: int
    num_convs: int = 2
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = TransposedConvModule(self.feed_dims, dtype=self.dtype, axis_name=self.axis_name)(x, train)
        x = pad_to_match(x, skip.shape[1:3])
        x = jnp.concatenate([x, skip], axis=-1)
        for _ in range(self.num_convs - 1):
            x = ConvModule(self.feed_dims, (3, 3), dtype=self.dtype, axis_name=self.axis_name)(x, train)
        return x


@HEADS.register_module()
class UNetHead(nn.Module):
    """Decode a 6-level pyramid back to stride 1.

    Call with (bottom, skips) where skips are ordered low->high stride
    (stage0..stage4) like the reference.
    """
    num_classes: Optional[int] = None
    stage_dims: Sequence[int] = (16, 32, 64, 128, 256)
    num_convs: int = 2
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, bottom, skips, train: bool = False):
        x = bottom
        for idx in range(len(skips) - 1, -1, -1):
            x = UNetLayer(self.stage_dims[idx], self.num_convs, dtype=self.dtype,
                          axis_name=self.axis_name, name=f'decode{idx}')(x, skips[idx], train)
        if self.num_classes is not None:
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name='cls')(x)
        return x
