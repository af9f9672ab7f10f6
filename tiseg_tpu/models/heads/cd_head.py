"""CDHead: UNet decoder ending in the Direction-Guided refinement Module
(DGM) (reference: tiseg/models/heads/cd_head.py:14-188).

DGM: mask->dir->point residual-unit chain with cross-branch attention —
the point logit gates the direction features, the direction logit gates
the mask features.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS
from ..nn import ConvModule
from .unet_head import UNetHead


class RU(nn.Module):
    """Residual unit: (conv3x3+BN+ReLU+conv3x3+BN) + conv1x1 identity, ReLU."""
    out_dims: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = ConvModule(self.out_dims, (3, 3), dtype=self.dtype, axis_name=self.axis_name,
                         name='res1')(x, train)
        res = ConvModule(self.out_dims, (3, 3), act=None, dtype=self.dtype, axis_name=self.axis_name,
                         name='res2')(res, train)
        ide = nn.Conv(self.out_dims, (1, 1), dtype=self.dtype, name='ide')(x)
        return nn.relu(res + ide)


class AU(nn.Module):
    """Attention unit: signal * (1 + sigmoid(conv1x1(gate)))."""
    num_masks: int = 1

    @nn.compact
    def __call__(self, signal, gate):
        attn = nn.sigmoid(nn.Conv(self.num_masks, (1, 1), use_bias=False, name='attn')(gate))
        return signal * (1 + attn)


class DGM(nn.Module):
    feed_dims: int
    num_classes: int
    num_angles: int = 8
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        mask_feature = RU(self.feed_dims, name='mask_feats', **kw)(x, train)
        dir_feature = RU(self.feed_dims, name='dir_feats', **kw)(mask_feature, train)
        point_feature = RU(self.feed_dims, name='point_feats', **kw)(dir_feature, train)

        point_logit = nn.Conv(1, (1, 1), name='point_conv')(point_feature)
        dir_feature_gated = AU(name='point_to_dir_attn')(dir_feature, point_logit)
        dir_logit = nn.Conv(self.num_angles + 1, (1, 1), name='dir_conv')(dir_feature_gated)
        mask_feature_gated = AU(name='dir_to_mask_attn')(mask_feature, dir_logit)
        mask_logit = nn.Conv(self.num_classes, (1, 1), name='mask_conv')(mask_feature_gated)
        return mask_logit, dir_logit, point_logit


@HEADS.register_module()
class CDHead(nn.Module):
    """UNet decode stack (no classifier) + DGM."""
    num_classes: int
    num_angles: int = 8
    dgm_dims: int = 64
    stage_dims: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, bottom, skips, train: bool = False):
        x = UNetHead(num_classes=None, stage_dims=self.stage_dims, dtype=self.dtype,
                     axis_name=self.axis_name, name='decoder')(bottom, skips, train)
        return DGM(self.dgm_dims, self.num_classes, self.num_angles, dtype=self.dtype,
                   axis_name=self.axis_name, name='dgm')(x, train)
