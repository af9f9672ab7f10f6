"""Multi-task decoder heads (reference: tiseg/models/heads/
multi_task_unet_head.py:41-123, multi_task_cd_head.py:68-188,
multi_task_cd_head_twobranch.py:68-188).

All share the UNet decode stack; they differ in the branch module on top:
- MultiTaskUNetHead: RU chain -> (aux_mask, mask) sibling classifiers;
- MultiTaskCDHead: DGM with 4 outputs (tc/sem/dir/point), serial or
  parallel feature chains, optional attention-free (noau) and regression
  direction variants;
- MultiTaskCDHeadTwobranch: two separate RU trunks for mask-side and
  direction-side features.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS
from .cd_head import AU, RU
from .unet_head import UNetHead


class MultiTaskBranches(nn.Module):
    feed_dims: int
    num_classes: Sequence[int]  # (aux_classes, main_classes)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        mask_feature = RU(self.feed_dims, name='mask_feats', **kw)(x, train)
        aux_feature = RU(self.feed_dims, name='aux_mask_feats', **kw)(mask_feature, train)
        mask_logit = nn.Conv(self.num_classes[1], (1, 1), name='mask_conv')(mask_feature)
        aux_logit = nn.Conv(self.num_classes[0], (1, 1), name='aux_mask_conv')(aux_feature)
        return aux_logit, mask_logit


@HEADS.register_module()
class MultiTaskUNetHead(nn.Module):
    num_classes: Sequence[int]
    mt_dims: int = 64
    stage_dims: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, bottom, skips, train: bool = False):
        x = UNetHead(num_classes=None, stage_dims=self.stage_dims, dtype=self.dtype,
                     axis_name=self.axis_name, name='decoder')(bottom, skips, train)
        return MultiTaskBranches(self.mt_dims, self.num_classes, dtype=self.dtype,
                                 axis_name=self.axis_name, name='branches')(x, train)


class MTDGM(nn.Module):
    """4-output DGM (tc/sem/dir/point) with serial or parallel chains."""
    feed_dims: int
    num_classes: int
    num_angles: int = 8
    noau: bool = False
    use_regression: bool = False
    parallel: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        if self.parallel:
            dir_feature = RU(self.feed_dims, name='dir_feats', **kw)(x, train)
            mask_feature = RU(self.feed_dims, name='mask_feats', **kw)(x, train)
            point_feature = RU(self.feed_dims, name='point_feats', **kw)(x, train)
            tc_feature = RU(self.feed_dims, name='tc_mask_feats', **kw)(mask_feature, train)
        else:
            tc_feature = RU(self.feed_dims, name='tc_mask_feats', **kw)(x, train)
            dir_feature = RU(self.feed_dims, name='dir_feats', **kw)(tc_feature, train)
            point_feature = RU(self.feed_dims, name='point_feats', **kw)(dir_feature, train)
            mask_feature = RU(self.feed_dims, name='mask_feats', **kw)(x, train)

        point_logit = nn.Conv(1, (1, 1), name='point_conv')(point_feature)

        gated_dir = dir_feature if self.noau else AU(name='point_to_dir_attn')(dir_feature, point_logit)
        dir_ch = 1 if self.use_regression else self.num_angles + 1
        dir_logit = nn.Conv(dir_ch, (1, 1), name='dir_conv')(gated_dir)

        gated_tc = tc_feature if self.noau else AU(name='dir_to_tc_mask_attn')(tc_feature, dir_logit)
        tc_logit = nn.Conv(3, (1, 1), name='tc_mask_conv')(gated_tc)
        mask_logit = nn.Conv(self.num_classes, (1, 1), name='mask_conv')(mask_feature)
        return tc_logit, mask_logit, dir_logit, point_logit


class MTDGMTwobranch(nn.Module):
    feed_dims: int
    num_classes: int
    num_angles: int = 8
    noau: bool = False
    use_regression: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        mask_all = RU(self.feed_dims, name='mask_all_feats', **kw)(x, train)
        dir_all = RU(self.feed_dims, name='dir_all_feats', **kw)(x, train)
        mask_feature = RU(self.feed_dims, name='mask_feats', **kw)(mask_all, train)
        tc_feature = RU(self.feed_dims, name='tc_mask_feats', **kw)(mask_all, train)
        dir_feature = RU(self.feed_dims, name='dir_feats', **kw)(dir_all, train)
        point_feature = RU(self.feed_dims, name='point_feats', **kw)(dir_all, train)

        point_logit = nn.Conv(1, (1, 1), name='point_conv')(point_feature)
        gated_dir = dir_feature if self.noau else AU(name='point_to_dir_attn')(dir_feature, point_logit)
        dir_ch = 1 if self.use_regression else self.num_angles + 1
        dir_logit = nn.Conv(dir_ch, (1, 1), name='dir_conv')(gated_dir)
        gated_tc = tc_feature if self.noau else AU(name='dir_to_tc_mask_attn')(tc_feature, dir_logit)
        tc_logit = nn.Conv(3, (1, 1), name='tc_mask_conv')(gated_tc)
        gated_mask = mask_feature if self.noau else AU(name='dir_to_mask_attn')(mask_feature, dir_logit)
        mask_logit = nn.Conv(self.num_classes, (1, 1), name='mask_conv')(gated_mask)
        return tc_logit, mask_logit, dir_logit, point_logit


@HEADS.register_module()
class MultiTaskCDHead(nn.Module):
    num_classes: int
    num_angles: int = 8
    dgm_dims: int = 64
    noau: bool = False
    use_regression: bool = False
    parallel: bool = False
    stage_dims: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, bottom, skips, train: bool = False):
        x = UNetHead(num_classes=None, stage_dims=self.stage_dims, dtype=self.dtype,
                     axis_name=self.axis_name, name='decoder')(bottom, skips, train)
        return MTDGM(self.dgm_dims, self.num_classes, self.num_angles, self.noau, self.use_regression,
                     self.parallel, dtype=self.dtype, axis_name=self.axis_name, name='dgm')(x, train)


@HEADS.register_module()
class MultiTaskCDHeadTwobranch(nn.Module):
    num_classes: int
    num_angles: int = 8
    dgm_dims: int = 64
    noau: bool = False
    use_regression: bool = False
    stage_dims: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, bottom, skips, train: bool = False):
        x = UNetHead(num_classes=None, stage_dims=self.stage_dims, dtype=self.dtype,
                     axis_name=self.axis_name, name='decoder')(bottom, skips, train)
        return MTDGMTwobranch(self.dgm_dims, self.num_classes, self.num_angles, self.noau,
                              self.use_regression, dtype=self.dtype, axis_name=self.axis_name,
                              name='dgm')(x, train)
