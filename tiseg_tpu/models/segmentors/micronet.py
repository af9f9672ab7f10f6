"""MicroNet / CMicroNet (reference: tiseg/models/segmentors/micronet.py
:27-240, cmicronet.py:99-284).

Multi-resolution trunk: every DownBlock concatenates VALID-conv features
with a re-resized raw-image branch; decoder UpBlocks use bilinear 2x +
k5/s1 transposed convs to regrow the VALID-conv shrinkage; three auxiliary
decode branches (from 1/2, 1/4, 1/8 scales) plus the fused final head.
Valid convolutions constrain the input to 252x252 or 508x508.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sliding import resize_bilinear
from ..builder import SEGMENTORS
from ..losses import batch_multiclass_dice_loss, cross_entropy
from .base import BaseSegmentor, parse_losses
from .unet import instance_postprocess


def _bilinear(x, hw):
    return resize_bilinear(x.astype(jnp.float32), hw).astype(x.dtype)


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    pad: bool = False
    use_norm: bool = True
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding='SAME' if self.pad else 'VALID',
                    use_bias=not self.use_norm, dtype=self.dtype)(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.axis_name if train else None)(x)
        if self.act:
            x = nn.relu(x)
        return x


class DownBlock(nn.Module):
    out_dims: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, img, train: bool = False):
        x = _ConvBNRelu(self.out_dims, dtype=self.dtype, axis_name=self.axis_name, name='conv1')(x, train)
        x = _ConvBNRelu(self.out_dims, use_norm=False, dtype=self.dtype, name='conv2')(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        H, W = x.shape[1:3]
        ix = _bilinear(img, (H + 4, W + 4))
        ix = _ConvBNRelu(self.out_dims, dtype=self.dtype, axis_name=self.axis_name, name='img_conv1')(ix, train)
        ix = _ConvBNRelu(self.out_dims, use_norm=False, dtype=self.dtype, name='img_conv2')(ix, train)
        return jnp.concatenate([x, ix], axis=-1)


class UpBlock(nn.Module):
    feed_dims: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = _bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = _ConvBNRelu(self.feed_dims, pad=True, use_norm=False, act=False, dtype=self.dtype,
                        name='up_proj')(x, train)
        x = _ConvBNRelu(self.feed_dims, use_norm=False, dtype=self.dtype, name='conv1')(x, train)
        x = _ConvBNRelu(self.feed_dims, use_norm=False, dtype=self.dtype, name='conv2')(x, train)
        x = nn.ConvTranspose(self.feed_dims, (5, 5), padding='VALID', dtype=self.dtype, name='in_trans')(x)
        skip = nn.ConvTranspose(self.feed_dims, (5, 5), padding='VALID', dtype=self.dtype, name='skip_trans')(skip)
        out = jnp.concatenate([x, skip], axis=-1)
        out = _ConvBNRelu(self.feed_dims, kernel=1, pad=True, use_norm=False, dtype=self.dtype,
                          name='bottleneck')(out, train)
        return out


class DecodeBlock(nn.Module):
    feed_dims: int
    num_classes: int
    up_factor: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _bilinear(x, (x.shape[1] * self.up_factor, x.shape[2] * self.up_factor))
        x = _ConvBNRelu(self.feed_dims, pad=True, use_norm=False, act=False, dtype=self.dtype,
                        name='up_proj')(x, train)
        feats = _ConvBNRelu(self.feed_dims, use_norm=False, dtype=self.dtype, name='feed')(x, train)
        out = nn.Dropout(0.5, deterministic=not train)(feats)
        out = nn.Conv(self.num_classes, (3, 3), padding='VALID', name='sem')(out)
        return out, feats


class MicroNetNet(nn.Module):
    num_classes: int  # output channel count (incl. boundary for CMicroNet)
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, img, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        b1 = DownBlock(64, name='db1', **kw)(img, img, train)
        b2 = DownBlock(128, name='db2', **kw)(b1, img, train)
        b3 = DownBlock(256, name='db3', **kw)(b2, img, train)
        b4 = DownBlock(512, name='db4', **kw)(b3, img, train)
        b5 = _ConvBNRelu(2048, use_norm=False, dtype=self.dtype, name='db5_conv1')(b4, train)
        b5 = _ConvBNRelu(2048, use_norm=False, dtype=self.dtype, name='db5_conv2')(b5, train)
        b6 = UpBlock(1024, name='ub4', **kw)(b5, b4, train)
        b7 = UpBlock(512, name='ub3', **kw)(b6, b3, train)
        b8 = UpBlock(256, name='ub2', **kw)(b7, b2, train)
        b9 = UpBlock(128, name='ub1', **kw)(b8, b1, train)

        p_a1, f1 = DecodeBlock(64, self.num_classes, 2, name='out1', **kw)(b9, train)
        p_a2, f2 = DecodeBlock(128, self.num_classes, 4, name='out2', **kw)(b8, train)
        p_a3, f3 = DecodeBlock(256, self.num_classes, 8, name='out3', **kw)(b7, train)

        feats = jnp.concatenate([f1, f2, f3], axis=-1)
        feats = nn.Dropout(0.5, deterministic=not train)(feats)
        p_o = nn.Conv(self.num_classes, (3, 3), padding='VALID', name='final_sem')(feats)

        out = {'sem': p_o}
        if train:
            out.update({'aux1': p_a1, 'aux2': p_a2, 'aux3': p_a3})
        return out


@SEGMENTORS.register_module()
class MicroNet(BaseSegmentor):
    """Input must be 252x252 or 508x508 (valid convolutions)."""

    device_pp_supported = True

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = MicroNetNet(num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    def init_variables(self, rng, hw=(252, 252), in_channels: int = 3):
        return super().init_variables(rng, hw=hw, in_channels=in_channels)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        sem_gt = batch['label']['sem_gt_inner']
        weight_map = batch['label']['loss_weight_map']
        losses = {}
        for key, suffix in (('sem', ''), ('aux1', '_aux1'), ('aux2', '_aux2'), ('aux3', '_aux3')):
            logit = heads[key]
            losses[f'sem_ce_loss{suffix}'] = 5.0 * cross_entropy(logit, sem_gt, weight=weight_map)
            losses[f'sem_dice_loss{suffix}'] = 0.5 * batch_multiclass_dice_loss(logit, sem_gt, self.num_classes)
        losses.update(self.training_metrics(heads['sem'], sem_gt))
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    def postprocess(self, fused):
        pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        sem, inst = instance_postprocess(pred, radius=self.test_cfg.get('radius', 1))
        return {'sem_pred': sem, 'inst_pred': inst}


@SEGMENTORS.register_module()
class CMicroNet(MicroNet):
    """MicroNet trained on the 3-class boundary-aware target (reference
    cmicronet.py:99-284)."""

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        BaseSegmentor.__init__(self, num_classes, train_cfg, test_cfg)
        self.net = MicroNetNet(num_classes=num_classes + 1, dtype=dtype, axis_name=axis_name)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        sem_gt = batch['label']['sem_gt_w_bound']
        losses = {}
        for key, suffix in (('sem', ''), ('aux1', '_aux1'), ('aux2', '_aux2'), ('aux3', '_aux3')):
            logit = heads[key]
            losses[f'sem_ce_loss{suffix}'] = 5.0 * cross_entropy(logit, sem_gt)
            losses[f'sem_dice_loss{suffix}'] = 0.5 * batch_multiclass_dice_loss(logit, sem_gt, self.num_classes + 1)
        losses.update(self.training_metrics(heads['sem'], sem_gt))
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    def postprocess(self, fused):
        pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        pred[pred == self.num_classes] = 0
        sem, inst = instance_postprocess(pred, radius=self.test_cfg.get('radius', 3))
        return {'sem_pred': sem, 'inst_pred': inst}
