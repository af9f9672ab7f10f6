"""FullNet: full-resolution dense network with hybrid dilations
(reference: tiseg/models/segmentors/fullnet.py:108-271).

7 dense blocks (6 layers each, growth 24) at dilation schedule
(1, 2, 4, 8, 16, 4, 1) with hybrid per-layer dilations; 1x1 compression
(ratio 0.5) between blocks; no downsampling anywhere. Block layer =
conv3x3 -> LeakyReLU -> BN (that unusual order is the reference's)
-> dropout(0.1) -> channel concat.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import SEGMENTORS
from ..losses import batch_multiclass_dice_loss, cross_entropy
from .base import BaseSegmentor, parse_losses
from .unet import instance_postprocess

# hybrid dilation patterns: (dilation, n_layers) -> per-layer dilations
HD_DICT = {
    (1, 6): (1, 1, 1, 1, 1, 1),
    (2, 6): (1, 2, 3, 1, 2, 3),
    (4, 6): (1, 2, 3, 5, 6, 7),
    (8, 6): (2, 5, 7, 9, 11, 14),
    (16, 6): (10, 13, 16, 17, 19, 21),
}


class ConvLRB(nn.Module):
    """conv -> LeakyReLU -> BN (reference ConvLayer order)."""
    features: int
    kernel_size: tuple = (3, 3)
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel_size, kernel_dilation=(self.dilation, self.dilation),
                    padding='SAME', use_bias=False, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name if train else None)(x)
        return x


class FullNetNet(nn.Module):
    num_classes: int
    growth_rate: int = 24
    n_layers: int = 6
    dilations: Sequence[int] = (1, 2, 4, 8, 16, 4, 1)
    drop_rate: float = 0.1
    compress_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvLRB(24, dtype=self.dtype, axis_name=self.axis_name, name='conv1')(x, train)
        in_ch = 24
        for bi, d in enumerate(self.dilations):
            layer_dils = HD_DICT[(d, self.n_layers)]
            for li, ld in enumerate(layer_dils):
                out = ConvLRB(self.growth_rate, dilation=ld, dtype=self.dtype, axis_name=self.axis_name,
                              name=f'block{bi + 1}_layer{li + 1}')(x, train)
                out = nn.Dropout(rate=self.drop_rate, deterministic=not train)(out)
                x = jnp.concatenate([x, out], axis=-1)
            in_ch = in_ch + self.n_layers * self.growth_rate
            out_ch = int(math.floor(in_ch * self.compress_ratio))
            x = ConvLRB(out_ch, (1, 1), dtype=self.dtype, axis_name=self.axis_name,
                        name=f'trans{bi + 1}')(x, train)
            in_ch = out_ch
        sem = nn.Conv(self.num_classes + 1, (3, 3), padding='SAME', use_bias=False, name='cls')(x)
        return {'sem': sem}


@SEGMENTORS.register_module()
class FullNet(BaseSegmentor):

    device_pp_supported = True
    device_pp_strip_boundary = True
    device_pp_default_radius = 3

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = FullNetNet(num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        sem_logit = heads['sem']
        sem_gt_wb = batch['label']['sem_gt_w_bound']
        losses = {
            'sem_ce_loss': 5.0 * cross_entropy(sem_logit, sem_gt_wb),
            'sem_dice_loss': 0.5 * batch_multiclass_dice_loss(sem_logit, sem_gt_wb, self.num_classes + 1),
        }
        losses.update(self.training_metrics(sem_logit, sem_gt_wb))
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    def postprocess(self, fused):
        pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        pred[pred == self.num_classes] = 0
        sem, inst = instance_postprocess(pred, radius=self.test_cfg.get('radius', 3))
        return {'sem_pred': sem, 'inst_pred': inst}
