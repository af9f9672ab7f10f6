"""CUNet: UNet trained on the 3-class boundary-aware target
(reference: tiseg/models/segmentors/cunet.py:16-113).

The head predicts num_classes+1 channels (last = boundary); at eval the
boundary class is stripped before per-class CCL + dilation.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..backbones.vgg import VGG16BN
from ..builder import SEGMENTORS
from ..heads.unet_head import UNetHead
from ..losses import batch_multiclass_dice_loss, cross_entropy
from .base import BaseSegmentor, parse_losses
from .unet import FastVGGUNetEval, instance_postprocess


class CUNetNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VGG16BN(dtype=self.dtype, axis_name=self.axis_name, name='backbone')(x, train)
        sem = UNetHead(num_classes=self.num_classes + 1, dtype=self.dtype, axis_name=self.axis_name,
                       name='head')(feats[-1], feats[:-1], train)
        return {'sem': sem}


@SEGMENTORS.register_module()
class CUNet(FastVGGUNetEval, BaseSegmentor):

    device_pp_supported = True
    device_pp_strip_boundary = True
    device_pp_default_radius = 3

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = CUNetNet(num_classes=num_classes, dtype=dtype, axis_name=axis_name)

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
        pred[pred == self.num_classes] = 0  # strip boundary class
        sem, inst = instance_postprocess(pred, radius=self.test_cfg.get('radius', 3))
        return {'sem_pred': sem, 'inst_pred': inst}
