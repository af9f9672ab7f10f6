"""DCAN: deep contour-aware network (reference: tiseg/models/segmentors/
dcan.py:66-338).

Bespoke VGG-like 6-stage FCN; cell (num_classes) and contour (2) logits are
1x1-tapped from stages 4/5/6, bilinearly upsampled to input size and
summed. Post-processing strips predicted contours before CCL + dilation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sliding import resize_bilinear
from ..builder import SEGMENTORS
from ..losses import batch_multiclass_dice_loss, cross_entropy
from ..nn import ConvModule, max_pool_2x
from .base import BaseSegmentor, parse_losses
from .unet import instance_postprocess

STAGE_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class DCANNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        taps = []
        for si, (ch, n) in enumerate(STAGE_PLAN):
            for ci in range(n):
                x = ConvModule(ch, (3, 3), use_norm=False, dtype=self.dtype,
                               name=f'stage{si + 1}_conv{ci}')(x, train)
            if si >= 3:
                taps.append(x)  # stage4, stage5 pre-pool features
            x = max_pool_2x(x)
        # stage 6: 7x7 conv -> dropout -> 1x1 conv
        x = ConvModule(1024, (7, 7), use_norm=False, dtype=self.dtype, name='stage6_conv0')(x, train)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = ConvModule(1024, (1, 1), use_norm=False, dtype=self.dtype, name='stage6_conv1')(x, train)
        taps.append(x)

        cell_logit = 0.
        cont_logit = 0.
        for i, t in enumerate(taps):
            t_up = resize_bilinear(t.astype(jnp.float32), (H, W))
            cell_logit = cell_logit + nn.Conv(self.num_classes, (1, 1), name=f'cell_tap{i}')(t_up)
            cont_logit = cont_logit + nn.Conv(2, (1, 1), name=f'cont_tap{i}')(t_up)
        return {'sem': cell_logit, 'cont': cont_logit}


@SEGMENTORS.register_module()
class DCAN(BaseSegmentor):

    softmax_heads = ('sem', 'cont')
    device_pp_supported = True
    device_pp_default_radius = 3

    def _device_sem_pred(self, fused):
        """Cell argmax with predicted contours stripped (reference
        dcan.py:193-217) before the fused sweep post-processing."""
        import jax.numpy as jnp
        sem_pred = jnp.argmax(fused['sem'], axis=-1).astype(jnp.int32)
        cont_pred = jnp.argmax(fused['cont'], axis=-1)
        return jnp.where(cont_pred > 0, 0, sem_pred)

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = DCANNet(num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        cell_logit, cont_logit = heads['sem'], heads['cont']
        sem_gt = batch['label']['sem_gt']
        cont_gt = (batch['label']['sem_gt_w_bound'] == self.num_classes).astype(jnp.int32)
        losses = {
            'cell_ce_loss': 5.0 * cross_entropy(cell_logit, sem_gt),
            'cont_ce_loss': 5.0 * cross_entropy(cont_logit, cont_gt),
            'cell_dice_loss': 0.5 * batch_multiclass_dice_loss(cell_logit, sem_gt, self.num_classes),
            'cont_dice_loss': 0.5 * batch_multiclass_dice_loss(cont_logit, cont_gt, 2),
        }
        losses.update(self.training_metrics(cell_logit, sem_gt))
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    def postprocess(self, fused):
        cell_pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        cont_pred = np.argmax(np.asarray(fused['cont']), axis=-1).astype(np.uint8)
        cell_pred[cont_pred > 0] = 0
        sem, inst = instance_postprocess(cell_pred, radius=self.test_cfg.get('radius', 3))
        return {'sem_pred': sem, 'inst_pred': inst}
