"""DIST: distance-map regression segmentor (reference: tiseg/models/
segmentors/dist.py:134-412).

Bespoke 5-stage UNet (BN+ReLU convs, bilinear 2x upsampling) with a
semantic head and a 1-channel distance regression head; instances come
from the dynamic watershed on the regressed distance map.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sliding import resize_bilinear
from ..builder import SEGMENTORS
from ..losses import batch_multiclass_dice_loss, cross_entropy, mse_loss
from ..nn import ConvModule, max_pool_2x
from ..utils.postprocess import dynamic_watershed
from .base import BaseSegmentor, parse_losses

STAGE_CH = (32, 64, 128, 256, 512)


class DISTNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    def _convs(self, x, ch, n, name, train):
        for i in range(n):
            x = ConvModule(ch, (3, 3), dtype=self.dtype, axis_name=self.axis_name,
                           name=f'{name}_conv{i}')(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for si, ch in enumerate(STAGE_CH):
            if si > 0:
                x = max_pool_2x(x)
            x = self._convs(x, ch, 2, f'down{si + 1}', train)
            if si < 4:
                skips.append(x)

        for si in range(3, -1, -1):
            ch = STAGE_CH[si]
            x = ConvModule(ch, (3, 3), dtype=self.dtype, axis_name=self.axis_name,
                           name=f'upconv{si + 1}')(x, train)
            x = resize_bilinear(x.astype(jnp.float32), (x.shape[1] * 2, x.shape[2] * 2)).astype(x.dtype)
            x = jnp.concatenate([skips[si], x], axis=-1)
            x = self._convs(x, ch, 2, f'up{si + 1}', train)

        sem = nn.Conv(self.num_classes, (1, 1), name='sem_head')(x)
        dist = nn.Conv(1, (1, 1), name='dist_head')(x)
        return {'sem': sem, 'dist': dist}


@SEGMENTORS.register_module()
class DIST(BaseSegmentor):

    softmax_heads = ('sem',)  # 'dist' is mean-fused raw regression

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = DISTNet(num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        sem_logit, dist_logit = heads['sem'], heads['dist']
        sem_gt = batch['label']['sem_gt']
        dist_gt = batch['label']['dist_gt']
        if dist_gt.ndim == dist_logit.ndim - 1:
            dist_gt = dist_gt[..., None]
        losses = {
            'sem_ce_loss': 5.0 * cross_entropy(sem_logit, sem_gt),
            'sem_dice_loss': 0.5 * batch_multiclass_dice_loss(sem_logit, sem_gt, self.num_classes),
            'dist_mse_loss': mse_loss(dist_logit, dist_gt),
        }
        losses.update(self.training_metrics(sem_logit, sem_gt))
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    device_pp_supported = True  # via the override below

    def inference_and_postprocess(self, variables, img, ori_hw=None):
        """Fused device eval: inference + dynamic watershed in one jit
        (reference dist.py:31-129 semantics via ops.dist_ws)."""
        if not self.test_cfg.get('device_postprocess', False):
            return None
        import jax
        from ...ops.dist_ws import dynamic_watershed_device
        fused = self.inference(variables, img, ori_hw=ori_hw)
        sem_pred = jnp.argmax(fused['sem'], axis=-1).astype(jnp.uint8)
        dist = jnp.clip(fused['dist'][..., 0], 0, 255).astype(jnp.int32)
        inst = jax.vmap(lambda d: dynamic_watershed_device(d, 0.0, 0.5))(dist)
        return {'sem_pred': sem_pred, 'inst_pred': inst}

    def postprocess(self, fused):
        sem_pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        dist = np.asarray(fused['dist'])[..., 0].copy()
        dist = np.clip(dist, 0, 255).astype(np.int32)
        if self.test_cfg.get('device_postprocess', False):
            import jax.numpy as jnp
            from ...ops.dist_ws import dynamic_watershed_device
            inst_pred = np.asarray(dynamic_watershed_device(jnp.asarray(dist), 0.0, 0.5))
        else:
            inst_pred = dynamic_watershed(dist, 0.0, 0.5)
        return {'sem_pred': sem_pred, 'inst_pred': inst_pred.astype(np.int32)}
