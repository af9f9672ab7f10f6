"""UNet-S2D: the space-to-depth-stem UNet variant (performance model).

A NUMERICS-CHANGING rewrite of the UNet geometry for TPU (VERDICT r4
item 1; no reference analog — reference UNet is tiseg/models/segmentors/
unet.py:16-124 with the torchvision VGG16-BN stem): every measured SOL
overage of the standard model lives in its 256^2-resolution stages —
stage0 runs at 2.2x the int8 roofline (3-channel input conv, odd phase
grids) and the phase decoders at ~3x (docs/ROUND4.md). This variant
removes full-resolution compute entirely:

- **stem**: the input image is space-to-depth'd (2x2 -> 12 channels at
  H/2 x W/2) and stage0's two 64-channel convs run at half resolution on
  a 12-channel input (contraction depth 108 vs 27 — MXU-friendly, and
  4x fewer conv positions);
- **stage1** drops its leading max-pool (the stem already downsampled);
  stages 2-4 and the bottom pool are the standard VGG16-BN geometry;
- **decoder**: decode4..decode1 are the standard UNetLayers; decode0
  needs no transposed conv (its skip is already at H/2) — one 3x3 conv
  on [decode1-out, stem-out] and a 1x1 classifier emitting 4*K channels
  that depth-to-space to the full-resolution K-class logits.

Accuracy is a measured question: the variant trains from scratch and is
only ever selected by the held-out instance-accuracy gate in bench.py
(<= 0.5 Aji pts vs the standard bf16 model on the same workload), the
same auto-reverting mechanism that gates int8.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import SEGMENTORS
from ..heads.unet_head import UNetLayer
from ..nn import ConvModule, max_pool_2x
from .unet import UNet

VGG16_STAGE_CONVS = (2, 2, 3, 3, 3)
VGG16_STAGE_CHANNELS = (64, 128, 256, 512, 512)
DEC_DIMS = (16, 32, 64, 128, 256)


def s2d2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major (py, px, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def d2s2(y):
    """(B, h, w, 4C) -> (B, 2h, 2w, C); inverse of :func:`s2d2`."""
    B, h, w, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, h, w, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * h, 2 * w, C)


class UNetS2DNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, img, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = s2d2(img)
        x = ConvModule(64, (3, 3), name='stem_conv0', **kw)(x, train)
        s0 = ConvModule(64, (3, 3), name='stem_conv1', **kw)(x, train)

        x = s0
        skips = [s0]
        for stage_idx in range(1, 5):
            if stage_idx > 1:
                x = max_pool_2x(x)
            for ci in range(VGG16_STAGE_CONVS[stage_idx]):
                x = ConvModule(VGG16_STAGE_CHANNELS[stage_idx], (3, 3),
                               name=f'stage{stage_idx}_conv{ci}', **kw)(x, train)
            skips.append(x)
        x = max_pool_2x(x)

        for idx in range(4, 0, -1):
            x = UNetLayer(DEC_DIMS[idx], 2, name=f'decode{idx}', **kw)(x, skips[idx], train)
        x = jnp.concatenate([x, s0], axis=-1)
        x = ConvModule(DEC_DIMS[0], (3, 3), name='decode0_conv', **kw)(x, train)
        y = nn.Conv(4 * self.num_classes, (1, 1), dtype=self.dtype, name='cls')(x)
        return {'sem': d2s2(y)}


@SEGMENTORS.register_module()
class UNetS2D(UNet):
    """UNet with the s2d stem / d2s head. Same losses, labels and
    post-processing as :class:`UNet`; its own fast + int8 executors
    (heads/s2d_exec.py)."""

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg, dtype=dtype, axis_name=axis_name)
        self.net = UNetS2DNet(num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    def _fast_eval_ok(self, hw) -> bool:
        return hw[0] % 64 == 0 and hw[1] % 64 == 0

    def prepare_inference(self, variables):
        if not self._fast_eval_enabled():
            return None
        from ..heads.s2d_exec import build_s2d_params
        prep = {'s2d': build_s2d_params(variables['params'], variables['batch_stats'],
                                        dtype=self.net.dtype)}
        if self.test_cfg.get('int8_eval', False) and getattr(self, '_int8_fpq', None) is not None:
            prep['int8'] = self._int8_fpq
        return prep

    def calibrate_int8(self, variables, calib_img, margin: float = 1.0):
        import jax

        from ..heads.s2d_exec import calibrate_s2d, quantize_s2d
        self._int8_fpq = None
        if not self._fast_eval_enabled():
            raise ValueError('int8 eval requires the fast eval path (fast_eval=True)')
        dtype = self.net.dtype

        def _calib(v, im):
            fp = self.prepare_inference(v)['s2d']
            scales = calibrate_s2d(fp, im, dtype=dtype)
            return quantize_s2d(fp, scales, margin=margin)

        self._int8_fpq = jax.jit(_calib)(variables, calib_img)
        return self._int8_fpq

    def forward_heads(self, variables, img, train: bool = False, rng=None, mutable=False, prep=None):
        if (train or mutable or not self._fast_eval_enabled()
                or not self._fast_eval_ok(img.shape[1:3])):
            # skip UNet's mixin fast path — geometry differs
            from .base import BaseSegmentor
            return BaseSegmentor.forward_heads(self, variables, img, train=train, rng=rng,
                                               mutable=mutable)
        from ..heads.s2d_exec import apply_s2d, apply_s2d_q8
        if prep is None:
            prep = self.prepare_inference(variables)
        if 'int8' in prep:
            return {'sem': apply_s2d_q8(prep['s2d'], prep['int8'], img, dtype=self.net.dtype)}
        return {'sem': apply_s2d(prep['s2d'], img, dtype=self.net.dtype)}

    def inference_and_postprocess(self, variables, img, ori_hw=None):
        from ...ops.sliding import tta_views
        use_pred = (self.test_cfg.get('device_postprocess', False)
                    and ori_hw is None and self.test_cfg.get('mode', 'whole') == 'whole'
                    and len(tta_views(self.test_cfg)) == 1
                    and self._fast_eval_enabled() and self._fast_eval_ok(img.shape[1:3])
                    and self.test_cfg.get('int8_eval', False)
                    and getattr(self, '_int8_fpq', None) is not None)
        if use_pred:
            from ..heads.s2d_exec import apply_s2d_q8
            prep = self.prepare_inference(variables)
            sem_pred = apply_s2d_q8(prep['s2d'], prep['int8'], img, dtype=self.net.dtype,
                                    out='pred')
            sem_out, inst_out = self._device_instance_pp(sem_pred)
            return {'sem_pred': sem_out, 'inst_pred': inst_out}
        # generic fused route (bf16): inference + device post-proc
        from .base import BaseSegmentor
        return BaseSegmentor.inference_and_postprocess(self, variables, img, ori_hw)
