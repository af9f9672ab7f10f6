"""CDNet: direction-guided nuclei segmentor (reference: tiseg/models/
segmentors/cdnet.py:18-367).

VGG16-BN + CDHead (UNet decoder ending in DGM). Training supervises the
boundary-aware semantic map, the 9-way direction map and the center-point
heatmap. Eval fuses TTA views, derives a direction differential map (DDM)
per view, and uses the mean DDM (minus high-confidence center regions) to
enhance the boundary-class logit before the per-class CCL post-processing.
The whole TTA+DDM pipeline is one jit program.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.ddm import generate_direction_differential_map
from ...ops.sliding import (resize_bilinear, reverse_tta_transform, tta_forward_views,
                            tta_transform, tta_views)
from ..backbones.vgg import VGG16BN
from ..builder import SEGMENTORS
from ..heads.cd_head import CDHead
from ..losses import batch_multiclass_dice_loss, cross_entropy, mdice, mse_loss, tdice
from .base import BaseSegmentor, parse_losses
from .unet import instance_postprocess


class CDNetNet(nn.Module):
    num_classes: int
    num_angles: int = 8
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VGG16BN(dtype=self.dtype, axis_name=self.axis_name, name='backbone')(x, train)
        mask, dir_, point = CDHead(num_classes=self.num_classes + 1, num_angles=self.num_angles,
                                   dtype=self.dtype, axis_name=self.axis_name,
                                   name='head')(feats[-1], feats[:-1], train)
        return {'sem': mask, 'dir': dir_, 'point': point}


@SEGMENTORS.register_module()
class CDNet(BaseSegmentor):

    device_pp_supported = True
    device_pp_strip_boundary = True
    device_pp_default_radius = 3

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, num_angles: int = 8, dtype=jnp.float32,
                 axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.num_angles = num_angles
        self.net = CDNetNet(num_classes=num_classes, num_angles=num_angles, dtype=dtype, axis_name=axis_name)

    # -- int8 PTQ eval path (heads/quant_cdnet.py; opt-in) -------------------
    def prepare_inference(self, variables):
        """Fold BN once per eval program when the int8 route is active
        (test_cfg['int8_eval'] + a prior calibrate_int8 call); None keeps
        the default flax forward."""
        if not (self.test_cfg.get('int8_eval', False) and getattr(self, '_int8_fpq', None) is not None):
            return None
        from ..heads.quant_cdnet import build_cdnet_fp
        return {'fp': build_cdnet_fp(variables['params'], variables['batch_stats'], dtype=self.net.dtype),
                'int8': self._int8_fpq}

    def calibrate_int8(self, variables, calib_img):
        """One-batch abs-max calibration + weight quantization for the int8
        eval path (same contract as UNet.calibrate_int8). Runs as ONE jit
        program with the variables as arguments — see UNet.calibrate_int8
        for why (remote-link round-trips, compile-cache keys)."""
        import jax

        from ..heads.quant_cdnet import build_cdnet_fp, calibrate, quantize_params
        dtype = self.net.dtype

        def _calib(v, im):
            fp = build_cdnet_fp(v['params'], v['batch_stats'], dtype=dtype)
            return quantize_params(fp, calibrate(fp, im, dtype=dtype))

        self._int8_fpq = jax.jit(_calib)(variables, calib_img)
        return self._int8_fpq

    def forward_heads(self, variables, img, train: bool = False, rng=None, mutable=False, prep=None):
        if train or mutable:
            return super().forward_heads(variables, img, train=train, rng=rng, mutable=mutable)
        if prep is None:
            prep = self.prepare_inference(variables)
        if prep is None:
            return super().forward_heads(variables, img, train=train, rng=rng, mutable=mutable)
        from ..heads.quant_cdnet import apply_cdnet_q, apply_cdnet_q8, resident_ok
        if resident_ok(prep['int8']):
            # int8-RESIDENT executor: activations stay int8 between convs —
            # CDNet is HBM-bound, so halving activation bytes is the lever
            return apply_cdnet_q8(prep['fp'], prep['int8'], img, dtype=self.net.dtype)
        return apply_cdnet_q(prep['fp'], prep['int8'], img, dtype=self.net.dtype)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        sem_logit, dir_logit, point_logit = heads['sem'], heads['dir'], heads['point']
        sem_gt_wb = batch['label']['sem_gt_w_bound']
        dir_gt = batch['label']['dir_gt']
        point_gt = batch['label']['point_gt']
        if point_gt.ndim == point_logit.ndim - 1:
            point_gt = point_gt[..., None]
        weight_map = batch['label'].get('loss_weight_map') if self.train_cfg.get('if_weighted_loss', False) else None

        losses = {
            'sem_ce_loss': cross_entropy(sem_logit, sem_gt_wb, weight=weight_map),
            'sem_dice_loss': batch_multiclass_dice_loss(sem_logit, sem_gt_wb, self.num_classes + 1),
            'dir_ce_loss': cross_entropy(dir_logit, dir_gt, weight=weight_map),
            'dir_dice_loss': batch_multiclass_dice_loss(dir_logit, dir_gt, self.num_angles + 1),
            'point_mse_loss': mse_loss(point_logit, point_gt),
        }
        losses.update({
            'sem_tdice': tdice(sem_logit, sem_gt_wb, self.num_classes),
            'sem_mdice': mdice(sem_logit, sem_gt_wb, self.num_classes),
            'dir_tdice': tdice(dir_logit, dir_gt, self.num_angles + 1),
            'dir_mdice': mdice(dir_logit, dir_gt, self.num_angles + 1),
        })
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    # ------------------------------------------------------------------
    def inference(self, variables, img, ori_hw=None):
        """TTA + per-view DDM + boundary enhancement (reference
        cdnet.py:154-219). Returns {'sem', 'dir_map'}."""
        mode = self.test_cfg.get('mode', 'whole')
        views = tta_views(self.test_cfg)
        prep = self.prepare_inference(variables)

        def calc(patch):
            return self.forward_heads(variables, patch, train=False, prep=prep)

        ws = self.test_cfg.get('crop_size', (0,))[0]
        os_ = self.test_cfg.get('overlap_size', (0,))[0]
        outs = tta_forward_views(calc, img, views, mode, ws, os_,
                                 chunk=self.test_cfg.get('patch_batch', 8))
        sem_sum = point_sum = None
        dir_probs = []
        for (rot, flip), out in zip(views, outs):
            out = {k: reverse_tta_transform(o, rot, flip) for k, o in out.items()}
            sem = jax.nn.softmax(out['sem'], axis=-1)
            dir_ = jax.nn.softmax(out['dir'], axis=-1)
            sem_sum = sem if sem_sum is None else sem_sum + sem
            point_sum = out['point'] if point_sum is None else point_sum + out['point']
            dir_probs.append(dir_)

        n = len(views)
        sem_logit = sem_sum / n
        point_logit = point_sum / n
        if ori_hw is not None:
            sem_logit = resize_bilinear(sem_logit, ori_hw)
            point_logit = resize_bilinear(point_logit, ori_hw)

        dd_sum = None
        dir_map0 = None
        for i, dp in enumerate(dir_probs):
            if ori_hw is not None:
                dp = resize_bilinear(dp, ori_hw)
            # gate the background direction prob by the fused sem background
            dp = dp.at[..., 0].set(dp[..., 0] * sem_logit[..., 0])
            dir_map = jnp.argmax(dp, axis=-1)
            if i == 0:
                dir_map0 = dir_map
            dd = generate_direction_differential_map(dir_map, self.num_angles + 1)
            dd_sum = dd if dd_sum is None else dd_sum + dd
        dd_map = dd_sum / n

        if self.test_cfg.get('if_ddm', False):
            sem_logit = self._ddm_enhancement(sem_logit, dd_map, point_logit)

        return {'sem': sem_logit, 'dir_map': dir_map0}

    @staticmethod
    def _ddm_enhancement(sem_logit, dd_map, point_logit):
        point = point_logit[..., 0]
        point_mask = (point / jnp.max(point)) > 0.2
        dd_map = dd_map - dd_map * point_mask
        boundary = (sem_logit[..., -1] + dd_map) * (1 + dd_map)
        return sem_logit.at[..., -1].set(boundary)

    def postprocess(self, fused):
        out = self._postprocess_sem_inst(fused)
        if fused.get('dir_map') is not None:  # direction debug panel (datasets/utils/draw.py)
            out['dir_pred'] = np.asarray(fused['dir_map']).astype(np.int32)
            out['dir_num_angles'] = self.num_angles
        return out

    def _postprocess_sem_inst(self, fused):
        pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        pred[pred == self.num_classes] = 0
        sem, inst = instance_postprocess(pred, radius=self.test_cfg.get('radius', 3))
        return {'sem_pred': sem, 'inst_pred': inst}
