"""Multi-task CDNet (reference: tiseg/models/segmentors/
multi_task_cdnet.py:83-597 + the _debug variant).

Four heads — tc (3-class), sem (N-class), direction (classification or
angle regression), point/distance — with a flag-driven loss zoo
(train_cfg): sigmoid BCE+dice, focal, active-contour, level-set, intra-
instance variance, topological direction consistency, spatially-weighted
direction dice. Eval: TTA + per-view DDM, tc-boundary enhancement, CCL of
the boundary-stripped tc map re-expanded into the semantic canvas.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.ddm import generate_direction_differential_map, regression_to_dir_map
from ...ops.sliding import (resize_bilinear, reverse_tta_transform, tta_forward_views,
                            tta_transform, tta_views)
from ..backbones.vgg import VGG16BN
from ..builder import SEGMENTORS
from ..heads.multi_task_heads import MultiTaskCDHead, MultiTaskCDHeadTwobranch
from ..losses import (active_contour_loss, batch_multiclass_dice_loss, batch_multiclass_sigmoid_dice_loss,
                      binary_cross_entropy, cross_entropy, focal_loss, levelset_loss, mdice, mse_loss,
                      multiclass_dice_loss, one_hot, tdice, topological_loss, variance_loss)
from .base import BaseSegmentor, parse_losses
from .multi_task_unet import _mt_postprocess


def weighted_batch_dice_loss(logits, labels, num_classes, weight_map):
    """Spatially-weighted batch dice (reference multi_task_cdnet.py:30-80)."""
    probs = jax.nn.softmax(logits, axis=-1)
    target = one_hot(labels, num_classes)
    w = weight_map[..., None]
    inter = jnp.sum(probs * target * w, axis=(0, 1, 2))
    denom = jnp.sum(probs * w, axis=(0, 1, 2)) + jnp.sum(target * w, axis=(0, 1, 2))
    dice = (2 * inter + 1e-4) / (denom + 1e-4)
    return jnp.sum(1.0 - dice[1:])


class MTCDNetNet(nn.Module):
    num_classes: int
    num_angles: int = 8
    noau: bool = False
    use_regression: bool = False
    parallel: bool = False
    use_twobranch: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VGG16BN(dtype=self.dtype, axis_name=self.axis_name, name='backbone')(x, train)
        if self.use_twobranch:
            head = MultiTaskCDHeadTwobranch(num_classes=self.num_classes, num_angles=self.num_angles,
                                            noau=self.noau, use_regression=self.use_regression,
                                            dtype=self.dtype, axis_name=self.axis_name, name='head')
        else:
            head = MultiTaskCDHead(num_classes=self.num_classes, num_angles=self.num_angles, noau=self.noau,
                                   use_regression=self.use_regression, parallel=self.parallel,
                                   dtype=self.dtype, axis_name=self.axis_name, name='head')
        tc, sem, dir_, point = head(feats[-1], feats[:-1], train)
        return {'tc': tc, 'sem': sem, 'dir': dir_, 'point': point}


@SEGMENTORS.register_module()
class MultiTaskCDNet(BaseSegmentor):

    device_pp_supported = True  # via the override below

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        tc = self.train_cfg
        self.num_angles = tc.get('num_angles', 8)
        self.use_regression = tc.get('use_regression', False)
        self.use_distance = tc.get('use_distance', False)
        self.use_sigmoid = tc.get('use_sigmoid', False)
        self.use_ac = tc.get('use_ac', False)
        self.ac_len_weight = tc.get('ac_len_weight', 0)
        self.use_focal = tc.get('use_focal', False)
        self.use_level = tc.get('use_level', False)
        self.use_variance = tc.get('use_variance', False)
        self.use_tploss = tc.get('use_tploss', False)
        self.tploss_weight = tc.get('tploss_weight', False)
        self.tploss_dice = tc.get('tploss_dice', False)
        self.dir_weight_map = tc.get('dir_weight_map', False)
        self.net = MTCDNetNet(num_classes=num_classes, num_angles=self.num_angles, noau=tc.get('noau', False),
                              use_regression=self.use_regression, parallel=tc.get('parallel', False),
                              use_twobranch=tc.get('use_twobranch', False), dtype=dtype, axis_name=axis_name)

    # ------------------------------------------------------------------
    def loss(self, variables, batch, train: bool = True, rng=None):
        img = batch['data']['img']
        heads, new_state = self.forward_heads(variables, img, train=True, rng=rng, mutable=True)
        tc_logit, sem_logit, dir_logit, point_logit = heads['tc'], heads['sem'], heads['dir'], heads['point']

        label = batch['label']
        sem_gt = label['sem_gt']
        sem_gt_wb = label['sem_gt_w_bound']
        tc_gt = jnp.where((sem_gt_wb != 0) & (sem_gt_wb != self.num_classes), 1, sem_gt_wb)
        tc_gt = jnp.where(tc_gt > 1, 2, tc_gt)
        inst_gt = label.get('inst_gt')
        point_gt = label['dist_gt'] if self.use_distance else label['point_gt']
        if point_gt.ndim == point_logit.ndim - 1:
            point_gt = point_gt[..., None]
        dir_gt = label['reg_dir_gt'] if self.use_regression else label['dir_gt']
        weight_map = label.get('loss_weight_map') if self.dir_weight_map else None

        losses = {}
        alpha, beta, gamma = 3.0, 1.0, 5.0

        # -- tc branch
        losses['tc_ce_loss'] = alpha * cross_entropy(tc_logit, tc_gt)
        losses['tc_dice_loss'] = beta * multiclass_dice_loss(tc_logit, tc_gt, 3)

        # -- sem branch (flag zoo)
        if self.use_sigmoid:
            if self.use_ac:
                ac = []
                for i in range(1, self.num_classes):
                    probs_cls = jax.nn.sigmoid(sem_logit[..., i:i + 1])
                    gt_cls = (sem_gt == i)[..., None].astype(jnp.float32)
                    ac.append(active_contour_loss(probs_cls, gt_cls, len_weight=self.ac_len_weight,
                                                  w_area=self.train_cfg.get('ac_w_area', False)))
                losses['mask_ac_loss'] = gamma * sum(ac) / len(ac)
            else:
                losses['mask_bce_loss'] = alpha * binary_cross_entropy(sem_logit, sem_gt)
                losses['mask_dice_loss'] = beta * batch_multiclass_sigmoid_dice_loss(sem_logit, sem_gt,
                                                                                     self.num_classes)
        else:
            if self.use_focal:
                losses['mask_focal_loss'] = alpha * focal_loss(sem_logit, sem_gt, loss_type='softmax', robust=True)
            else:
                losses['mask_ce_loss'] = alpha * cross_entropy(sem_logit, sem_gt)
            losses['mask_dice_loss'] = beta * batch_multiclass_dice_loss(sem_logit, sem_gt, self.num_classes)
            if self.use_ac:
                probs = jax.nn.softmax(sem_logit, axis=-1)
                ac = []
                for i in range(1, self.num_classes):
                    gt_cls = (sem_gt == i)[..., None].astype(jnp.float32)
                    ac.append(active_contour_loss(probs[..., i:i + 1], gt_cls, len_weight=self.ac_len_weight,
                                                  w_area=self.train_cfg.get('ac_w_area', False)))
                losses['mask_ac_loss'] = 4 * gamma * sum(ac) / len(ac)
            if self.use_variance and inst_gt is not None:
                losses['mask_variance_loss'] = (gamma / 3) * variance_loss(sem_logit, inst_gt)
        if self.use_level:
            # level-set refinement on the (downsampled) image region per class
            down_img = img
            lv = []
            for i in range(1, self.num_classes):
                probs_cls = jax.nn.sigmoid(sem_logit[..., i:i + 1])
                gt_cls = (sem_gt == i)[..., None].astype(jnp.float32)
                lv.append(levelset_loss(probs_cls, down_img * gt_cls, 1.0))
            losses['mask_level_loss'] = sum(lv) / len(lv)

        # -- dir branch
        if self.use_regression:
            dg = dir_gt[..., None] if dir_gt.ndim == dir_logit.ndim - 1 else dir_gt
            losses['dir_degree_mse_loss'] = mse_loss(dir_logit, dg)
        else:
            ce = cross_entropy(dir_logit, dir_gt, weight=weight_map)
            if weight_map is not None:
                dice = weighted_batch_dice_loss(dir_logit, dir_gt, self.num_angles + 1, weight_map)
            else:
                dice = batch_multiclass_dice_loss(dir_logit, dir_gt, self.num_angles + 1)
            losses['dir_ce_loss'] = ce
            losses['dir_dice_loss'] = dice
        if self.use_tploss and not self.use_regression:
            pred_contour = jnp.argmax(tc_logit, axis=-1) == 2
            gt_contour = tc_gt == 2
            losses['dir_tp_loss'] = topological_loss(dir_logit, dir_gt, pred_contour, gt_contour,
                                                     use_regression=False, weight=self.tploss_weight,
                                                     num_angles=self.num_angles)

        # -- point branch
        losses['point_mse_loss'] = 3.0 * mse_loss(point_logit, point_gt)

        losses['mask_tdice'] = tdice(sem_logit, sem_gt, self.num_classes)
        losses['mask_mdice'] = mdice(sem_logit, sem_gt, self.num_classes)
        if not self.use_regression:
            losses['dir_tdice'] = tdice(dir_logit, dir_gt, self.num_angles + 1)
            losses['dir_mdice'] = mdice(dir_logit, dir_gt, self.num_angles + 1)

        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    # ------------------------------------------------------------------
    def inference(self, variables, img, ori_hw=None):
        mode = self.test_cfg.get('mode', 'whole')
        views = tta_views(self.test_cfg)

        def calc(patch):
            return self.forward_heads(variables, patch, train=False)

        ws = self.test_cfg.get('crop_size', (0,))[0]
        os_ = self.test_cfg.get('overlap_size', (0,))[0]
        outs = tta_forward_views(calc, img, views, mode, ws, os_,
                                 chunk=self.test_cfg.get('patch_batch', 8))
        tc_sum = sem_sum = point_sum = None
        dir_views = []
        for (rot, flip), out in zip(views, outs):
            out = {k: reverse_tta_transform(o, rot, flip) for k, o in out.items()}
            tc = jax.nn.softmax(out['tc'], axis=-1)
            sem = jax.nn.softmax(out['sem'], axis=-1)
            dir_ = out['dir'] if self.use_regression else jax.nn.softmax(out['dir'], axis=-1)
            tc_sum = tc if tc_sum is None else tc_sum + tc
            sem_sum = sem if sem_sum is None else sem_sum + sem
            point_sum = out['point'] if point_sum is None else point_sum + out['point']
            dir_views.append(dir_)

        n = len(views)
        tc_logit = tc_sum / n
        sem_logit = sem_sum / n
        point_logit = point_sum / n
        if ori_hw is not None:
            tc_logit = resize_bilinear(tc_logit, ori_hw)
            sem_logit = resize_bilinear(sem_logit, ori_hw)
            point_logit = resize_bilinear(point_logit, ori_hw)

        dd_sum = None
        dir_map0 = None
        for i, dv in enumerate(dir_views):
            if ori_hw is not None:
                dv = resize_bilinear(dv, ori_hw)
            if self.use_regression:
                background = jnp.argmax(tc_logit, axis=-1) == 0
                dir_map = regression_to_dir_map(dv[..., 0], background, self.num_angles)
            else:
                dv = dv.at[..., 0].set(dv[..., 0] * tc_logit[..., 0])
                dir_map = jnp.argmax(dv, axis=-1)
            if i == 0:
                dir_map0 = dir_map
            dd = generate_direction_differential_map(dir_map, self.num_angles + 1)
            dd_sum = dd if dd_sum is None else dd_sum + dd
        dd_map = dd_sum / n

        if self.test_cfg.get('if_ddm', False):
            tc_logit = self._ddm_enhancement(tc_logit, dd_map, point_logit)

        return {'tc': tc_logit, 'sem': sem_logit, 'dir_map': dir_map0}

    @staticmethod
    def _ddm_enhancement(tc_logit, dd_map, point_logit):
        """Boundary-channel enhancement (reference multi_task_cdnet.py
        :546-564; the dead ``foreground_map == 0.8`` branch is omitted)."""
        point = point_logit[..., 0]
        dist_map = point + 0.2
        fore_prob = (dist_map / jnp.max(dist_map))**2
        fore_mask = fore_prob > 0.6
        weight0 = 1 - fore_prob
        dd1 = dd_map - dd_map * fore_mask
        boundary = tc_logit[..., -1] * (1 + dd1) * weight0
        boundary = jnp.where(boundary >= 1, 0.95, boundary)
        return tc_logit.at[..., -1].set(boundary)

    def inference_and_postprocess(self, variables, img, ori_hw=None):
        """Fused device eval: TTA+DDM inference, then seed (boundary-
        stripped tc argmax) + canvas instance recovery in the same jit."""
        if not self.test_cfg.get('device_postprocess', False):
            return None
        from ...ops.pallas_sweep import mt_instance_postprocess_sweep
        fused = self.inference(variables, img, ori_hw=ori_hw)
        sem_pred = jnp.argmax(fused['sem'], axis=-1).astype(jnp.int32)
        tc = jnp.argmax(fused['tc'], axis=-1).astype(jnp.int32)
        seed = jnp.where(tc == 2, 0, tc)
        sem_out, inst = mt_instance_postprocess_sweep(
            sem_pred, seed, num_classes=self.num_classes,
            sweeps=self.test_cfg.get('pp_sweeps', 16),
            fill_sweeps=self.test_cfg.get('pp_fill_sweeps', 32))
        return {'sem_pred': sem_out, 'inst_pred': inst}

    def postprocess(self, fused):
        tc_pred = np.argmax(np.asarray(fused['tc']), axis=-1)
        sem_pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        bin_pred = tc_pred.copy()
        bin_pred[bin_pred == 2] = 0
        sem, inst = _mt_postprocess(bin_pred, sem_pred)
        out = {'sem_pred': sem, 'inst_pred': inst.astype(np.int32), 'tc_sem_pred': tc_pred.astype(np.uint8)}
        if fused.get('dir_map') is not None:  # direction debug panel
            out['dir_pred'] = np.asarray(fused['dir_map']).astype(np.int32)
            out['dir_num_angles'] = self.num_angles
        return out


@SEGMENTORS.register_module()
class MultiTaskCDNetDebug(MultiTaskCDNet):
    """Ablation twin used by the reference's *_debug config sweeps
    (multi_task_cdnet_debug.py) — same architecture/flags."""
