"""Multi-task UNet & CUNet (reference: tiseg/models/segmentors/
multi_task_unet.py:19-241, multi_task_cunet.py:23-271).

Two sibling decoder branches: an auxiliary inner/three-class map used to
seed instances, and the full semantic map used to constrain their
re-expansion via align_foreground.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils import morphology as m
from ..backbones.vgg import VGG16BN
from ..builder import SEGMENTORS
from ..heads.multi_task_heads import MultiTaskUNetHead
from ..losses import batch_multiclass_dice_loss, cross_entropy, multiclass_dice_loss
from ..utils.postprocess import align_foreground
from .base import BaseSegmentor, parse_losses


class MTUNetNet(nn.Module):
    aux_classes: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VGG16BN(dtype=self.dtype, axis_name=self.axis_name, name='backbone')(x, train)
        aux, sem = MultiTaskUNetHead(num_classes=(self.aux_classes, self.num_classes), dtype=self.dtype,
                                     axis_name=self.axis_name, name='head')(feats[-1], feats[:-1], train)
        return {'aux': aux, 'sem': sem}


def _mt_postprocess(seed_mask: np.ndarray, sem_pred: np.ndarray, fill_first: bool = False):
    """Shared multi-task instance recovery: clean the semantic canvas, CCL
    the seed map (4-conn), re-expand into the canvas (reference
    multi_task_unet.py:83-105)."""
    sem_canvas = np.zeros_like(sem_pred, dtype=np.uint8)
    for sem_id in np.unique(sem_pred):
        if sem_id == 0:
            continue
        mask = sem_pred == sem_id
        mask = m.remove_small_objects(mask, 5)
        mask = m.binary_fill_holes(mask)
        sem_canvas[mask] = sem_id
    inst_pred = m.label(seed_mask, connectivity=1)
    try:  # native C++ BFS when built; numpy wave propagation otherwise
        from ... import native
        inst_pred = native.align_foreground(inst_pred, sem_canvas > 0, 20)
    except Exception:
        inst_pred = align_foreground(inst_pred, sem_canvas > 0, 20)
    return sem_canvas, inst_pred


class _MTDevicePP:
    """Fused device eval for the multi-task family: inference + per-class
    canvas cleanup + seed CCL + bounded align_foreground in ONE jit
    (ops.pallas_sweep.mt_instance_postprocess_sweep)."""

    device_pp_supported = True

    def _device_seed_pred(self, fused):
        """Binary seed map for the instance CCL (subclasses strip the
        boundary class)."""
        return jnp.argmax(fused['aux'], axis=-1).astype(jnp.int32)

    def inference_and_postprocess(self, variables, img, ori_hw=None):
        if not self.test_cfg.get('device_postprocess', False):
            return None
        from ...ops.pallas_sweep import mt_instance_postprocess_sweep
        fused = self.inference(variables, img, ori_hw=ori_hw)
        sem_pred = jnp.argmax(fused['sem'], axis=-1).astype(jnp.int32)
        sem_out, inst = mt_instance_postprocess_sweep(
            sem_pred, self._device_seed_pred(fused), num_classes=self.num_classes,
            sweeps=self.test_cfg.get('pp_sweeps', 16),
            fill_sweeps=self.test_cfg.get('pp_fill_sweeps', 32))
        return {'sem_pred': sem_out, 'inst_pred': inst}


@SEGMENTORS.register_module()
class MultiTaskUNet(_MTDevicePP, BaseSegmentor):

    softmax_heads = ('aux', 'sem')

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = MTUNetNet(aux_classes=2, num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        inner_logit, sem_logit = heads['aux'], heads['sem']
        sem_gt = batch['label']['sem_gt']
        inner_gt = (batch['label']['sem_gt_inner'] > 0).astype(jnp.int32)
        weight_map = batch['label']['loss_weight_map']
        losses = {
            'sem_ce_loss': 5.0 * cross_entropy(sem_logit, sem_gt, weight=weight_map),
            'sem_dice_loss': 0.5 * batch_multiclass_dice_loss(sem_logit, sem_gt, self.num_classes),
            'three_class_ce_loss': 5.0 * cross_entropy(inner_logit, inner_gt, weight=weight_map),
            'three_class_dice_loss': 0.5 * multiclass_dice_loss(inner_logit, inner_gt, 2),
        }
        losses.update(self.training_metrics(sem_logit, sem_gt))
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    def postprocess(self, fused):
        inner_pred = np.argmax(np.asarray(fused['aux']), axis=-1)
        sem_pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        sem, inst = _mt_postprocess(inner_pred.copy(), sem_pred)
        return {'sem_pred': sem, 'inst_pred': inst.astype(np.int32)}


@SEGMENTORS.register_module()
class MultiTaskCUNet(_MTDevicePP, BaseSegmentor):
    """Aux branch predicts the 3-class boundary-aware map; instances = CCL
    of the boundary-stripped tc map, re-expanded into the semantic canvas."""

    softmax_heads = ('aux', 'sem')

    def _device_seed_pred(self, fused):
        tc = jnp.argmax(fused['aux'], axis=-1).astype(jnp.int32)
        return jnp.where(tc == 2, 0, tc)

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = MTUNetNet(aux_classes=3, num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        tc_logit, sem_logit = heads['aux'], heads['sem']
        sem_gt = batch['label']['sem_gt']
        sem_gt_wb = batch['label']['sem_gt_w_bound']
        tc_gt = jnp.where((sem_gt_wb != 0) & (sem_gt_wb != self.num_classes), 1, sem_gt_wb)
        tc_gt = jnp.where(tc_gt > 1, 2, tc_gt)
        losses = {
            'sem_ce_loss': 5.0 * cross_entropy(sem_logit, sem_gt),
            'sem_dice_loss': 0.5 * batch_multiclass_dice_loss(sem_logit, sem_gt, self.num_classes),
            'three_class_ce_loss': 5.0 * cross_entropy(tc_logit, tc_gt),
            'three_class_dice_loss': 0.5 * multiclass_dice_loss(tc_logit, tc_gt, 3),
        }
        losses.update(self.training_metrics(sem_logit, sem_gt))
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    def postprocess(self, fused):
        tc_pred = np.argmax(np.asarray(fused['aux']), axis=-1)
        sem_pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        bin_pred = tc_pred.copy()
        bin_pred[bin_pred == 2] = 0
        sem, inst = _mt_postprocess(bin_pred, sem_pred)
        return {'sem_pred': sem, 'inst_pred': inst.astype(np.int32), 'tc_sem_pred': tc_pred.astype(np.uint8)}


@SEGMENTORS.register_module()
class MultiTaskCUNetDebug(MultiTaskCUNet):
    """Boundary-width ablation twin (reference multi_task_cunet_debug.py:
    19-276): same architecture; eval additionally surfaces the predicted
    and ground-truth three-class maps for the d{dilation}e{erosion}
    config sweeps' visual debugging."""

    def postprocess(self, fused):
        out = super().postprocess(fused)
        out['tc_pred'] = out['tc_sem_pred']
        if 'sem_gt_w_bound' in fused:
            tc_gt = np.asarray(fused['sem_gt_w_bound'])
            tc_gt = np.where((tc_gt != 0) & (tc_gt != self.num_classes), 1, tc_gt)
            out['tc_gt'] = np.where(tc_gt > 1, 2, tc_gt).astype(np.uint8)
        return out
