"""UNet segmentor (reference: tiseg/models/segmentors/unet.py:16-124).

VGG16-BN encoder + UNet decoder; trained on the 1px-eroded semantic target
(``sem_gt_inner``) with the UNet border weight map; instances recovered at
eval by per-class fill-holes -> remove-small -> CCL -> disk dilation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils import morphology as m
from ..backbones.vgg import VGG16BN
from ..builder import SEGMENTORS
from ..heads.unet_head import UNetHead
from ..losses import batch_multiclass_dice_loss, cross_entropy
from .base import BaseSegmentor, parse_losses


class UNetNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VGG16BN(dtype=self.dtype, axis_name=self.axis_name, name='backbone')(x, train)
        sem = UNetHead(num_classes=self.num_classes, dtype=self.dtype, axis_name=self.axis_name,
                       name='head')(feats[-1], feats[:-1], train)
        return {'sem': sem}


def instance_postprocess(sem_pred: np.ndarray, radius: int = 1, min_size: int = 5):
    """Model-free instance extraction (reference unet.py:71-93): per semantic
    class: fill holes, drop objects <min_size, 8-conn CCL, disk dilation;
    later classes overwrite earlier ones."""
    inst_pred = np.zeros_like(sem_pred, dtype=np.int32)
    out_sem = np.zeros_like(sem_pred, dtype=np.uint8)
    cur = 0
    for sem_id in np.unique(sem_pred):
        if sem_id == 0:
            continue
        mask = sem_pred == sem_id
        mask = m.binary_fill_holes(mask)
        mask = m.remove_small_objects(mask, min_size)
        inst = m.label(mask)
        inst = m.dilation(inst, m.disk(radius))
        inst[inst > 0] += cur
        inst_pred[inst > 0] = 0
        inst_pred += inst
        cur += len(np.unique(inst))
        out_sem[inst > 0] = sem_id
    return out_sem, inst_pred


class FastVGGUNetEval:
    """Mixin: phase-space fast eval forward for VGG16BN + UNetHead nets
    (tiseg_tpu.models.heads.fast_decode). Exact rewrite of the flax eval
    path with BN folded; used automatically when test_cfg['fast_eval']
    (default on) and the input is /4-divisible."""

    def _fast_eval_ok(self, hw) -> bool:
        return hw[0] % 4 == 0 and hw[1] % 4 == 0

    def _fast_eval_enabled(self) -> bool:
        return self.test_cfg.get('fast_eval', True)

    def prepare_inference(self, variables):
        """Fold BN + build phase-space weights once per eval program (the
        scatter is ~100 small ops; rebuilding it inside a TTA/patch loop
        would repeat per call). If ``test_cfg['int8_eval']`` is set AND
        ``calibrate_int8`` has been called, the prep additionally carries
        the int8 parameter tree and eval routes through the quantized
        convs (heads/quant_decode.py)."""
        if not self._fast_eval_enabled():
            return None
        from ..heads.fast_decode import build_fast_unet_head_params, build_fast_vgg16_params
        dtype = self.net.dtype
        prep = {
            'vgg': build_fast_vgg16_params(variables['params']['backbone'],
                                           variables['batch_stats']['backbone'], dtype=dtype),
            'head': build_fast_unet_head_params(variables['params']['head'],
                                                variables['batch_stats']['head'], dtype=dtype),
        }
        if self.test_cfg.get('int8_eval', False) and getattr(self, '_int8_fpq', None) is not None:
            prep['int8'] = self._int8_fpq
        return prep

    def calibrate_int8(self, variables, calib_img, margin: float = 1.0):
        """One-batch abs-max calibration + weight quantization for the int8
        eval path. Call once with a representative image batch; subsequent
        jitted eval programs pick the quantized route up via
        ``test_cfg['int8_eval']``.

        BN-fold + calibration forward + weight quantization run as ONE jit
        program with the variables as arguments (not closure constants):
        eager per-tensor quantization ops each cost a device round-trip on
        a remote-TPU link, and closure-captured weights bake into the HLO
        as constants, defeating the persistent compile cache."""
        import jax

        from ..heads.quant_decode import calibrate, quantize_params
        self._int8_fpq = None
        if not self._fast_eval_enabled():
            raise ValueError('int8 eval requires the fast eval path (fast_eval=True)')
        dtype = self.net.dtype

        def _calib(v, im):
            prep = self.prepare_inference(v)
            scales = calibrate(prep['vgg'], prep['head'], im, dtype=dtype)
            return quantize_params(prep['vgg'], prep['head'], scales, margin=margin)

        self._int8_fpq = jax.jit(_calib)(variables, calib_img)
        return self._int8_fpq

    def inference_and_postprocess(self, variables, img, ori_hw=None):
        """Fast fused-eval route: when the int8-resident executor is active
        and the eval is single-view whole-mode at native resolution, the
        semantic plane is produced by the ``out='pred'`` executor (argmax
        taken in the phase layout; full-res logits never materialized) and
        fed straight to the device instance post-processor. Bit-identical
        predictions to the logits route (argmax commutes with d2s and with
        the single-view softmax fusion)."""
        from ..heads.quant_decode import apply_fast_unet_q8, resident_ok
        from ...ops.sliding import tta_views
        use_pred = (self.device_pp_supported and self.test_cfg.get('device_postprocess', False)
                    and ori_hw is None and self.test_cfg.get('mode', 'whole') == 'whole'
                    and len(tta_views(self.test_cfg)) == 1
                    and self._fast_eval_enabled() and self._fast_eval_ok(img.shape[1:3])
                    and self.test_cfg.get('int8_eval', False)
                    and getattr(self, '_int8_fpq', None) is not None)
        if use_pred:
            prep = self.prepare_inference(variables)
            if 'int8' in prep and resident_ok(prep['head']):
                sem_pred = apply_fast_unet_q8(prep['vgg'], prep['head'], prep['int8'],
                                              img, dtype=self.net.dtype, out='pred')
                if self.device_pp_strip_boundary:
                    sem_pred = jnp.where(sem_pred == self.num_classes, 0, sem_pred)
                sem_out, inst_out = self._device_instance_pp(sem_pred)
                return {'sem_pred': sem_out, 'inst_pred': inst_out}
        return super().inference_and_postprocess(variables, img, ori_hw)

    def forward_heads(self, variables, img, train: bool = False, rng=None, mutable=False, prep=None):
        if (train or mutable or not self._fast_eval_enabled()
                or not self._fast_eval_ok(img.shape[1:3])):
            return super().forward_heads(variables, img, train=train, rng=rng, mutable=mutable)
        from ..heads.fast_decode import apply_fast_unet_head, apply_fast_vgg16
        dtype = self.net.dtype
        if prep is None:
            prep = self.prepare_inference(variables)
        if 'int8' in prep:
            from ..heads.quant_decode import apply_fast_unet_q, apply_fast_unet_q8, resident_ok
            if resident_ok(prep['head']):
                # int8-RESIDENT executor: same quantization sites/scales,
                # activations materialized int8 between convs (halves the
                # memory-bound program's HBM traffic — docs/ROUND3.md)
                return {'sem': apply_fast_unet_q8(prep['vgg'], prep['head'], prep['int8'],
                                                  img, dtype=dtype)}
            return {'sem': apply_fast_unet_q(prep['vgg'], prep['head'], prep['int8'],
                                             img, dtype=dtype)}
        feats = apply_fast_vgg16(prep['vgg'], img, dtype=dtype)
        sem = apply_fast_unet_head(prep['head'], feats[-1], feats[:-1], dtype=dtype)
        return {'sem': sem}


@SEGMENTORS.register_module()
class UNet(FastVGGUNetEval, BaseSegmentor):

    device_pp_supported = True

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = UNetNet(num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        sem_logit = heads['sem']
        sem_gt = batch['label']['sem_gt_inner']
        weight_map = batch['label']['loss_weight_map']

        losses = {}
        ce = cross_entropy(sem_logit, sem_gt, weight=weight_map)
        dice = batch_multiclass_dice_loss(sem_logit, sem_gt, self.num_classes)
        losses['sem_ce_loss'] = 5.0 * ce
        losses['sem_dice_loss'] = 0.5 * dice
        losses.update(self.training_metrics(sem_logit, sem_gt))
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    def postprocess(self, fused):
        sem_pred = np.argmax(np.asarray(fused['sem']), axis=-1)
        radius = self.test_cfg.get('radius', 1)
        mode = self.test_cfg.get('device_postprocess', False)
        if mode:
            # TPU path: fill holes / CCL / dilation on device. 'xla' selects
            # the exact fixed-point scan path; 'pallas-rounds' the round-1
            # per-pixel propagation kernels; default is the fused
            # segmented-sweep kernel (exact when component geodesics have
            # <= pp_sweeps bends).
            import jax.numpy as jnp
            if mode == 'xla':
                from ...ops.ccl import instance_postprocess_device
                sem, inst = instance_postprocess_device(jnp.asarray(sem_pred.astype(np.int32)), radius=radius,
                                                        num_classes=self.num_classes,
                                                        rounds=self.test_cfg.get('pp_rounds'))
            elif mode == 'pallas-rounds':
                from ...ops.pallas_postproc import instance_postprocess_pallas
                sem, inst = instance_postprocess_pallas(jnp.asarray(sem_pred.astype(np.int32)), radius=radius,
                                                        num_classes=self.num_classes,
                                                        ccl_rounds=self.test_cfg.get('pp_rounds', 128) or 128)
            else:
                sem, inst = self._device_instance_pp(jnp.asarray(sem_pred.astype(np.int32)))
            return {'sem_pred': np.asarray(sem), 'inst_pred': np.asarray(inst)}
        sem, inst = instance_postprocess(sem_pred.astype(np.uint8), radius=radius)
        return {'sem_pred': sem, 'inst_pred': inst}
