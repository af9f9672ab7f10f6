"""HoVer-Net (reference: tiseg/models/segmentors/hovernet.py:26-552).

ResNet50 trunk with a stride-1 stem and no stem pool (pyramid strides
1/2/4/8), 1x1 bottleneck to 1024ch, three dense-block decoder branches
(tp = types, np = foreground, hv = horizontal/vertical maps) joined by
Kronecker 2x upsampling + skip additions. TTA fuses sem/fore with
softmax-mean but keeps ONLY the first view's HV maps (reference
hovernet.py:404-408). Instances come from the Sobel/marker watershed.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..backbones.resnet import ResNetExt
from ..builder import SEGMENTORS
from ..losses import batch_multiclass_dice_loss, cross_entropy, gradient_mse_loss, mdice, mse_loss, tdice
from ..nn import upsample_2x_nearest
from ..utils.postprocess import hover_post_proc
from .base import BaseSegmentor, parse_losses


class HoverDenseBlock(nn.Module):
    """Pre-activation dense block: unit = BN-ReLU-conv1x1(128) -> BN-ReLU
    -convKxK(32, grouped); concat; final BN-ReLU (reference
    hovernet.py:62-122)."""
    unit_ch: Sequence[int] = (128, 32)
    ksize: int = 3
    unit_count: int = 8
    split: int = 4
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                axis_name=self.axis_name if train else None, name=name)

        for u in range(self.unit_count):
            y = nn.relu(bn(f'u{u}_bn1')(x))
            y = nn.Conv(self.unit_ch[0], (1, 1), use_bias=False, dtype=self.dtype, name=f'u{u}_conv1')(y)
            y = nn.relu(bn(f'u{u}_bn2')(y))
            y = nn.Conv(self.unit_ch[1], (self.ksize, self.ksize), padding='SAME', use_bias=False,
                        feature_group_count=self.split, dtype=self.dtype, name=f'u{u}_conv2')(y)
            x = jnp.concatenate([x, y], axis=-1)
        return nn.relu(bn('blk_bn')(x))


class HoverDecoderBranch(nn.Module):
    out_ch: int
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        d0, d1, d2, d3 = feats
        k = (self.ksize, self.ksize)

        u3 = upsample_2x_nearest(d3) + d2
        u3 = nn.Conv(256, k, padding='SAME', use_bias=False, dtype=self.dtype, name='u3_conva')(u3)
        u3 = HoverDenseBlock(unit_count=8, ksize=self.ksize, dtype=self.dtype, axis_name=self.axis_name,
                             name='u3_dense')(u3, train)
        u3 = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype, name='u3_convf')(u3)

        u2 = upsample_2x_nearest(u3) + d1
        u2 = nn.Conv(128, k, padding='SAME', use_bias=False, dtype=self.dtype, name='u2_conva')(u2)
        u2 = HoverDenseBlock(unit_count=4, ksize=self.ksize, dtype=self.dtype, axis_name=self.axis_name,
                             name='u2_dense')(u2, train)
        u2 = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name='u2_convf')(u2)

        u1 = upsample_2x_nearest(u2) + d0
        u1 = nn.Conv(64, k, padding='SAME', use_bias=False, dtype=self.dtype, name='u1_conva')(u1)

        u0 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          axis_name=self.axis_name if train else None, name='u0_bn')(u1)
        u0 = nn.relu(u0)
        return nn.Conv(self.out_ch, (1, 1), use_bias=True, name='u0_cls')(u0)


class HoverNetNet(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetExt(dtype=self.dtype, axis_name=self.axis_name, name='backbone')(x, train)
        d0, d1, d2, d3 = feats
        d3 = nn.Conv(1024, (1, 1), use_bias=False, dtype=self.dtype, name='conv_bot')(d3)
        feats = (d0, d1, d2, d3)
        sem = HoverDecoderBranch(self.num_classes, dtype=self.dtype, axis_name=self.axis_name,
                                 name='tp')(feats, train)
        fore = HoverDecoderBranch(2, dtype=self.dtype, axis_name=self.axis_name, name='np')(feats, train)
        hv = HoverDecoderBranch(2, dtype=self.dtype, axis_name=self.axis_name, name='hv')(feats, train)
        return {'sem': sem, 'fore': fore, 'hv': hv}


@SEGMENTORS.register_module()
class HoverNet(BaseSegmentor):

    softmax_heads = ('sem', 'fore')
    first_view_heads = ('hv',)

    def __init__(self, num_classes, train_cfg=None, test_cfg=None, dtype=jnp.float32, axis_name=None):
        super().__init__(num_classes, train_cfg, test_cfg)
        self.net = HoverNetNet(num_classes=num_classes, dtype=dtype, axis_name=axis_name)

    # -- int8 PTQ eval path (heads/quant_hovernet.py; opt-in) ----------------
    def prepare_inference(self, variables):
        """Fold BN once per eval program when the int8 route is active
        (test_cfg['int8_eval'] + a prior calibrate_int8 call); None keeps
        the default flax forward. Same contract as CDNet/UNet."""
        if not (self.test_cfg.get('int8_eval', False) and getattr(self, '_int8_fpq', None) is not None):
            return None
        from ..heads.quant_hovernet import build_hovernet_fp
        return {'fp': build_hovernet_fp(variables['params'], variables['batch_stats'],
                                        dtype=self.net.dtype),
                'int8': self._int8_fpq}

    def calibrate_int8(self, variables, calib_img, float_branches=('hv',),
                       float_site_prefixes=()):
        """One-batch abs-max calibration + weight quantization for the int8
        eval path (same contract as UNet/CDNet.calibrate_int8). Runs as ONE
        jit program with the variables as arguments — see
        UNet.calibrate_int8 for why. ``float_site_prefixes`` keeps matching
        conv sites on the float path (the partial-trunk probe,
        tools/int8_gate_study.py --float-prefixes)."""
        import jax

        from ..heads.quant_hovernet import build_hovernet_fp, calibrate, quantize_params
        dtype = self.net.dtype

        def _calib(v, im):
            fp = build_hovernet_fp(v['params'], v['batch_stats'], dtype=dtype)
            return quantize_params(fp, calibrate(fp, im, dtype=dtype),
                                   float_branches=tuple(float_branches),
                                   float_site_prefixes=tuple(float_site_prefixes))

        self._int8_fpq = jax.jit(_calib)(variables, calib_img)
        return self._int8_fpq

    def forward_heads(self, variables, img, train: bool = False, rng=None, mutable=False, prep=None):
        if train or mutable:
            return super().forward_heads(variables, img, train=train, rng=rng, mutable=mutable)
        if prep is None:
            prep = self.prepare_inference(variables)
        if prep is None:
            return super().forward_heads(variables, img, train=train, rng=rng, mutable=mutable)
        # backbone-resident executor: trunk activations stay int8 between
        # convs — the stride-1 trunk is where HoverNet's HBM bytes live
        from ..heads.quant_hovernet import apply_hovernet_q8
        return apply_hovernet_q8(prep['fp'], prep['int8'], img, dtype=self.net.dtype)

    def loss(self, variables, batch, train: bool = True, rng=None):
        heads, new_state = self.forward_heads(variables, batch['data']['img'], train=True, rng=rng, mutable=True)
        sem_logit, hv_logit, fore_logit = heads['sem'], heads['hv'], heads['fore']
        sem_gt = batch['label']['sem_gt']
        hv_gt = batch['label']['hv_gt']  # (B, H, W, 2) channels-last
        fore_gt = (sem_gt > 0).astype(jnp.int32)

        losses = {
            'sem_ce_loss': 5.0 * cross_entropy(sem_logit, sem_gt),
            'sem_dice_loss': 0.5 * batch_multiclass_dice_loss(sem_logit, sem_gt, self.num_classes),
            'hv_mse_loss': mse_loss(hv_logit, hv_gt),
            'hv_msge_loss': gradient_mse_loss(hv_logit, hv_gt, fore_gt),
            'fore_ce_loss': cross_entropy(fore_logit, fore_gt),
            'fore_dice_loss': batch_multiclass_dice_loss(fore_logit, fore_gt, 2),
        }
        losses.update({
            'sem_tdice': tdice(sem_logit, sem_gt, self.num_classes),
            'sem_mdice': mdice(sem_logit, sem_gt, self.num_classes),
            'fore_tdice': tdice(fore_logit, fore_gt, 2),
            'fore_mdice': mdice(fore_logit, fore_gt, 2),
        })
        total, log_vars = parse_losses(losses)
        return total, (log_vars, new_state)

    def inference(self, variables, img, ori_hw=None):
        """Override: HV maps come ONLY from the identity view."""
        import jax
        from ...ops.sliding import resize_bilinear, tta_forward_views, tta_views

        mode = self.test_cfg.get('mode', 'whole')
        views = tta_views(self.test_cfg)
        prep = self.prepare_inference(variables)

        def calc(patch):
            return self.forward_heads(variables, patch, train=False, prep=prep)

        ws = self.test_cfg.get('crop_size', (0,))[0]
        os_ = self.test_cfg.get('overlap_size', (0,))[0]
        outs = tta_forward_views(calc, img, views, mode, ws, os_,
                                 chunk=self.test_cfg.get('patch_batch', 8))
        accum = None
        hv_first = None
        for vi, ((rot, flip), out) in enumerate(zip(views, outs)):
            out = {k: self.reverse_head(k, o, rot, flip) for k, o in out.items()}
            if vi == 0:
                hv_first = out['hv']
            out = {k: self.fuse_head(k, o) for k, o in out.items() if k != 'hv'}
            accum = out if accum is None else {k: accum[k] + out[k] for k in out}
        fused = {k: v / len(views) for k, v in accum.items()}
        fused['hv'] = hv_first
        if ori_hw is not None:
            fused = {k: resize_bilinear(v, ori_hw) for k, v in fused.items()}
        return fused

    def inference_and_postprocess(self, variables, img, ori_hw=None):
        """Fused device eval: inference + HoVer instance recovery in one
        jit (Pallas flood kernels where the plane fits VMEM)."""
        if not self.test_cfg.get('device_postprocess', False) or self.test_cfg.get('scale_factor', 1) != 1:
            return None
        import jax
        from ...ops.hover import hover_post_proc_device

        fused = self.inference(variables, img, ori_hw=ori_hw)
        sem_pred = jnp.argmax(fused['sem'], axis=-1).astype(jnp.uint8)
        inst = jax.vmap(lambda f, h: hover_post_proc_device(f, h, rounds=self.test_cfg.get('pp_rounds')))(
            fused['fore'][..., 1], fused['hv'])
        return {'sem_pred': sem_pred, 'inst_pred': inst}

    device_pp_supported = True  # via the override above

    def postprocess(self, fused):
        sem_pred = np.argmax(np.asarray(fused['sem']), axis=-1).astype(np.uint8)
        hv_pred = np.asarray(fused['hv'])
        fore_prob = np.asarray(fused['fore'])[..., 1]
        if self.test_cfg.get('device_postprocess', False) and self.test_cfg.get('scale_factor', 1) == 1:
            import jax.numpy as jnp
            from ...ops.hover import hover_post_proc_device
            inst_pred = np.asarray(hover_post_proc_device(jnp.asarray(fore_prob), jnp.asarray(hv_pred),
                                                          rounds=self.test_cfg.get('pp_rounds')))
        else:
            inst_pred = hover_post_proc(fore_prob, hv_pred, scale_factor=self.test_cfg.get('scale_factor', 1))
        return {'sem_pred': sem_pred, 'inst_pred': inst_pred}
