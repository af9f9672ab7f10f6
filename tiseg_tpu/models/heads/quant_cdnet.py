"""Int8 post-training-quantized eval path for CDNet (opt-in).

CDNet's forward is HBM-bound on v5e (tools/model_sol.py: 31% MXU util,
SOL-mem 45 ms >> SOL-compute 24 ms at B=64) — the DGM runs three
residual units at full resolution and 64 channels, so the decoder graph
materializes ~4x the bytes of UNet's. Int8 attacks both walls at once:
the MXU runs int8 x int8 -> int32 at 2x the bf16 rate AND the quantized
activations XLA keeps between fused convs are half the bytes.

Mechanics mirror heads/quant_decode.py (the UNet int8 path): BN is
folded into conv kernels (eval-mode running stats, exact affine), every
hot conv (13 VGG convs, 5 decoder transposed convs + 5 block convs, the
DGM's 6 residual 3x3 convs) runs as an int8 conv with per-output-channel
symmetric weights and per-site abs-max activation scales from a one-batch
calibration. The tiny 1x1 convs (RU identity shortcuts, the AU attention
gates, the three output heads) stay bf16: they are <2% of the FLOPs and
the head logits feed argmax/DDM directly where 8-bit rounding costs
accuracy for no measurable speed.

The SAME executor runs three modes sharing one code path so the only
divergence between them is 8-bit rounding:
- ``calibrate(fp, img)``: bf16 forward recording each site's abs-max;
- ``apply_cdnet_bf16(fp, img)``: bf16 folded forward (test twin);
- ``apply_cdnet_q(fp, fpq, img)``: the int8 program.

Reference forward being accelerated: tiseg/models/segmentors/cdnet.py
:32-94 via heads/cd_head.py:14-188. Nothing here is on a default route;
CDNet.calibrate_int8 + test_cfg['int8_eval'] opt in.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..nn import pad_to_match
from .fast_decode import _conv, _layer_folded, _max_pool_2x
from .quant_decode import (_conv_i8, _deq_f32, _max_pool_2x_i8, _qround, _req, _tconv,
                           _wquant)

# VGG16-BN stage structure (backbones/vgg.py): convs per stage, pool
# before stages 1..4, final stage-5 feature is pool-only.
_VGG16_STAGE_CONVS = (2, 2, 3, 3, 3)


# ---------------------------------------------------------------------------
# folded parameter tree
# ---------------------------------------------------------------------------

def _plain_conv(params: Dict[str, Any], name: str):
    """(kernel, bias) of a bare nn.Conv (bias present)."""
    p = params[name]
    return p['kernel'], p.get('bias', jnp.zeros((p['kernel'].shape[-1],), p['kernel'].dtype))


def build_cdnet_fp(params: Dict[str, Any], stats: Dict[str, Any], dtype=jnp.bfloat16):
    """Fold eval-mode BN into every conv of backbone + decoder + DGM.

    params/stats are variables['params'] / variables['batch_stats'] of a
    CDNetNet ({'backbone': VGG16BN, 'head': CDHead})."""
    bb_p, bb_s = params['backbone'], stats['backbone']
    vgg: List[List[Tuple[Any, Any]]] = []
    for s, n_convs in enumerate(_VGG16_STAGE_CONVS):
        stage = []
        for ci in range(n_convs):
            k, b = _layer_folded(bb_p, bb_s, f'stage{s}_conv{ci}', 'Conv_0')
            stage.append((k.astype(dtype), b.astype(dtype)))
        vgg.append(stage)

    hd_p, hd_s = params['head'], stats['head']
    dec_p, dec_s = hd_p['decoder'], hd_s['decoder']
    dec = []
    for idx in range(5):
        lp, ls = dec_p[f'decode{idx}'], dec_s[f'decode{idx}']
        kt, bt = _layer_folded(lp, ls, 'TransposedConvModule_0', 'ConvTranspose_0')
        kc, bc = _layer_folded(lp, ls, 'ConvModule_0', 'Conv_0')
        dec.append({'Wt': kt.astype(dtype), 'bt': bt.astype(dtype),
                    'Wc': kc.astype(dtype), 'bc': bc.astype(dtype)})

    gp, gs = hd_p['dgm'], hd_s['dgm']
    dgm: Dict[str, Any] = {}
    for nm in ('mask_feats', 'dir_feats', 'point_feats'):
        rp, rs = gp[nm], gs[nm]
        k1, b1 = _layer_folded(rp, rs, 'res1', 'Conv_0')
        k2, b2 = _layer_folded(rp, rs, 'res2', 'Conv_0')
        ki, bi = _plain_conv(rp, 'ide')
        dgm[nm] = {'W1': k1.astype(dtype), 'b1': b1.astype(dtype),
                   'W2': k2.astype(dtype), 'b2': b2.astype(dtype),
                   'Wi': ki.astype(dtype), 'bi': bi.astype(dtype)}
    for nm in ('point_conv', 'dir_conv', 'mask_conv'):
        k, b = _plain_conv(gp, nm)
        dgm[nm] = (k.astype(dtype), b.astype(dtype))
    for nm in ('point_to_dir_attn', 'dir_to_mask_attn'):
        dgm[nm] = gp[nm]['attn']['kernel'].astype(dtype)

    return {'vgg': vgg, 'dec': dec, 'dgm': dgm}


# ---------------------------------------------------------------------------
# shared executor (calibration / bf16 / int8 are one code path)
# ---------------------------------------------------------------------------

def _conv_q(x, site: str, W, bias, fpq, scales_out, dtype, transposed: bool = False):
    """One quantizable conv site. fpq None -> bf16 (recording abs-max into
    scales_out when given); else int8 conv + dequant + bias."""
    if fpq is None:
        if scales_out is not None:
            scales_out[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        if transposed:
            y = jax.lax.conv_transpose(x.astype(dtype), W.astype(dtype), (2, 2), 'SAME',
                                       dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        else:
            y = _conv(x.astype(dtype), W.astype(dtype))
        return y + bias.astype(dtype)
    s_x = fpq['act'][site]
    Wq, s_w = fpq['wq'][site]
    xq = _qround(x, s_x)
    if transposed:
        y = jax.lax.conv_transpose(xq, Wq, (2, 2), 'SAME',
                                   dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                   preferred_element_type=jnp.int32)
    else:
        y = jax.lax.conv_general_dilated(xq, Wq, (1, 1), 'SAME',
                                         dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                         preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * s_w)).astype(dtype) + bias.astype(dtype)


def _run_cdnet(fp, img, fpq, scales_out, dtype=jnp.bfloat16):
    # backbone
    x = img.astype(dtype)
    feats = []
    for s, stage in enumerate(fp['vgg']):
        if s > 0:
            x = _max_pool_2x(x)
        for ci, (k, b) in enumerate(stage):
            x = jax.nn.relu(_conv_q(x, f'v{s}c{ci}', k, b, fpq, scales_out, dtype))
        feats.append(x)
    feats.append(_max_pool_2x(x))

    # decoder (UNetHead, num_classes=None): decode4 .. decode0
    x = feats[-1]
    for idx in range(4, -1, -1):
        st = fp['dec'][idx]
        x = jax.nn.relu(_conv_q(x, f'd{idx}t', st['Wt'], st['bt'], fpq, scales_out, dtype,
                                transposed=True))
        x = pad_to_match(x, feats[idx].shape[1:3])  # no-op at /32-divisible shapes
        x = jnp.concatenate([x, feats[idx]], axis=-1)
        x = jax.nn.relu(_conv_q(x, f'd{idx}c', st['Wc'], st['bc'], fpq, scales_out, dtype))

    # DGM
    g = fp['dgm']

    def ru(inp, nm):
        st = g[nm]
        r = jax.nn.relu(_conv_q(inp, f'{nm}.r1', st['W1'], st['b1'], fpq, scales_out, dtype))
        r = _conv_q(r, f'{nm}.r2', st['W2'], st['b2'], fpq, scales_out, dtype)
        ide = _conv(inp, st['Wi']) + st['bi'].astype(dtype)
        return jax.nn.relu(r + ide)

    mask_f = ru(x, 'mask_feats')
    dir_f = ru(mask_f, 'dir_feats')
    point_f = ru(dir_f, 'point_feats')
    if fpq is None and scales_out is not None:
        # site for the resident executor's int8 point head (apply_cdnet_q8)
        scales_out['point_conv'] = jnp.max(jnp.abs(point_f.astype(jnp.float32)))

    kp, bp = g['point_conv']
    point_logit = _conv(point_f, kp) + bp.astype(dtype)
    attn_p = jax.nn.sigmoid(_conv(point_logit, g['point_to_dir_attn']))
    dir_gated = dir_f * (1 + attn_p)
    kd, bd = g['dir_conv']
    dir_logit = _conv(dir_gated, kd) + bd.astype(dtype)
    attn_d = jax.nn.sigmoid(_conv(dir_logit, g['dir_to_mask_attn']))
    mask_gated = mask_f * (1 + attn_d)
    km, bm = g['mask_conv']
    mask_logit = _conv(mask_gated, km) + bm.astype(dtype)
    return {'sem': mask_logit, 'dir': dir_logit, 'point': point_logit}


# ---------------------------------------------------------------------------
# public API (mirrors quant_decode)
# ---------------------------------------------------------------------------

def calibrate(fp, img, dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """One float forward recording every quantized site's input abs-max."""
    scales: Dict[str, jnp.ndarray] = {}
    _run_cdnet(fp, img, None, scales, dtype=dtype)
    return scales


def quantize_params(fp, act_maxes: Dict[str, Any], margin: float = 1.0):
    act = {k: jnp.maximum(jnp.asarray(v, jnp.float32) * margin, 1e-12) / 127.0
           for k, v in act_maxes.items()}
    wq: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    for s, stage in enumerate(fp['vgg']):
        for ci, (k, b) in enumerate(stage):
            wq[f'v{s}c{ci}'] = _wquant(k)
    for idx, st in enumerate(fp['dec']):
        wq[f'd{idx}t'] = _wquant(st['Wt'])
        wq[f'd{idx}c'] = _wquant(st['Wc'])
    for nm in ('mask_feats', 'dir_feats', 'point_feats'):
        wq[f'{nm}.r1'] = _wquant(fp['dgm'][nm]['W1'])
        wq[f'{nm}.r2'] = _wquant(fp['dgm'][nm]['W2'])
    # resident-only sites (apply_cdnet_q8): the RU identity shortcuts and
    # the three head 1x1s run int8 there, each reading the SAME int8 copy
    # its RU neighbour consumes — the act scale is an alias of that site's.
    # Guarded on 'point_conv' so fpq trees from older calibrations still
    # build (they then route through the dequant executor only).
    if 'point_conv' in act:
        for nm in ('mask_feats', 'dir_feats', 'point_feats'):
            wq[f'{nm}.i'] = _wquant(fp['dgm'][nm]['Wi'])
            act[f'{nm}.i'] = act[f'{nm}.r1']
        wq['mask_conv'] = _wquant(fp['dgm']['mask_conv'][0])
        act['mask_conv'] = act['dir_feats.r1']
        wq['dir_conv'] = _wquant(fp['dgm']['dir_conv'][0])
        act['dir_conv'] = act['point_feats.r1']
        wq['point_conv'] = _wquant(fp['dgm']['point_conv'][0])
    return {'act': act, 'wq': wq}


def apply_cdnet_q(fp, fpq, img, dtype=jnp.bfloat16):
    return _run_cdnet(fp, img, fpq, None, dtype=dtype)


# ---------------------------------------------------------------------------
# int8-RESIDENT executor: activations live in int8 BETWEEN convs
# ---------------------------------------------------------------------------
#
# ``apply_cdnet_q`` dequantizes every conv output to bf16 and the next site
# re-quantizes, so the activation chain still moves bf16 bytes through HBM —
# and CDNet is HBM-bound (module docstring). Like quant_decode's
# apply_fast_unet_q8, this executor folds dequant+bias+relu+REQUANT into each
# conv's epilogue so the tensor materialized between convs is int8. Two CDNet-
# specific moves on top of the UNet recipe:
#
# 1. VGG stage outputs have two consumers at different scales (next stage's
#    first conv, and a decoder concat) — one int8 copy per consumer from the
#    same epilogue fusion (write bytes = one bf16 copy; read bytes halve).
# 2. The DGM's per-pixel attention gates commute with 1x1 convs
#    (conv1x1(x * (1+a)) == conv1x1(x) * (1+a) + bias-fixup, because the gate
#    broadcasts over channels), so each head 1x1 runs int8 on the SAME int8
#    copy its RU neighbour reads and the gate multiplies the tiny logit tensor
#    (1-9 channels) instead of the full-res 64-channel feature map. The RU
#    identity 1x1s ride the r1 input copy the same way. Net effect: NO
#    full-resolution bf16 tensor is materialized anywhere in the DGM.
#
# Quantization sites/scales are identical to apply_cdnet_q for every conv it
# quantizes; the resident-only additions (identity + head 1x1s, sites aliased
# in quantize_params) are new quantizations whose accuracy cost is covered by
# the executor tests and the bench's held-out accuracy gate.


def resident_ok(fpq) -> bool:
    """True iff ``fpq`` carries the resident-only 1x1 sites (calibrations
    recorded by this version of ``calibrate``)."""
    return 'point_conv' in fpq['act'] and 'mask_conv' in fpq['wq']


def apply_cdnet_q8(fp, fpq, img, dtype=jnp.bfloat16):
    """Int8-resident CDNet forward: image -> {'sem','dir','point'} logits,
    activations materialized as int8 between convs. Raises ValueError when
    fpq lacks the resident 1x1 sites (callers fall back to apply_cdnet_q)."""
    if not resident_ok(fpq):
        raise ValueError('int8-resident CDNet executor requires the resident 1x1 '
                         'sites; recalibrate with this version of quant_cdnet')
    act, wq = fpq['act'], fpq['wq']

    # backbone
    xq = _qround(img, act['v0c0'])
    feats_q: List[Any] = []
    bottom = None
    n_stages = len(fp['vgg'])
    for s, stage in enumerate(fp['vgg']):
        if s > 0:
            xq = _max_pool_2x_i8(xq)
        yf = None
        for ci, (k, b) in enumerate(stage):
            site = f'v{s}c{ci}'
            yf = jax.nn.relu(_deq_f32(_conv_i8(xq, wq[site][0]), site, fpq, b))
            if ci + 1 < len(stage):
                xq = _req(yf, f'v{s}c{ci + 1}', fpq)
        feats_q.append(_req(yf, f'd{s}c', fpq))
        if s + 1 < n_stages:
            xq = _req(yf, f'v{s + 1}c0', fpq)
        else:  # bottom: max-pool commutes with symmetric quantization
            bottom = _max_pool_2x_i8(_req(yf, 'd4t', fpq))

    # decoder: tconv + concat conv, concat happens in int8 at the d{idx}c scale
    xq = bottom
    for idx in range(4, -1, -1):
        st = fp['dec'][idx]
        site_t = f'd{idx}t'
        yt = _tconv(xq, wq[site_t][0], preferred_element_type=jnp.int32)
        yf = jax.nn.relu(yt.astype(jnp.float32) * (act[site_t] * wq[site_t][1])
                         + st['bt'].astype(jnp.float32))
        site_c = f'd{idx}c'
        yq = pad_to_match(_req(yf, site_c, fpq), feats_q[idx].shape[1:3])
        cat = jnp.concatenate([yq, feats_q[idx]], axis=-1)
        yf = jax.nn.relu(_deq_f32(_conv_i8(cat, wq[site_c][0]), site_c, fpq, st['bc']))
        xq = _req(yf, f'd{idx - 1}t' if idx > 0 else 'mask_feats.r1', fpq)

    # DGM
    g = fp['dgm']

    def ru_q8(inq, nm):
        st = g[nm]
        r = jax.nn.relu(_deq_f32(_conv_i8(inq, wq[f'{nm}.r1'][0]), f'{nm}.r1', fpq, st['b1']))
        r2 = _deq_f32(_conv_i8(_req(r, f'{nm}.r2', fpq), wq[f'{nm}.r2'][0]),
                      f'{nm}.r2', fpq, st['b2'])
        ide = _deq_f32(_conv_i8(inq, wq[f'{nm}.i'][0]), f'{nm}.i', fpq, st['bi'])
        return jax.nn.relu(r2 + ide)

    mask_fq = _req(ru_q8(xq, 'mask_feats'), 'dir_feats.r1', fpq)
    dir_fq = _req(ru_q8(mask_fq, 'dir_feats'), 'point_feats.r1', fpq)
    point_fq = _req(ru_q8(dir_fq, 'point_feats'), 'point_conv', fpq)

    # heads: gate-commutation rewrite (see module comment #2)
    m0 = _deq_f32(_conv_i8(mask_fq, wq['mask_conv'][0]), 'mask_conv', fpq)
    d0 = _deq_f32(_conv_i8(dir_fq, wq['dir_conv'][0]), 'dir_conv', fpq)
    point_logit = _deq_f32(_conv_i8(point_fq, wq['point_conv'][0]), 'point_conv', fpq,
                           g['point_conv'][1])
    attn_p = jax.nn.sigmoid(_conv(point_logit.astype(dtype), g['point_to_dir_attn']))
    dir_logit = d0 * (1.0 + attn_p.astype(jnp.float32)) + g['dir_conv'][1].astype(jnp.float32)
    attn_d = jax.nn.sigmoid(_conv(dir_logit.astype(dtype), g['dir_to_mask_attn']))
    mask_logit = m0 * (1.0 + attn_d.astype(jnp.float32)) + g['mask_conv'][1].astype(jnp.float32)
    return {'sem': mask_logit.astype(dtype), 'dir': dir_logit.astype(dtype),
            'point': point_logit.astype(dtype)}


def apply_cdnet_bf16(fp, img, dtype=jnp.bfloat16):
    return _run_cdnet(fp, img, None, None, dtype=dtype)
