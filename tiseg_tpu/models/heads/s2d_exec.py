"""Folded bf16 + int8-resident executors for the UNet-S2D variant.

The variant (models/segmentors/unet_s2d.py) has no full-resolution stage,
so — unlike the standard UNet's phase-space path (fast_decode.py /
quant_decode.py) — its executor is a PLAIN conv chain: fold BN, run the
convs, keep activations int8 between convs in the resident path. The
quantization scheme is the one the standard path ships (symmetric
per-output-channel int8 weights, per-site static activation scales from
abs-max calibration, split concat convs with per-group input scales so
every skip is materialized once, cls head in bf16).

Site names: stem0/stem1 (stem convs, stem0's input is the s2d'd image),
s{1..4}c{ci} (VGG stage convs), dec{4..1}.pt/.pc (decoder tconv input /
concat conv), dec0.c (the [decode1-out, stem-out] concat conv).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from .fast_decode import _conv, fold_conv_bn
from .quant_decode import (_conv_i8, _deq_f32, _max_pool_2x_i8, _pad_to, _qround, _req, _tconv,
                           _wquant)

VGG16_STAGE_CONVS = (2, 2, 3, 3, 3)


def _fold_cm(tree_p, tree_bs):
    """(kernel, bias) of a ConvModule (Conv_0 + BatchNorm_0)."""
    k = tree_p['Conv_0']['kernel']
    bn = tree_p['BatchNorm_0']
    bs = tree_bs['BatchNorm_0']
    return fold_conv_bn(k, bn['scale'], bn['bias'], bs['mean'], bs['var'])


def _fold_tcm(tree_p, tree_bs):
    k = tree_p['ConvTranspose_0']['kernel']
    bn = tree_p['BatchNorm_0']
    bs = tree_bs['BatchNorm_0']
    return fold_conv_bn(k, bn['scale'], bn['bias'], bs['mean'], bs['var'])


def build_s2d_params(params, stats, dtype=jnp.bfloat16) -> Dict[str, Any]:
    fp: Dict[str, Any] = {}
    fp['stem'] = [_fold_cm(params[f'stem_conv{i}'], stats[f'stem_conv{i}']) for i in (0, 1)]
    fp['stages'] = [[_fold_cm(params[f'stage{s}_conv{ci}'], stats[f'stage{s}_conv{ci}'])
                     for ci in range(VGG16_STAGE_CONVS[s])] for s in range(1, 5)]
    fp['dec'] = {}
    for i in range(4, 0, -1):
        p, b = params[f'decode{i}'], stats[f'decode{i}']
        Wt, bt = _fold_tcm(p['TransposedConvModule_0'], b['TransposedConvModule_0'])
        Wc, bc = _fold_cm(p['ConvModule_0'], b['ConvModule_0'])
        fp['dec'][i] = {'Wt': Wt, 'bt': bt, 'Wc': Wc, 'bc': bc}
    fp['dec0'] = _fold_cm(params['decode0_conv'], stats['decode0_conv'])
    fp['cls'] = (params['cls']['kernel'], params['cls']['bias'])
    fp = jax.tree.map(lambda x: x.astype(jnp.float32), fp)
    return fp


def _s2d2(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def _d2s2(y):
    B, h, w, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, h, w, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * h, 2 * w, C)


def _max_pool_2x(x):
    return jax.lax.reduce_window(x, jnp.array(-jnp.inf, x.dtype), jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')


# ---------------------------------------------------------------------------
# bf16 path (doubles as the calibration executor when scales_out is given)
# ---------------------------------------------------------------------------

def _conv_site(x, site, W, b, scales_out, dtype, strides=(1, 1)):
    if scales_out is not None:
        scales_out[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return _conv(x.astype(dtype), W.astype(dtype), 'SAME', strides) + b.astype(dtype)


def _run_s2d_bf16(fp, img, scales_out, dtype, out='logits'):
    x = _s2d2(img)
    x = jax.nn.relu(_conv_site(x, 'stem0', *fp['stem'][0], scales_out, dtype))
    s0 = jax.nn.relu(_conv_site(x, 'stem1', *fp['stem'][1], scales_out, dtype))
    skips: List[Any] = [s0]
    x = s0
    for s, convs in enumerate(fp['stages'], start=1):
        if s > 1:
            x = _max_pool_2x(x)
        for ci, (k, b) in enumerate(convs):
            x = jax.nn.relu(_conv_site(x, f's{s}c{ci}', k, b, scales_out, dtype))
        skips.append(x)
    x = _max_pool_2x(x)
    for i in range(4, 0, -1):
        st = fp['dec'][i]
        if scales_out is not None:
            scales_out[f'dec{i}.pt'] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        y = jax.nn.relu(_tconv(x.astype(dtype), st['Wt'].astype(dtype)) + st['bt'].astype(dtype))
        y = _pad_to(y, skips[i])
        y = jnp.concatenate([y, skips[i].astype(dtype)], axis=-1)
        if scales_out is not None:
            scales_out[f'dec{i}.pc'] = jnp.max(jnp.abs(y.astype(jnp.float32)))
        x = jax.nn.relu(_conv(y, st['Wc'].astype(dtype)) + st['bc'].astype(dtype))
    y = jnp.concatenate([x, s0.astype(dtype)], axis=-1)
    if scales_out is not None:
        scales_out['dec0.c'] = jnp.max(jnp.abs(y.astype(jnp.float32)))
    Wc0, bc0 = fp['dec0']
    x = jax.nn.relu(_conv(y, Wc0.astype(dtype)) + bc0.astype(dtype))
    Wk, bk = fp['cls']
    y = _conv(x, Wk.astype(dtype)) + bk.astype(dtype)
    if out == 'pred':
        B, h, w, C4 = y.shape
        pred = jnp.argmax(y.reshape(B, h, w, 4, C4 // 4), axis=-1).astype(jnp.int32)
        return _d2s2(pred.reshape(B, h, w, 4))[..., 0]
    return _d2s2(y)


def apply_s2d(fp, img, dtype=jnp.bfloat16, out='logits'):
    return _run_s2d_bf16(fp, img, None, dtype, out=out)


def calibrate_s2d(fp, img, dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    scales: Dict[str, jnp.ndarray] = {}
    _run_s2d_bf16(fp, img, scales, dtype)
    return scales


def quantize_s2d(fp, act_maxes: Dict[str, Any], margin: float = 1.0):
    """Int8 parameter tree for the resident executor. No scale aliasing is
    needed: every dual-consumer tensor (stage outputs feeding both the next
    stage and a decoder skip) is consumed through split concat convs with
    per-group dequants at its own emission scale."""
    act = {k: jnp.maximum(jnp.asarray(v, jnp.float32) * margin, 1e-12) / 127.0
           for k, v in act_maxes.items()}
    wq = {}
    wq['stem0'] = _wquant(fp['stem'][0][0])
    wq['stem1'] = _wquant(fp['stem'][1][0])
    for s, convs in enumerate(fp['stages'], start=1):
        for ci, (k, b) in enumerate(convs):
            wq[f's{s}c{ci}'] = _wquant(k)
    for i, st in fp['dec'].items():
        wq[f'dec{i}.pt'] = _wquant(st['Wt'])
        wq[f'dec{i}.pc'] = _wquant(st['Wc'])
    wq['dec0.c'] = _wquant(fp['dec0'][0])
    return {'act': act, 'wq': wq}


# ---------------------------------------------------------------------------
# int8-resident path
# ---------------------------------------------------------------------------

def apply_s2d_q8(fp, fpq, img, dtype=jnp.bfloat16, out='logits'):
    """Int8-resident forward: activations materialized int8 between convs;
    every skip is ONE int8 copy consumed through split concat convs at its
    own emission scale (same scheme as quant_decode._run_head_q8)."""
    act = fpq['act']
    x = _s2d2(img)
    y0 = _conv_i8(_qround(x, act['stem0']), fpq['wq']['stem0'][0])
    z0 = _req(jax.nn.relu(_deq_f32(y0, 'stem0', fpq, fp['stem'][0][1])), 'stem1', fpq)
    y1 = _conv_i8(z0, fpq['wq']['stem1'][0])
    s0f = jax.nn.relu(_deq_f32(y1, 'stem1', fpq, fp['stem'][1][1]))
    # single emission of the stem output at the stage-1 scale; decode0's
    # split concat conv dequants it per-group at this same scale
    q = _req(s0f, 's1c0', fpq)
    skip_q: List[Any] = [q]
    skip_scale: List[Any] = [act['s1c0']]
    xq = q
    n_stages = len(fp['stages'])
    for s, convs in enumerate(fp['stages'], start=1):
        if s > 1:
            xq = _max_pool_2x_i8(xq)
        yf = None
        for ci, (kw, b) in enumerate(convs):
            site = f's{s}c{ci}'
            yf = jax.nn.relu(_deq_f32(_conv_i8(xq, fpq['wq'][site][0]), site, fpq, b))
            if ci + 1 < len(convs):
                xq = _req(yf, f's{s}c{ci + 1}', fpq)
        if s < n_stages:
            xq = _req(yf, f's{s + 1}c0', fpq)
            skip_q.append(xq)
            skip_scale.append(act[f's{s + 1}c0'])
        else:  # bottom: pool commutes with symmetric quantization
            xq = _req(yf, 'dec4.pt', fpq)
            skip_q.append(xq)
            skip_scale.append(act['dec4.pt'])
            xq = _max_pool_2x_i8(xq)
    for i in range(4, 0, -1):
        st = fp['dec'][i]
        site_t = f'dec{i}.pt'
        xq = xq if xq.dtype == jnp.int8 else _qround(xq, act[site_t])
        Wq_t, s_wt = fpq['wq'][site_t]
        yt = _tconv(xq, Wq_t, preferred_element_type=jnp.int32)
        yf = jax.nn.relu(yt.astype(jnp.float32) * (act[site_t] * s_wt)
                         + st['bt'].astype(jnp.float32))
        site_c = f'dec{i}.pc'
        s_c = act[site_c]
        Wq_c, s_wc = fpq['wq'][site_c]
        yq = _pad_to(_req(yf, site_c, fpq), skip_q[i])
        cy = yq.shape[-1]
        y_up = _conv_i8(yq, Wq_c[:, :, :cy, :])
        y_skip = _conv_i8(skip_q[i], Wq_c[:, :, cy:, :])
        yf2 = jax.nn.relu(y_up.astype(jnp.float32) * (s_c * s_wc)
                          + y_skip.astype(jnp.float32) * (skip_scale[i] * s_wc)
                          + st['bc'].astype(jnp.float32))
        next_site = f'dec{i - 1}.pt' if i > 1 else 'dec0.c'
        xq = _req(yf2, next_site, fpq)
    # decode0: split concat conv [decode1-out @ dec0.c | stem @ s1c0]
    s_c = act['dec0.c']
    Wq_c, s_wc = fpq['wq']['dec0.c']
    cy = xq.shape[-1]
    y_up = _conv_i8(xq, Wq_c[:, :, :cy, :])
    y_skip = _conv_i8(skip_q[0], Wq_c[:, :, cy:, :])
    bc0 = fp['dec0'][1]
    x = jax.nn.relu(y_up.astype(jnp.float32) * (s_c * s_wc)
                    + y_skip.astype(jnp.float32) * (skip_scale[0] * s_wc)
                    + bc0.astype(jnp.float32)).astype(dtype)
    Wk, bk = fp['cls']
    y = _conv(x, Wk.astype(dtype)) + bk.astype(dtype)
    if out == 'pred':
        B, h, w, C4 = y.shape
        pred = jnp.argmax(y.reshape(B, h, w, 4, C4 // 4), axis=-1).astype(jnp.int32)
        return _d2s2(pred.reshape(B, h, w, 4))[..., 0]
    return _d2s2(y)
