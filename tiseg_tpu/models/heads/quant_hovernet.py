"""Int8 post-training-quantized eval path for HoverNet (opt-in).

HoverNet is the zoo's compute-bound member: the stride-1 ResNetExt stem
keeps layer1 at full resolution, so the trunk alone is ~8x UNet's FLOPs
and the fused e2e measured 183 p/s bf16 (docs/PARITY.md SOL table pins
it near the bf16 MXU ceiling). v5e's int8 MXU peak is 2x bf16, so a
quantized forward is the one remaining lever with headroom.

Mechanics mirror heads/quant_cdnet.py: one shared executor runs
calibration (bf16, recording per-site input abs-max), the folded-bf16
twin, and the int8 program, so the only divergence between float and
quantized is 8-bit rounding.

Architecture-specific choices:
- The backbone is post-activation (conv->BN->ReLU, backbones/resnet.py
  Bottleneck), so BN folds exactly into each conv kernel+bias.
- The decoder dense blocks are PRE-activation (BN-ReLU-conv, reference
  hovernet.py:62-122): those BNs cannot fold into a neighbouring conv
  across the ReLU/concat, so eval-mode BN is precomputed to a per-channel
  affine (a, c) and applied explicitly — XLA fuses it into the
  surrounding elementwise epilogue either way.
- Quantized: the stem, all 48 bottleneck convs + 4 downsamples, conv_bot,
  and the branch convs INCLUDING the tp/np branches' full-res u1a convs
  and 1x1 ``u0_cls`` heads (int8 in the resident executor, f32 logits via
  the dequant epilogue). The hv branch stays ENTIRELY on the float path
  by default (quantize_params ``float_branches=('hv',)``): it regresses
  continuous offsets whose watershed consumer loses 2.5-3 Aji pts to
  8-bit resolution on a converged model — measured, with a float-tail-only
  variant recovering just 0.5 pt and a margin ablation ruling out
  saturation (tools/int8_gate_study.py, docs/ROUND4.md). The dense-unit
  3x3 convs keep their ``feature_group_count=4`` grouping in int8.

Nothing here is on a default route; HoverNet.calibrate_int8 +
test_cfg['int8_eval'] opt in. Reference forward being accelerated:
tiseg/models/segmentors/hovernet.py:26-173.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import upsample_2x_nearest
from .fast_decode import _conv, fold_conv_bn
from .quant_decode import _conv_i8, _deq_f32, _qround, _req, _wquant

# ResNet50 plan (backbones/resnet.py DEPTH_PLAN) and decoder layout
# (segmentors/hovernet.py HoverDecoderBranch).
_LAYERS = (3, 4, 6, 3)
_DENSE_UNITS = {'u3': 8, 'u2': 4}
_BRANCHES = ('tp', 'np', 'hv')
_EPS = 1e-5


def _bn_affine(p: Dict[str, Any], s: Dict[str, Any], dtype):
    """Eval-mode BatchNorm as a per-channel affine (a, c): bn(x) = a*x + c."""
    a = p['scale'].astype(jnp.float32) / jnp.sqrt(s['var'].astype(jnp.float32) + _EPS)
    c = p['bias'].astype(jnp.float32) - s['mean'].astype(jnp.float32) * a
    return a.astype(dtype), c.astype(dtype)


def _folded(p, s, conv: str, bn: str, dtype):
    k, b = fold_conv_bn(p[conv]['kernel'], p[bn]['scale'], p[bn]['bias'],
                        s[bn]['mean'], s[bn]['var'])
    return k.astype(dtype), b.astype(dtype)


def build_hovernet_fp(params: Dict[str, Any], stats: Dict[str, Any], dtype=jnp.bfloat16):
    """Flatten a HoverNetNet variables tree into the executor's folded form."""
    bp, bs = params['backbone'], stats['backbone']
    stem = _folded(bp, bs, 'stem_conv', 'stem_bn', dtype)
    blocks: List[List[Dict[str, Any]]] = []
    for si, n in enumerate(_LAYERS):
        stage = []
        for bi in range(n):
            nm = f'layer{si + 1}_block{bi}'
            blk_p, blk_s = bp[nm], bs[nm]
            blk = {'c1': _folded(blk_p, blk_s, 'conv1', 'bn1', dtype),
                   'c2': _folded(blk_p, blk_s, 'conv2', 'bn2', dtype),
                   'c3': _folded(blk_p, blk_s, 'conv3', 'bn3', dtype),
                   'down': (_folded(blk_p, blk_s, 'downsample', 'bn_down', dtype)
                            if 'downsample' in blk_p else None)}
            stage.append(blk)
        blocks.append(stage)

    def dense(dp, ds, units: int):
        out = []
        for u in range(units):
            out.append({'bn1': _bn_affine(dp[f'u{u}_bn1'], ds[f'u{u}_bn1'], dtype),
                        'W1': dp[f'u{u}_conv1']['kernel'].astype(dtype),
                        'bn2': _bn_affine(dp[f'u{u}_bn2'], ds[f'u{u}_bn2'], dtype),
                        'W2': dp[f'u{u}_conv2']['kernel'].astype(dtype)})
        return out, _bn_affine(dp['blk_bn'], ds['blk_bn'], dtype)

    branches: Dict[str, Dict[str, Any]] = {}
    for nm in _BRANCHES:
        hp, hs = params[nm], stats[nm]
        br: Dict[str, Any] = {}
        for lvl in ('u3', 'u2'):
            br[f'{lvl}a'] = hp[f'{lvl}_conva']['kernel'].astype(dtype)
            br[f'{lvl}d'], br[f'{lvl}_blk_bn'] = dense(hp[f'{lvl}_dense'], hs[f'{lvl}_dense'],
                                                       _DENSE_UNITS[lvl])
            br[f'{lvl}f'] = hp[f'{lvl}_convf']['kernel'].astype(dtype)
        br['u1a'] = hp['u1_conva']['kernel'].astype(dtype)
        br['u0_bn'] = _bn_affine(hp['u0_bn'], hs['u0_bn'], dtype)
        br['u0_cls'] = (hp['u0_cls']['kernel'].astype(jnp.float32),
                        hp['u0_cls']['bias'].astype(jnp.float32))
        branches[nm] = br

    return {'stem': stem, 'blocks': blocks,
            'conv_bot': params['conv_bot']['kernel'].astype(dtype),
            'branches': branches}


# ---------------------------------------------------------------------------
# shared executor (calibration / bf16 / int8 are one code path)
# ---------------------------------------------------------------------------

def _cq(x, site: str, W, bias: Optional[Any], fpq, scales_out, strides=(1, 1),
        padding='SAME', groups: int = 1, dtype=jnp.bfloat16):
    """One quantizable conv site (see quant_cdnet._conv_q)."""
    if fpq is None or site not in fpq['wq']:
        # calibration pass, or a site exempted from quantization
        # (quantize_params float_branches): float path
        if scales_out is not None:
            scales_out[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        y = jax.lax.conv_general_dilated(x.astype(dtype), W.astype(dtype), strides, padding,
                                         dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                         feature_group_count=groups)
    else:
        s_x = fpq['act'][site]
        Wq, s_w = fpq['wq'][site]
        y = jax.lax.conv_general_dilated(_qround(x, s_x), Wq, strides, padding,
                                         dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                         feature_group_count=groups,
                                         preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (s_x * s_w)).astype(dtype)
    return y if bias is None else y + bias.astype(dtype)


def _run_backbone(fp, img, fpq, scales_out, dtype):
    relu = jax.nn.relu
    x = relu(_cq(img, 'stem', *fp['stem'], fpq, scales_out,
                 padding=((3, 3), (3, 3)), dtype=dtype))
    outs = []
    for si, stage in enumerate(fp['blocks']):
        for bi, blk in enumerate(stage):
            strides = (2, 2) if (bi == 0 and si > 0) else (1, 1)
            pre = f'l{si}b{bi}'
            y = relu(_cq(x, f'{pre}c1', *blk['c1'], fpq, scales_out, dtype=dtype))
            y = relu(_cq(y, f'{pre}c2', *blk['c2'], fpq, scales_out, strides=strides,
                         padding=((1, 1), (1, 1)), dtype=dtype))
            y = _cq(y, f'{pre}c3', *blk['c3'], fpq, scales_out, dtype=dtype)
            res = (x if blk['down'] is None else
                   _cq(x, f'{pre}d', *blk['down'], fpq, scales_out, strides=strides, dtype=dtype))
            x = relu(y + res)
        outs.append(x)
    return outs


def _rec(scales_out, site: str, x):
    """Record an int8 EMISSION site's abs-max during calibration (sites the
    resident branch executor stores tensors at; no weight counterpart)."""
    if scales_out is not None:
        scales_out[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))


def _run_branch(fp_br, nm: str, feats, fpq, scales_out, dtype):
    relu = jax.nn.relu

    def affine(x, ac):
        a, c = ac
        return x * a + c

    def dense_block(x, lvl: str):
        for u, unit in enumerate(fp_br[f'{lvl}d']):
            y = relu(affine(x, unit['bn1']))
            y = _cq(y, f'{nm}.{lvl}d{u}c1', unit['W1'], None, fpq, scales_out, dtype=dtype)
            y = relu(affine(y, unit['bn2']))
            y = _cq(y, f'{nm}.{lvl}d{u}c2', unit['W2'], None, fpq, scales_out,
                    groups=4, dtype=dtype)
            _rec(scales_out, f'{nm}.{lvl}d{u}y', y)
            x = jnp.concatenate([x, y], axis=-1)
        return relu(affine(x, fp_br[f'{lvl}_blk_bn']))

    d0, d1, d2, d3 = feats
    u3 = upsample_2x_nearest(d3) + d2
    u3 = _cq(u3, f'{nm}.u3a', fp_br['u3a'], None, fpq, scales_out, dtype=dtype)
    _rec(scales_out, f'{nm}.u3in', u3)
    u3 = _cq(dense_block(u3, 'u3'), f'{nm}.u3f', fp_br['u3f'], None, fpq, scales_out, dtype=dtype)
    u2 = upsample_2x_nearest(u3) + d1
    u2 = _cq(u2, f'{nm}.u2a', fp_br['u2a'], None, fpq, scales_out, dtype=dtype)
    _rec(scales_out, f'{nm}.u2in', u2)
    u2 = _cq(dense_block(u2, 'u2'), f'{nm}.u2f', fp_br['u2f'], None, fpq, scales_out, dtype=dtype)
    u1 = upsample_2x_nearest(u2) + d0
    u1 = _cq(u1, f'{nm}.u1a', fp_br['u1a'], None, fpq, scales_out, dtype=dtype)
    u0 = relu(affine(u1, fp_br['u0_bn']))
    _rec(scales_out, f'{nm}.u0', u0)
    # stays float: logits feed argmax/watershed. f32 like the flax module
    # (u0_cls has no dtype arg -> float32 output contract, hovernet.py:82).
    Wk, bk = fp_br['u0_cls']
    return (_conv(u0.astype(jnp.float32), Wk.astype(jnp.float32))
            + bk.astype(jnp.float32))


def _run_hovernet(fp, img, fpq, scales_out, dtype=jnp.bfloat16):
    feats = _run_backbone(fp, img, fpq, scales_out, dtype)
    d3 = _cq(feats[3], 'bot', fp['conv_bot'], None, fpq, scales_out, dtype=dtype)
    feats = (feats[0], feats[1], feats[2], d3)
    out = {nm: _run_branch(fp['branches'][nm], nm, feats, fpq, scales_out, dtype)
           for nm in _BRANCHES}
    return {'sem': out['tp'], 'fore': out['np'], 'hv': out['hv']}


# ---------------------------------------------------------------------------
# public API (mirrors quant_cdnet)
# ---------------------------------------------------------------------------

def calibrate(fp, img, dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """One float forward recording every quantized site's input abs-max."""
    scales: Dict[str, jnp.ndarray] = {}
    _run_hovernet(fp, img, None, scales, dtype=dtype)
    return scales


def quantize_params(fp, act_maxes: Dict[str, Any], margin: float = 1.0,
                    float_branches: Tuple[str, ...] = ('hv',),
                    float_site_prefixes: Tuple[str, ...] = ()):
    """``float_branches`` stay ENTIRELY on the bf16 path: the hv branch
    regresses CONTINUOUS per-pixel offsets whose sobel/watershed consumers
    are sensitive to 8-bit resolution — measured on a converged model
    (tools/int8_gate_study.py, docs/ROUND4.md): hv int8 costs −2.8 Aji
    pts, a float u1a/u0 tail alone recovers only 0.5 of that, and widening
    the calibration margin makes it WORSE (coarser steps — a resolution
    limit, not saturation). Executors branch on site presence, so
    exempted branches run the float path."""
    act = {k: jnp.maximum(jnp.asarray(v, jnp.float32) * margin, 1e-12) / 127.0
           for k, v in act_maxes.items()}
    wq: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    wq['stem'] = _wquant(fp['stem'][0])
    for si, stage in enumerate(fp['blocks']):
        for bi, blk in enumerate(stage):
            pre = f'l{si}b{bi}'
            for cn in ('c1', 'c2', 'c3'):
                wq[f'{pre}{cn}'] = _wquant(blk[cn][0])
            if blk['down'] is not None:
                wq[f'{pre}d'] = _wquant(blk['down'][0])
    wq['bot'] = _wquant(fp['conv_bot'])
    if float_site_prefixes:
        # partial-trunk probe (VERDICT r4 item 10): sites matching a prefix
        # run the float path (executors branch on wq presence); e.g.
        # ('stem', 'l0', 'l1') keeps only the stride>=8 trunk stages int8.
        wq = {k: v for k, v in wq.items()
              if not any(k.startswith(p) for p in float_site_prefixes)}
    for nm in _BRANCHES:
        br = fp['branches'][nm]
        if nm in float_branches:
            continue
        for lvl in ('u3', 'u2'):
            wq[f'{nm}.{lvl}a'] = _wquant(br[f'{lvl}a'])
            for u, unit in enumerate(br[f'{lvl}d']):
                wq[f'{nm}.{lvl}d{u}c1'] = _wquant(unit['W1'])
                wq[f'{nm}.{lvl}d{u}c2'] = _wquant(unit['W2'])
            wq[f'{nm}.{lvl}f'] = _wquant(br[f'{lvl}f'])
        wq[f'{nm}.u1a'] = _wquant(br['u1a'])
        wq[f'{nm}.u0'] = _wquant(br['u0_cls'][0])
    return {'act': act, 'wq': wq}


def apply_hovernet_q(fp, fpq, img, dtype=jnp.bfloat16):
    return _run_hovernet(fp, img, fpq, None, dtype=dtype)


# ---------------------------------------------------------------------------
# backbone-RESIDENT int8 executor
# ---------------------------------------------------------------------------
#
# HoverNet's HBM bytes are dominated by the stride-1 ResNetExt trunk (layer1
# runs 256 channels at FULL resolution — tools/model_sol.py pins the model
# mem-bound, SOL-mem 135 ms >> SOL-compute 62 ms at B=32). ``apply_hovernet_q``
# dequantizes every conv output to bf16, so that traffic stays bf16-sized.
# This executor keeps the BACKBONE's activations int8 between convs (requant
# fused into each conv's epilogue):
#
# - within a bottleneck, c1/c2/c3 chain int8; the residual add runs in f32
#   (two different dequant scales), then one requant feeds the next block;
# - the block input's single int8 copy serves both c1 and the downsample conv
#   (calibration records both sites from the same tensor, so their scales are
#   numerically identical; the dequant uses the c1 scale explicitly);
# - identity residuals read the dequantized int8 copy (q * s) instead of a
#   bf16 original — the one numerics delta vs apply_hovernet_q, covered by
#   the executor tests and the bench's held-out accuracy gate;
# - stage outputs emit one copy per consumer: bf16 for the decoder branches
#   (their adds/pre-act affines are float), and d3 emits int8 at the 'bot'
#   scale since conv_bot is its only consumer.
#
# The decoder branches keep the dequant-style int8 path (per-channel pre-act
# BN affines and upsample-adds pull tensors to float between convs anyway).
# Sites/scales are IDENTICAL to apply_hovernet_q; no fpq changes needed.


def _run_backbone_q8(fp, fpq, img):
    relu = jax.nn.relu
    act, wq = fpq['act'], fpq['wq']
    y0 = _conv_i8(_qround(img, act['stem']), wq['stem'][0], padding=((3, 3), (3, 3)))
    yf = relu(_deq_f32(y0, 'stem', fpq, fp['stem'][1]))
    outs = []
    n_stages = len(fp['blocks'])
    for si, stage in enumerate(fp['blocks']):
        for bi, blk in enumerate(stage):
            strides = (2, 2) if (bi == 0 and si > 0) else (1, 1)
            pre = f'l{si}b{bi}'
            xq = _req(yf, f'{pre}c1', fpq)
            y = relu(_deq_f32(_conv_i8(xq, wq[f'{pre}c1'][0]), f'{pre}c1', fpq, blk['c1'][1]))
            y = relu(_deq_f32(_conv_i8(_req(y, f'{pre}c2', fpq), wq[f'{pre}c2'][0],
                                       strides=strides, padding=((1, 1), (1, 1))),
                              f'{pre}c2', fpq, blk['c2'][1]))
            y = _deq_f32(_conv_i8(_req(y, f'{pre}c3', fpq), wq[f'{pre}c3'][0]),
                         f'{pre}c3', fpq, blk['c3'][1])
            if blk['down'] is None:
                # identity residual: dequantize the same int8 copy c1 reads
                res = xq.astype(jnp.float32) * act[f'{pre}c1']
            else:
                # down-conv rides xq too; dequant at the c1 input scale it
                # was quantized with (== the recorded d scale, same tensor)
                yd = _conv_i8(xq, wq[f'{pre}d'][0], strides=strides)
                res = (yd.astype(jnp.float32) * (act[f'{pre}c1'] * wq[f'{pre}d'][1])
                       + blk['down'][1].astype(jnp.float32))
            yf = relu(y + res)
        outs.append(yf)
    return outs


# ---------------------------------------------------------------------------
# decoder-branch-RESIDENT int8 executor
# ---------------------------------------------------------------------------
#
# The dense blocks are the branch's byte mass: every unit's pre-act BN reads
# the FULL growing concat tensor, and the dequant-style path stores that
# concat in bf16. Key observation: channel concatenation PRESERVES per-channel
# quantization scales, so the concat can be materialized int8 with a STATIC
# per-channel scale vector assembled from per-site scalars — the block input
# segment at `{nm}.{lvl}in` and each unit's conv2 output at `{nm}.{lvl}d{u}y`.
# The pre-act BN affine then folds the scale vector per channel
# (relu(a_c*(s_c*q_c) + b_c)), so each unit is: one int8->int8 fused
# elementwise pass + two int8 convs. Also quantized here: the final full-res
# ``u0_cls`` 1x1 head (site `{nm}.u0`) — its f32 input read at 256^2 was the
# other float tensor the dequant path materialized per branch (logits still
# come out f32, the flax contract; accuracy rides the same held-out gate).
# Extra roundings vs apply_hovernet_q: the concat segments and the u0_cls
# input pass through int8 once each — covered by the executor-agreement
# tests and the bench accuracy gate.


def _run_branch_q8(fp_br, nm: str, feats, fpq):
    relu = jax.nn.relu
    act, wq = fpq['act'], fpq['wq']

    def f32(t):
        return t.astype(jnp.float32)

    def emit_i8(y_i32, conv_site: str, out_scale):
        # int32 conv accumulator -> int8 at the emission site's scale, in one
        # fused epilogue (per-out-channel weight scales fold into the ratio)
        s = act[conv_site] * wq[conv_site][1]
        q = jnp.round(f32(y_i32) * (s / out_scale))
        return jnp.clip(q, -127, 127).astype(jnp.int8)

    def dense_block(x8, sv, lvl: str):
        for u, unit in enumerate(fp_br[f'{lvl}d']):
            site1, site2 = f'{nm}.{lvl}d{u}c1', f'{nm}.{lvl}d{u}c2'
            a1, c1 = unit['bn1']
            z = relu(f32(x8) * (sv * f32(a1)) + f32(c1))
            y = _conv_i8(_qround(z, act[site1]), wq[site1][0])
            a2, c2 = unit['bn2']
            z = relu(_deq_f32(y, site1, fpq) * f32(a2) + f32(c2))
            y = _conv_i8(_qround(z, act[site2]), wq[site2][0], groups=4)
            s_y = act[f'{nm}.{lvl}d{u}y']
            x8 = jnp.concatenate([x8, emit_i8(y, site2, s_y)], axis=-1)
            sv = jnp.concatenate([sv, jnp.broadcast_to(s_y, (y.shape[-1],))])
        ab, cb = fp_br[f'{lvl}_blk_bn']
        return relu(f32(x8) * (sv * f32(ab)) + f32(cb))

    def level(x_f, lvl: str):
        sa, s_in = f'{nm}.{lvl}a', act[f'{nm}.{lvl}in']
        x8 = emit_i8(_conv_i8(_qround(x_f, act[sa]), wq[sa][0]), sa, s_in)
        sv = jnp.broadcast_to(s_in, (x8.shape[-1],))
        xf = dense_block(x8, sv, lvl)
        sf = f'{nm}.{lvl}f'
        return _deq_f32(_conv_i8(_qround(xf, act[sf]), wq[sf][0]), sf, fpq)

    d0, d1, d2, d3 = feats
    u3 = level(f32(upsample_2x_nearest(d3)) + f32(d2), 'u3')
    u2 = level(upsample_2x_nearest(u3) + f32(d1), 'u2')
    s1 = f'{nm}.u1a'
    u1_in = upsample_2x_nearest(u2) + f32(d0)
    if s1 in wq:
        u1 = _deq_f32(_conv_i8(_qround(u1_in, act[s1]), wq[s1][0]), s1, fpq)
    else:  # float_branches exemption (quantize_params)
        u1 = f32(_conv(u1_in.astype(fp_br['u1a'].dtype), fp_br['u1a']))
    a0, c0 = fp_br['u0_bn']
    u0 = relu(u1 * f32(a0) + f32(c0))
    s0 = f'{nm}.u0'
    Wk, bk = fp_br['u0_cls']
    if s0 in wq:
        # bias in the f32 epilogue; kernel rides wq[f'{nm}.u0']
        return _deq_f32(_conv_i8(_qround(u0, act[s0]), wq[s0][0]), s0, fpq, bk)
    return _conv(u0, f32(Wk)) + f32(bk)


def apply_hovernet_q8(fp, fpq, img, dtype=jnp.bfloat16):
    """Fully-resident int8 forward: trunk activations stay int8 between convs
    (_run_backbone_q8) AND the decoder dense-concat tensors stay int8 with
    per-channel scale vectors (_run_branch_q8); u0_cls runs int8 too."""
    if 'stem' not in fpq['wq']:
        # partial-trunk quantization (float_site_prefixes): the resident
        # trunk assumes every site is int8 — fall back to the sited
        # (per-conv float/int8) executor for the whole net
        return apply_hovernet_q(fp, fpq, img, dtype=dtype)
    feats = _run_backbone_q8(fp, fpq, img)
    # d3 -> conv_bot: quantize once from the f32 stage output (its only consumer)
    yb = _conv_i8(_req(feats[3], 'bot', fpq), fpq['wq']['bot'][0])
    d3 = _deq_f32(yb, 'bot', fpq).astype(dtype)
    # skips materialize once in bf16; each branch upcasts in fused elementwise
    feats = (feats[0].astype(dtype), feats[1].astype(dtype), feats[2].astype(dtype), d3)
    out = {}
    for nm in _BRANCHES:
        if f'{nm}.u3a' in fpq['wq']:
            out[nm] = _run_branch_q8(fp['branches'][nm], nm, feats, fpq)
        else:  # float_branches exemption: whole branch on the bf16 path
            out[nm] = _run_branch(fp['branches'][nm], nm, feats, None, None, dtype)
    return {'sem': out['tp'], 'fore': out['np'], 'hv': out['hv']}


def apply_hovernet_bf16(fp, img, dtype=jnp.bfloat16):
    return _run_hovernet(fp, img, None, None, dtype=dtype)
