"""Phase-space (space-to-depth) fast eval path for UNet-style decoders.

Why: the reference decoder's high-resolution stages have 16/32 output
channels (tiseg/models/heads/unet_head.py:24-49 -> stage dims 16..256);
on TPU a matmul/conv with N=16 output channels uses 16 of the MXU's 128
lanes (~12% utilization) and XLA additionally picks batch-minor layouts
for those tensors, inserting large copies. Profiling showed decode0+
decode1 cost ~8.6 ms of a 21.4 ms UNet forward (B=32, 256x256, bf16).

The fix is an EXACT algebraic rewrite, pure XLA (no Pallas needed):
express a stride-1 3x3 conv at resolution (2G)^2 as a 2x2 "block conv"
over the space-to-depth representation at G^2 with 4x the channels
(1.78x the FLOPs, ~4x the MXU lane utilization), and a 4x4/s2 transposed
conv as a shared-window 2x2 block conv producing all four output phases
at once. Key detail making the windows shareable: the s2d grid is offset
by -1 (block u covers rows {2u-1, 2u} of the padded plane), which makes
every output phase of both ops read the same {u, u+1} block window.

Derivations validated against flax ConvTranspose/lax.conv to ~1e-6
(tests/test_fast_decode.py). BatchNorm (eval: running stats) is folded
into the conv weights, so the fast path is conv+bias+relu only.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------

def fold_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding conv's kernel + bias."""
    s = bn_scale / jnp.sqrt(bn_var + eps)
    return kernel * s, bn_bias - bn_mean * s


def _layer_folded(params: Dict[str, Any], stats: Dict[str, Any], module: str, conv: str):
    """(kernel, bias) of a Conv/ConvTranspose + BatchNorm pair inside a
    UNetLayer ('TransposedConvModule_0'/'ConvTranspose_0' etc.)."""
    k = params[module][conv]['kernel']
    bn_p = params[module]['BatchNorm_0']
    bn_s = stats[module]['BatchNorm_0']
    return fold_conv_bn(k, bn_p['scale'], bn_p['bias'], bn_s['mean'], bn_s['var'])


# ---------------------------------------------------------------------------
# phase-space weight scatters
# ---------------------------------------------------------------------------

def phase_conv3x3_weights(Wc, b):
    """(3,3,C,F) SAME conv -> (2,2,4C,4F) VALID block conv on the offset-(-1)
    s2d grid. Wp[wy,wx, (py,px,c), (qy,qx,f)] = Wc[2w+p-q] when in [0,3)."""
    C, F = Wc.shape[2], Wc.shape[3]
    Wp = jnp.zeros((2, 2, 4 * C, 4 * F), Wc.dtype)
    for wy in range(2):
        for wx in range(2):
            for py in range(2):
                for px in range(2):
                    for qy in range(2):
                        for qx in range(2):
                            dy = 2 * wy + py - qy
                            dx = 2 * wx + px - qx
                            if 0 <= dy <= 2 and 0 <= dx <= 2:
                                ci = (py * 2 + px) * C
                                fo = (qy * 2 + qx) * F
                                Wp = Wp.at[wy, wx, ci:ci + C, fo:fo + F].set(Wc[dy, dx])
    bp = jnp.tile(b, 4)
    return Wp, bp


def strided_conv3x3_weights(Wc):
    """(3,3,C,F) SAME conv -> (4,4,C,4F) stride-2 VALID conv on the
    once-padded ORIGINAL tensor: output block i, phase q reads padded rows
    2i..2i+3 (original rows 2i-1..2i+2), so
    W4[ry,rx,c,(qy,qx,f)] = Wc[ry-qy, rx-qx, c, f] when in [0,3).
    This is the s2d block conv with the s2d folded into the conv — zero
    data-movement cost."""
    C, F = Wc.shape[2], Wc.shape[3]
    W4 = jnp.zeros((4, 4, C, 4 * F), Wc.dtype)
    for ry in range(4):
        for rx in range(4):
            for qy in range(2):
                for qx in range(2):
                    dy = ry - qy
                    dx = rx - qx
                    if 0 <= dy <= 2 and 0 <= dx <= 2:
                        fo = (qy * 2 + qx) * F
                        W4 = W4.at[ry, rx, :, fo:fo + F].set(Wc[dy, dx])
    return W4


def block_conv_t_weights(Wc_tpart, F_t: int):
    """3x3 SAME conv as a (2,2) block conv over a phase-layout input
    (channels laid out (py,px,ft)): W[wy,wx,(py,px,ft),(qy,qx,f)] =
    Wc_tpart[2w+p-q] when in [0,3).

    The same scatter serves both phase-offset directions — only the conv
    padding differs: offset-(-1) input -> offset-0 output uses VALID
    (window {u, u+1}: G+1 blocks -> G); offset-0 input -> offset-(-1)
    output uses padding ((1,1),(1,1)) (window {u-1, u}: G -> G+1)."""
    F = Wc_tpart.shape[3]
    Wp = jnp.zeros((2, 2, 4 * F_t, 4 * F), Wc_tpart.dtype)
    for wy in range(2):
        for wx in range(2):
            for py in range(2):
                for px in range(2):
                    for qy in range(2):
                        for qx in range(2):
                            dy = 2 * wy + py - qy
                            dx = 2 * wx + px - qx
                            if 0 <= dy <= 2 and 0 <= dx <= 2:
                                ci = (py * 2 + px) * F_t
                                fo = (qy * 2 + qx) * F
                                Wp = Wp.at[wy, wx, ci:ci + F_t, fo:fo + F].set(Wc_tpart[dy, dx])
    return Wp


def phase_tconv_weights(K4, b):
    """flax ConvTranspose (4,4,C,F) stride 2 SAME -> (2,2,C,4F) VALID block
    conv producing the offset-(-1) phase layout directly:
    Wt[a,b,c,(p,q,f)] = K4[2a+(1-p), 2b+(1-q), c, f]."""
    C, F = K4.shape[2], K4.shape[3]
    Wt = jnp.zeros((2, 2, C, 4 * F), K4.dtype)
    for a in range(2):
        for bb in range(2):
            for p in range(2):
                for q in range(2):
                    fo = (p * 2 + q) * F
                    Wt = Wt.at[a, bb, :, fo:fo + F].set(K4[2 * a + (1 - p), 2 * bb + (1 - q)])
    bt = jnp.tile(b, 4)
    return Wt, bt


# ---------------------------------------------------------------------------
# phase-space data movement
# ---------------------------------------------------------------------------

def s2d_offm1(x):
    """(B, H, W, C) -> (B, H/2+1, W/2+1, (2,2,C)): block u covers rows
    {2u-1, 2u} of the plane (zero padding outside)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Hb, Wb = H // 2 + 1, W // 2 + 1
    xb = xp.reshape(B, Hb, 2, Wb, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return xb.reshape(B, Hb, Wb, 4 * C)


def d2s(y, F: int):
    """(B, G, G, (2,2,F)) offset-0 phase layout -> (B, 2G, 2G, F)."""
    B, Hb, Wb, _ = y.shape
    y = y.reshape(B, Hb, Wb, 2, 2, F).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, Hb * 2, Wb * 2, F)


def _conv(x, W, padding='SAME', strides=(1, 1)):
    return jax.lax.conv_general_dilated(x, W, strides, padding,
                                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


# ---------------------------------------------------------------------------
# fast VGG16-BN eval (phase-space stage 0)
# ---------------------------------------------------------------------------

class PhaseSkip:
    """A (2G)^2 feature map held in offset-(-1) phase layout:
    (B, G+1, G+1, (2,2,C)); block u covers rows {2u-1, 2u}."""

    def __init__(self, z, channels: int):
        self.z = z
        self.channels = channels


def _edge_mask(Gb: int, dtype):
    """Zero the out-of-image phase rows/cols of an offset-(-1) phase tensor
    (block 0 phase 0 = row -1; block Gb-1 phase 1 = row 2(Gb-1))."""
    m = np.ones((Gb, 2), np.float32)
    m[0, 0] = 0.0
    m[Gb - 1, 1] = 0.0
    return jnp.asarray(m, dtype)


def _mask_edges_flat(z, C: int):
    """Apply the offset-(-1) edge mask on the FLAT (B, Gb, Gb, 4C) layout
    with two broadcast multiplies (channel layout (py,px,c)). Avoids 6-D
    reshapes, which XLA materializes in pathological layouts."""
    B, Gb, _, C4 = z.shape
    row = np.ones((Gb, C4), np.float32)
    col = np.ones((Gb, C4), np.float32)
    for py in range(2):
        for px in range(2):
            lo = (py * 2 + px) * C
            if py == 0:
                row[0, lo:lo + C] = 0.0
            else:
                row[Gb - 1, lo:lo + C] = 0.0
            if px == 0:
                col[0, lo:lo + C] = 0.0
            else:
                col[Gb - 1, lo:lo + C] = 0.0
    return z * jnp.asarray(row, z.dtype)[None, :, None, :] * jnp.asarray(col, z.dtype)[None, None, :, :]


def _pool_from_offm1(z, C: int):
    """2x2/s2 max pool of the underlying (2G)^2 map, taken directly from the
    offset-(-1) phase layout: pooled[i,j] = max over row phases {(i,1),(i+1,0)}
    x col phases {(j,1),(j+1,0)}. Flat channel slices (layout (py,px,c)) —
    no 6-D reshape."""
    def grp(py, px):
        lo = (py * 2 + px) * C
        return z[:, :, :, lo:lo + C]

    return jnp.maximum(
        jnp.maximum(grp(1, 1)[:, :-1, :-1], grp(1, 0)[:, :-1, 1:]),
        jnp.maximum(grp(0, 1)[:, 1:, :-1], grp(0, 0)[:, 1:, 1:]))


def build_fast_vgg16_params(params, stats, dtype=jnp.bfloat16):
    """Fold BN into every conv of a VGG16BN tree; stage0 additionally gets
    phase-space weights (stride-2 4x4 input conv + 2x2 block conv)."""
    from ..backbones.vgg import VGG_STAGE_CONVS
    fp = {}
    k0, b0 = _layer_folded(params, stats, 'stage0_conv0', 'Conv_0')
    fp['W0'] = strided_conv3x3_weights(k0).astype(dtype)
    fp['b0'] = jnp.tile(b0, 4).astype(dtype)
    k1, b1 = _layer_folded(params, stats, 'stage0_conv1', 'Conv_0')
    fp['W1'] = block_conv_t_weights(k1, k1.shape[2]).astype(dtype)
    fp['b1'] = jnp.tile(b1, 4).astype(dtype)
    fp['stages'] = []
    for s in range(1, 5):
        convs = []
        for ci in range(VGG_STAGE_CONVS['vgg16_bn'][s]):
            k, b = _layer_folded(params, stats, f'stage{s}_conv{ci}', 'Conv_0')
            convs.append((k.astype(dtype), b.astype(dtype)))
        fp['stages'].append(convs)
    return fp


def _max_pool_2x(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')


def apply_fast_vgg16(fp, img, dtype=jnp.bfloat16):
    """Eval-mode VGG16-BN pyramid. Returns the 6 stage outputs like
    VGG16BN.__call__, but outs[0] (skip0, the big 2G^2 x 64 map) is a
    PhaseSkip — it is never materialized in standard layout."""
    C0 = fp['W1'].shape[2] // 4
    z0 = jax.nn.relu(_conv(img.astype(dtype), fp['W0'], ((1, 1), (1, 1)), strides=(2, 2)) + fp['b0'])
    z1 = jax.nn.relu(_conv(z0, fp['W1'], ((1, 1), (1, 1))) + fp['b1'])
    z1 = _mask_edges_flat(z1, C0)
    outs = [PhaseSkip(z1, C0)]
    x = _pool_from_offm1(z1, C0)
    for s, convs in enumerate(fp['stages'], start=1):
        if s > 1:
            x = _max_pool_2x(x)
        for (k, b) in convs:
            x = jax.nn.relu(_conv(x, k) + b)
        outs.append(x)
    outs.append(_max_pool_2x(x))
    return outs


# ---------------------------------------------------------------------------
# UNet head fast path
# ---------------------------------------------------------------------------

def build_fast_unet_head_params(head_params, head_stats, dtype=jnp.bfloat16,
                                phase_stages=(0, 1), num_stages: int = 5):
    """Fold BN + build phase weights for a UNetHead parameter tree.

    phase_stages: decode indices rewritten in phase space (the low-channel
    high-resolution ones). Others run as plain folded convs.
    """
    fp = {'stages': {}}
    for i in range(num_stages):
        p = head_params[f'decode{i}']
        s = head_stats[f'decode{i}']
        kt, bt = _layer_folded(p, s, 'TransposedConvModule_0', 'ConvTranspose_0')
        kc, bc = _layer_folded(p, s, 'ConvModule_0', 'Conv_0')
        if i in phase_stages:
            F_t = kt.shape[3]
            Wt, bt_ = phase_tconv_weights(kt, bt)
            Wc_t = block_conv_t_weights(kc[:, :, :F_t, :], F_t)
            C_s = kc.shape[2] - F_t
            st = {'Wt': Wt.astype(dtype), 'bt': bt_.astype(dtype),
                  'Wc_t': Wc_t.astype(dtype),
                  'Wc_s': strided_conv3x3_weights(kc[:, :, F_t:, :]).astype(dtype),
                  'Wc_s_phase': block_conv_t_weights(kc[:, :, F_t:, :], C_s).astype(dtype),
                  'bc': jnp.tile(bc, 4).astype(dtype)}
        else:
            st = {'Wt': kt.astype(dtype), 'bt': bt.astype(dtype),
                  'Wc': kc.astype(dtype), 'bc': bc.astype(dtype)}
        fp['stages'][i] = st
    if 'cls' in head_params:
        fp['cls_kernel'] = head_params['cls']['kernel'].astype(dtype)
        fp['cls_bias'] = head_params['cls']['bias'].astype(dtype)
    return fp


def _apply_stage_phase(st, x, skip, dtype):
    """x: (B, G, G, C) low-res map; skip: (B, 2G, 2G, C_s). Returns the
    (2G)^2 output in offset-0 phase layout (B, G, G, 4F_c). Zero
    data-movement: the skip enters via a stride-2 4x4 conv directly on the
    padded original tensor; the tconv contribution via a 2x2 block conv."""
    t = _conv(x.astype(dtype), st['Wt'], ((1, 1), (1, 1))) + st['bt']  # (G+1)^2 x 4F_t, offset -1
    t = jax.nn.relu(t)
    # rows -1 and 2G of the tconv output don't exist in the flax path (the
    # following SAME conv sees zero padding there): mask them.
    t = _mask_edges_flat(t, st['Wt'].shape[-1] // 4)
    y = _conv(t, st['Wc_t'], 'VALID')                                  # G^2 x 4F_c, offset 0
    if isinstance(skip, PhaseSkip):
        y = y + _conv(skip.z, st['Wc_s_phase'], 'VALID')
    else:
        y = y + _conv(skip.astype(dtype), st['Wc_s'], ((1, 1), (1, 1)), strides=(2, 2))
    return jax.nn.relu(y + st['bc'])


def phase_to_standard(ps: PhaseSkip):
    """(B, G+1, G+1, (2,2,C)) offset-(-1) -> (B, 2G, 2G, C)."""
    C = ps.channels
    B, Gb, _, _ = ps.z.shape
    G = Gb - 1
    z4 = ps.z.reshape(B, Gb, Gb, 2, 2, C)
    rows = jnp.stack([z4[:, :-1, :, 1], z4[:, 1:, :, 0]], axis=2).reshape(B, 2 * G, Gb, 2, C)
    return jnp.stack([rows[:, :, :-1, 1], rows[:, :, 1:, 0]], axis=3).reshape(B, 2 * G, 2 * G, C)


def _apply_stage_plain(st, x, skip, dtype):
    if isinstance(skip, PhaseSkip):
        skip = phase_to_standard(skip)
    y = jax.lax.conv_transpose(x.astype(dtype), st['Wt'], (2, 2), 'SAME',
                               dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = jax.nn.relu(y + st['bt'])
    dh = skip.shape[1] - y.shape[1]
    dw = skip.shape[2] - y.shape[2]
    if dh or dw:
        y = jnp.pad(y, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
    y = jnp.concatenate([y, skip.astype(dtype)], axis=-1)
    y = jax.nn.relu(_conv(y, st['Wc']) + st['bc'])
    return y


def _use_fused_tail(st, skip, x, fp) -> bool:
    """Route the final stage through the fused Pallas kernel (decode0 +
    cls in one VMEM-resident program, attic/pallas_decode.py). Opt-in via
    TISEG_FUSED_TAIL=1: measured on v5e-1 the kernel loses to XLA's conv
    emitter for this region (7.0 ms vs 4.5 ms at B=128 — Mosaic's vector
    relayouts for the misaligned window slices cost more than the MXU
    lane-idle it recovers; docs/ROUND2.md "negative results").

    The flag is consulted at TRACE time: set it before the first jitted
    eval call — toggling it after a program is cached has no effect on
    that cached program."""
    if os.environ.get('TISEG_FUSED_TAIL', '0') != '1':
        return False
    return ('Wc_t' in st and isinstance(skip, PhaseSkip) and 'cls_kernel' in fp
            and x is not None)


def apply_fast_unet_head(fp, bottom, skips, dtype=jnp.bfloat16):
    """Fast eval-mode UNetHead: bottom + skips (low->high stride, reference
    ordering) -> class logits. Mirrors UNetHead.__call__ (unet_head.py:47-55)
    with BN folded and phase-space stages 0..k."""
    x = bottom
    n = len(fp['stages'])
    phase_out = None  # (B, G, G, 4F) offset-0 phase layout of the final map
    for i in range(n - 1, -1, -1):
        st = fp['stages'][i]
        if 'Wc_t' in st:  # phase-space stage
            if phase_out is not None:
                x = d2s(phase_out, phase_out.shape[-1] // 4)
                phase_out = None
            if i == 0 and _use_fused_tail(st, skips[0], x, fp):
                from ...attic.pallas_decode import fused_decode0_cls
                return fused_decode0_cls(
                    x, skips[0].z, st['Wt'], st['bt'], st['Wc_t'],
                    st['Wc_s_phase'], st['bc'], fp['cls_kernel'],
                    fp['cls_bias'], dtype=dtype)
            phase_out = _apply_stage_phase(st, x, skips[i], dtype)
            x = None
        else:
            x = _apply_stage_plain(st, x, skips[i], dtype)
    if 'cls_kernel' not in fp:
        if phase_out is not None:
            return d2s(phase_out, phase_out.shape[-1] // 4)
        return x
    Wk, bk = fp['cls_kernel'], fp['cls_bias']
    nc = Wk.shape[-1]
    if phase_out is not None:
        B, Hb, Wb, C4 = phase_out.shape
        y = phase_out.reshape(B, Hb, Wb, 4, C4 // 4) @ Wk[0, 0] + bk
        return d2s(y.reshape(B, Hb, Wb, 4 * nc), nc)
    return _conv(x, Wk) + bk
