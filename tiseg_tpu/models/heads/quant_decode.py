"""Int8 post-training-quantized twin of the phase-space fast eval path.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs
197 TFLOP/s), so a quantized forward has a 2x-compute speed-of-light
over the bf16 ceiling the round-3 account pinned (docs/ROUND3.md). This
module is the opt-in experiment: symmetric per-output-channel weight
quantization + per-site static activation scales (abs-max calibration),
every hot conv of the fast UNet path (fast_decode.py) — the VGG trunk,
the phase-space decode stages AND the plain (non-phase) decode stages
(tconv + concat conv, one shared scale for the concat) — executed as an
int8 conv with dequant+bias+relu fused around it by XLA. The final
``cls`` head conv stays bf16 (it is <0.5% of the FLOPs and its output
feeds the argmax directly, where 8-bit logit rounding costs accuracy
for no measurable speed).

Pipeline: ``scales = calibrate(fp, imgs)`` (one bf16 forward that also
returns each conv input's abs-max) -> ``fpq = quantize_params(fp,
scales)`` -> ``apply_fast_vgg16_q`` / ``apply_fast_unet_head_q`` mirror
their fast_decode counterparts exactly (same phase-space algebra, same
edge masks), so the ONLY divergence from the bf16 path is 8-bit
rounding. Accuracy is a measured question (tests pin logits to a loose
tolerance; AJI impact is measured on the bench workload).

The shipped default path stays bf16; nothing here is on a default route.
Reference forward being accelerated: tiseg/models/segmentors/unet.py
via heads/unet_head.py:93-106.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .fast_decode import (PhaseSkip, _conv, _mask_edges_flat, _max_pool_2x, _pool_from_offm1,
                          d2s)

# conv "sites" (activation-scale keys) in execution order:
#   vgg: W0 (raw image), W1, s{1..4}c{0..} (stage convs)
#   head: dec{i}.t (tconv input), dec{i}.ct (block conv on tconv output),
#         dec{i}.cs (skip conv input); PLAIN (non-phase) decoder stages use
#         dec{i}.pt (tconv input) and dec{i}.pc (the concat [up, skip]
#         tensor feeding the stage conv — one shared scale for both
#         halves, so concatenation happens in int8). The cls head conv is
#         NOT a site: it runs bf16 (see module docstring).


def _qround(x, scale):
    """Symmetric int8 quantization of a bf16/f32 tensor at a static scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _alias_pairs(act: Dict[str, Any]):
    """(skip_site, next_consumer_site) pairs quantizing the SAME tensor:
    dec0.cs_phase/s1c0 (stage0 phase output), dec{i}.cs_std/s{i+1}c0
    (early VGG stage outputs). Only pairs present in ``act`` are returned."""
    pairs = []
    if 'dec0.cs_phase' in act and 's1c0' in act:
        pairs.append(('dec0.cs_phase', 's1c0'))
    i = 1
    while f'dec{i}.cs_std' in act:
        if f's{i + 1}c0' in act:
            pairs.append((f'dec{i}.cs_std', f's{i + 1}c0'))
        i += 1
    return pairs


def _wquant(W) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 weights: (W_q, s_w[F])."""
    Wf = W.astype(jnp.float32)
    s = jnp.max(jnp.abs(Wf), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)
    Wq = jnp.clip(jnp.round(Wf / s), -127, 127).astype(jnp.int8)
    return Wq, s


def _conv_q(x, site: str, W_or_q, bias, fpq_or_none, scales_out, strides=(1, 1),
            padding='SAME', dtype=jnp.bfloat16):
    """One conv site. Quantized mode (fpq_or_none given): int8 conv +
    dequant + bias. Calibration mode: bf16 conv, recording the input
    abs-max into scales_out."""
    if fpq_or_none is None:
        scales_out[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        return _conv(x.astype(dtype), W_or_q.astype(dtype), padding, strides) + bias.astype(dtype)
    s_x = fpq_or_none['act'][site]
    Wq, s_w = fpq_or_none['wq'][site]
    xq = _qround(x, s_x)
    y = jax.lax.conv_general_dilated(xq, Wq, strides, padding,
                                     dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                     preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * s_w)).astype(dtype) + bias.astype(dtype)


def _run_vgg(fp, img, fpq, scales_out, dtype=jnp.bfloat16):
    C0 = fp['W1'].shape[2] // 4
    z0 = jax.nn.relu(_conv_q(img, 'W0', fp['W0'], fp['b0'], fpq, scales_out,
                             strides=(2, 2), padding=((1, 1), (1, 1)), dtype=dtype))
    z1 = jax.nn.relu(_conv_q(z0, 'W1', fp['W1'], fp['b1'], fpq, scales_out,
                             padding=((1, 1), (1, 1)), dtype=dtype))
    z1 = _mask_edges_flat(z1, C0)
    outs: List[Any] = [PhaseSkip(z1, C0)]
    x = _pool_from_offm1(z1, C0)
    for s, convs in enumerate(fp['stages'], start=1):
        if s > 1:
            x = _max_pool_2x(x)
        for ci, (k, b) in enumerate(convs):
            x = jax.nn.relu(_conv_q(x, f's{s}c{ci}', k, b, fpq, scales_out, dtype=dtype))
        outs.append(x)
    outs.append(_max_pool_2x(x))
    return outs


def _tconv(x, W, preferred_element_type=None):
    return jax.lax.conv_transpose(x, W, (2, 2), 'SAME',
                                  dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                  preferred_element_type=preferred_element_type)


def _pad_to(y, skip):
    dh = skip.shape[1] - y.shape[1]
    dw = skip.shape[2] - y.shape[2]
    if dh or dw:
        y = jnp.pad(y, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
    return y


def _plain_stage_sited(st, i, x, skip, fpq, scales_out, dtype):
    """A plain (non-phase) decoder stage with quantization sites dec{i}.pt
    / dec{i}.pc. Mirrors fast_decode._apply_stage_plain exactly (same op
    order/dtypes) so the calibration executor stays bit-identical to the
    shipped fast path; quantized mode runs the tconv and the concat conv
    as int8 convs with dequant around each (the concat's two halves share
    the dec{i}.pc scale)."""
    from .fast_decode import PhaseSkip, _apply_stage_plain
    if isinstance(skip, PhaseSkip):  # not reachable on the shipped layout
        return _apply_stage_plain(st, x, skip, dtype)
    if fpq is None:
        if scales_out is not None:
            scales_out[f'dec{i}.pt'] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        y = jax.nn.relu(_tconv(x.astype(dtype), st['Wt']) + st['bt'])
        y = _pad_to(y, skip)
        y = jnp.concatenate([y, skip.astype(dtype)], axis=-1)
        if scales_out is not None:
            scales_out[f'dec{i}.pc'] = jnp.max(jnp.abs(y.astype(jnp.float32)))
        return jax.nn.relu(_conv(y, st['Wc']) + st['bc'])
    s_x = fpq['act'][f'dec{i}.pt']
    Wq_t, s_wt = fpq['wq'][f'dec{i}.pt']
    yt = _tconv(_qround(x, s_x), Wq_t, preferred_element_type=jnp.int32)
    y = jax.nn.relu((yt.astype(jnp.float32) * (s_x * s_wt)).astype(dtype) + st['bt'].astype(dtype))
    s_c = fpq['act'][f'dec{i}.pc']
    yq = _pad_to(_qround(y, s_c), skip)
    cat = jnp.concatenate([yq, _qround(skip, s_c)], axis=-1)
    Wq_c, s_wc = fpq['wq'][f'dec{i}.pc']
    y2 = jax.lax.conv_general_dilated(cat, Wq_c, (1, 1), 'SAME',
                                      dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                      preferred_element_type=jnp.int32)
    y2 = (y2.astype(jnp.float32) * (s_c * s_wc)).astype(dtype) + st['bc'].astype(dtype)
    return jax.nn.relu(y2)


def _run_head(fp, bottom, skips, fpq, scales_out, dtype=jnp.bfloat16):
    x = bottom
    n = len(fp['stages'])
    phase_out = None
    for i in range(n - 1, -1, -1):
        st = fp['stages'][i]
        if 'Wc_t' in st:  # phase-space stage
            if phase_out is not None:
                x = d2s(phase_out, phase_out.shape[-1] // 4)
                phase_out = None
            zero = jnp.zeros((), dtype)
            t = _conv_q(x, f'dec{i}.t', st['Wt'], st['bt'], fpq, scales_out,
                        padding=((1, 1), (1, 1)), dtype=dtype)
            t = jax.nn.relu(t)
            t = _mask_edges_flat(t, st['Wt'].shape[-1] // 4)
            y = _conv_q(t, f'dec{i}.ct', st['Wc_t'], zero, fpq, scales_out,
                        padding='VALID', dtype=dtype)
            skip = skips[i]
            if isinstance(skip, PhaseSkip):
                y = y + _conv_q(skip.z, f'dec{i}.cs_phase', st['Wc_s_phase'], zero, fpq,
                                scales_out, padding='VALID', dtype=dtype)
            else:
                y = y + _conv_q(skip, f'dec{i}.cs_std', st['Wc_s'], zero, fpq, scales_out,
                                strides=(2, 2), padding=((1, 1), (1, 1)), dtype=dtype)
            phase_out = jax.nn.relu(y + st['bc'].astype(dtype))
            x = None
        else:  # plain folded stage (UNet default: decode indices > 1)
            if phase_out is not None:
                x = d2s(phase_out, phase_out.shape[-1] // 4)
                phase_out = None
            x = _plain_stage_sited(st, i, x, skips[i], fpq, scales_out, dtype)
    Wk, bk = fp['cls_kernel'], fp['cls_bias']
    nc = Wk.shape[-1]
    if phase_out is not None:
        # 1x1 head on the phase layout: per-phase matmul (fast_decode tail)
        B, Hb, Wb, C4 = phase_out.shape
        y = phase_out.reshape(B, Hb, Wb, 4, C4 // 4) @ Wk[0, 0].astype(dtype) + bk.astype(dtype)
        return d2s(y.reshape(B, Hb, Wb, 4 * nc), nc)
    return _conv(x, Wk.astype(dtype)) + bk.astype(dtype)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def calibrate(fp_vgg, fp_head, img, dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """One float forward over the fast path recording every conv input's
    abs-max. jit-able; returns {site: scalar}. ``dtype`` must match the
    dtype the fp trees were built with."""
    scales: Dict[str, jnp.ndarray] = {}
    outs = _run_vgg(fp_vgg, img, None, scales, dtype=dtype)
    _run_head(fp_head, outs[-1], outs[:-1], None, scales, dtype=dtype)
    return scales


def quantize_params(fp_vgg, fp_head, act_maxes: Dict[str, Any], margin: float = 1.0):
    """Build the int8 parameter tree: per-channel int8 weights + per-site
    activation scales (abs-max / 127, widened by ``margin``).

    Dual-consumer sites are ALIASED to one scale: a phase/early VGG stage
    output feeds both its decoder skip conv (dec{i}.cs_*) and — max-pooled —
    the next VGG stage (s{i+1}c0). Max-pooling a post-relu tensor preserves
    its abs-max, so the two recorded maxes are equal in exact arithmetic;
    pinning both sites to their maximum makes the two int8 quantizations of
    the tensor IDENTICAL, so the resident executor materializes one int8
    copy instead of two (docs/ROUND4.md, single-emission)."""
    act = {k: jnp.maximum(jnp.asarray(v, jnp.float32) * margin, 1e-12) / 127.0
           for k, v in act_maxes.items()}
    for skip_site, next_site in _alias_pairs(act):
        shared = jnp.maximum(act[skip_site], act[next_site])
        act[skip_site] = shared
        act[next_site] = shared
    wq: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    wq['W0'] = _wquant(fp_vgg['W0'])
    wq['W1'] = _wquant(fp_vgg['W1'])
    for s, convs in enumerate(fp_vgg['stages'], start=1):
        for ci, (k, b) in enumerate(convs):
            wq[f's{s}c{ci}'] = _wquant(k)
    for i, st in fp_head['stages'].items():
        if 'Wc_t' in st:
            wq[f'dec{i}.t'] = _wquant(st['Wt'])
            wq[f'dec{i}.ct'] = _wquant(st['Wc_t'])
            # the apply picks the skip branch by skip type; calibration
            # recorded the branch actually taken, so quantize that one
            if f'dec{i}.cs_phase' in act:
                wq[f'dec{i}.cs_phase'] = _wquant(st['Wc_s_phase'])
            if f'dec{i}.cs_std' in act:
                wq[f'dec{i}.cs_std'] = _wquant(st['Wc_s'])
        elif f'dec{i}.pt' in act:  # plain stage (PhaseSkip plain stages record no site)
            wq[f'dec{i}.pt'] = _wquant(st['Wt'])
            wq[f'dec{i}.pc'] = _wquant(st['Wc'])
    return {'act': act, 'wq': wq}


def apply_fast_unet_q(fp_vgg, fp_head, fpq, img, dtype=jnp.bfloat16):
    """Full int8 fast-path forward: image -> class logits."""
    outs = _run_vgg(fp_vgg, img, fpq, None, dtype=dtype)
    return _run_head(fp_head, outs[-1], outs[:-1], fpq, None, dtype=dtype)


def apply_fast_unet_bf16(fp_vgg, fp_head, img, dtype=jnp.bfloat16):
    """The same code path in bf16 (calibration executor without recording
    consumers) — used by tests to isolate the 8-bit rounding delta."""
    scales: Dict[str, jnp.ndarray] = {}
    outs = _run_vgg(fp_vgg, img, None, scales, dtype=dtype)
    return _run_head(fp_head, outs[-1], outs[:-1], None, scales, dtype=dtype)


# ---------------------------------------------------------------------------
# int8-RESIDENT executor: activations live in int8 BETWEEN convs
# ---------------------------------------------------------------------------
#
# ``apply_fast_unet_q`` dequantizes every conv output to bf16 and the next
# site re-quantizes — so even though the MACs ride the int8 MXU, the
# activation chain still moves bf16 through HBM, and the measured program
# is memory-bound (docs/ROUND3.md: 4,314 p/s vs the ~5,470 bf16-bytes mem
# SOL). The resident executor instead folds dequant+bias+relu+REQUANT into
# each conv's epilogue, so the tensor materialized between convs is int8 —
# halving activation HBM traffic. Numerics: the quantization sites and
# scales are IDENTICAL to apply_fast_unet_q (each value is quantized at the
# same site scale); the only deltas are (a) quantizing from the f32
# epilogue value instead of a bf16-materialized copy and (b) f32 adds in
# the skip-sum — both strictly tighter. Tensors with two consumers at
# different site scales (the VGG stage outputs, feeding both the next
# stage and a decoder skip) are emitted as one int8 copy PER consumer from
# the same epilogue fusion: write bytes equal one bf16 copy, read bytes
# halve. Max-pooling commutes with symmetric quantization (monotonic), so
# pools run directly on int8.


def _conv_i8(xq, Wq, strides=(1, 1), padding='SAME', groups: int = 1):
    return jax.lax.conv_general_dilated(xq, Wq, strides, padding,
                                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                                        feature_group_count=groups,
                                        preferred_element_type=jnp.int32)


def _deq_f32(y_i32, site: str, fpq, bias=None):
    """int32 conv accumulator -> f32 value at the site's (s_x * s_w) scale."""
    s_x = fpq['act'][site]
    s_w = fpq['wq'][site][1]
    yf = y_i32.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        yf = yf + bias.astype(jnp.float32)
    return yf


def _req(yf, site: str, fpq):
    """Requantize an f32 epilogue value for consumption at ``site``."""
    return _qround(yf, fpq['act'][site])


def _max_pool_2x_i8(x):
    return jax.lax.reduce_window(x, jnp.array(-128, x.dtype), jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')


def _plain_sites_ok(fpq, k_phase: int, n_head: int) -> bool:
    """True iff EVERY plain decoder stage (k_phase+1 .. n_head-1) has its
    int8 sites — the int8-resident plain path is all-or-nothing so the
    VGG skip emission and the head consumption always agree on dtype."""
    return all(f'dec{i}.pt' in fpq['act'] and f'dec{i}.pc' in fpq['act']
               for i in range(k_phase + 1, n_head))


def _run_vgg_q8(fp, fpq, img, k_phase: int, dtype=jnp.bfloat16):
    """VGG16 forward, int8-resident. Returns the 6 outputs of _run_vgg with
    skips quantized for their decoder consumer: outs[0] is a PhaseSkip whose
    .z is int8 at the 'dec0.cs_phase' scale; outs[s] (s=1..k_phase) is int8
    at 'dec{s}.cs_std'; later skips are int8 at 'dec{s}.pc' (their plain
    decoder stages consume the concat in int8) and the bottom is max-pooled
    in int8 at 'dec{n}.pt' — falling back to bf16 when the plain sites are
    absent from ``fpq`` (_plain_sites_ok)."""
    act = fpq['act']
    C0 = fp['W1'].shape[2] // 4
    y0 = _conv_i8(_qround(img, act['W0']), fpq['wq']['W0'][0], strides=(2, 2),
                  padding=((1, 1), (1, 1)))
    z0q = _req(jax.nn.relu(_deq_f32(y0, 'W0', fpq, fp['b0'])), 'W1', fpq)
    y1 = _conv_i8(z0q, fpq['wq']['W1'][0], padding=((1, 1), (1, 1)))
    z1f = _mask_edges_flat(jax.nn.relu(_deq_f32(y1, 'W1', fpq, fp['b1'])), C0)
    # single emission: the s1c0 scale is aliased to dec0.cs_phase
    # (quantize_params._alias_pairs), so ONE int8 copy serves both the
    # decoder skip and the pool into stage 1
    z1q = _req(z1f, 's1c0', fpq)
    outs: List[Any] = [PhaseSkip(z1q, C0)]
    xq = _pool_from_offm1(z1q, C0)
    n_stages = len(fp['stages'])
    plain_q = _plain_sites_ok(fpq, k_phase, n_stages + 1)
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
            if s <= k_phase or plain_q:
                # one int8 copy: phase skips read it at the aliased
                # dec{s}.cs_std scale; plain-stage skips at their own
                # s{s+1}c0 scale via the split concat conv (_run_head_q8)
                outs.append(xq)
            else:
                outs.append(yf.astype(dtype))
        elif plain_q:  # bottom: pool commutes with symmetric quant
            q = _req(yf, f'dec{n_stages}.pt', fpq)
            outs.append(q)
            outs.append(_max_pool_2x_i8(q))
        else:
            outs.append(yf.astype(dtype))
            outs.append(_max_pool_2x(yf.astype(dtype)))
    return outs


def _run_head_q8(fp, bottom, skips, fpq, k_phase: int, dtype=jnp.bfloat16,
                 out: str = 'logits'):
    stages = fp['stages']
    n = len(stages)
    from .fast_decode import _apply_stage_plain
    x = bottom
    # plain stages run int8 only when EVERY one is sited (an fpq from a
    # calibration without plain sites keeps the float path; _run_vgg_q8
    # gates its int8 skip/bottom emission on the same predicate)
    plain_q = _plain_sites_ok(fpq, k_phase, n)
    for i in range(n - 1, k_phase, -1):
        st = stages[i]
        if not plain_q:
            x = _apply_stage_plain(st, x, skips[i], dtype)
            continue
        site_t = f'dec{i}.pt'
        xq = x if x.dtype == jnp.int8 else _qround(x, fpq['act'][site_t])
        Wq_t, s_wt = fpq['wq'][site_t]
        yt = _tconv(xq, Wq_t, preferred_element_type=jnp.int32)
        yf = jax.nn.relu(yt.astype(jnp.float32) * (fpq['act'][site_t] * s_wt)
                         + st['bt'].astype(jnp.float32))
        site_c = f'dec{i}.pc'
        s_c = fpq['act'][site_c]
        Wq_c, s_wc = fpq['wq'][site_c]
        yq = _pad_to(_req(yf, site_c, fpq), skips[i])
        skip = skips[i]
        if skip.dtype == jnp.int8:
            # SPLIT concat conv with per-group input scales: the skip is
            # the single int8 copy the VGG emitted at ITS OWN scale
            # (s{i+1}c0 / dec{n}.pt — no requant pass, no concat tensor);
            # the group scales fold into the two partial sums' dequants.
            s_skip = fpq['act'][f'dec{i}.pt' if i == n - 1 else f's{i + 1}c0']
            cy = yq.shape[-1]
            y_up = _conv_i8(yq, Wq_c[:, :, :cy, :])
            y_skip = _conv_i8(skip, Wq_c[:, :, cy:, :])
            yf2 = jax.nn.relu(y_up.astype(jnp.float32) * (s_c * s_wc)
                              + y_skip.astype(jnp.float32) * (s_skip * s_wc)
                              + st['bc'].astype(jnp.float32))
        else:
            cat = jnp.concatenate([yq, _qround(skip, s_c)], axis=-1)
            yf2 = jax.nn.relu(_deq_f32(_conv_i8(cat, Wq_c), site_c, fpq, st['bc']))
        next_site = f'dec{i - 1}.pt' if i - 1 > k_phase else f'dec{k_phase}.t'
        x = _req(yf2, next_site, fpq)
    xq = x if x.dtype == jnp.int8 else _qround(x, fpq['act'][f'dec{k_phase}.t'])
    yf = None
    for i in range(k_phase, -1, -1):
        st = stages[i]
        t = _deq_f32(_conv_i8(xq, fpq['wq'][f'dec{i}.t'][0], padding=((1, 1), (1, 1))),
                     f'dec{i}.t', fpq, st['bt'])
        t = _mask_edges_flat(jax.nn.relu(t), st['Wt'].shape[-1] // 4)
        tq = _req(t, f'dec{i}.ct', fpq)
        y = _deq_f32(_conv_i8(tq, fpq['wq'][f'dec{i}.ct'][0], padding='VALID'),
                     f'dec{i}.ct', fpq)
        skip = skips[i]
        if isinstance(skip, PhaseSkip):
            y = y + _deq_f32(_conv_i8(skip.z, fpq['wq'][f'dec{i}.cs_phase'][0], padding='VALID'),
                             f'dec{i}.cs_phase', fpq)
        else:
            y = y + _deq_f32(_conv_i8(skip, fpq['wq'][f'dec{i}.cs_std'][0], strides=(2, 2),
                                      padding=((1, 1), (1, 1))), f'dec{i}.cs_std', fpq)
        yf = jax.nn.relu(y + st['bc'].astype(jnp.float32))
        if i > 0:
            q = _req(yf, f'dec{i - 1}.t', fpq)
            xq = d2s(q, q.shape[-1] // 4)
    phase_out = yf.astype(dtype)
    Wk, bk = fp['cls_kernel'], fp['cls_bias']
    nc = Wk.shape[-1]
    B, Hb, Wb, C4 = phase_out.shape
    y = phase_out.reshape(B, Hb, Wb, 4, C4 // 4) @ Wk[0, 0].astype(dtype) + bk.astype(dtype)
    if out == 'pred':
        # argmax IN the phase layout (argmax commutes with the d2s
        # permutation): the logits tensor is never materialized at full
        # resolution and the cls matmul + argmax can fuse into dec0's
        # conv epilogue. Bit-identical to argmax(d2s(logits)).
        pred = jnp.argmax(y, axis=-1).astype(jnp.int32)  # (B, Hb, Wb, (2,2))
        return d2s(pred, 1)[..., 0]
    return d2s(y.reshape(B, Hb, Wb, 4 * nc), nc)


def resident_ok(fp_head) -> bool:
    """The resident executor supports the shipped layout: phase stages form
    a contiguous prefix {0..k} with at least one plain stage above (so the
    bottom and upper skips are float), plus a cls head."""
    stages = fp_head.get('stages', {})
    phase_idx = sorted(i for i in stages if 'Wc_t' in stages[i])
    return (bool(phase_idx) and phase_idx == list(range(len(phase_idx)))
            and len(phase_idx) < len(stages) and 'cls_kernel' in fp_head)


def apply_fast_unet_q8(fp_vgg, fp_head, fpq, img, dtype=jnp.bfloat16, out: str = 'logits'):
    """Int8-resident fast-path forward: image -> class logits, activations
    materialized as int8 between convs. Same quantization sites/scales as
    ``apply_fast_unet_q``. Raises ValueError for head configs outside the
    shipped phase-prefix layout (callers fall back to apply_fast_unet_q).
    ``out='pred'`` returns the int32 argmax plane instead of logits (the
    fused device post-proc input) without materializing full-res logits."""
    if not resident_ok(fp_head):
        raise ValueError('int8-resident executor requires a contiguous phase-stage '
                         'prefix with a plain stage above it and a cls head')
    stages = fp_head['stages']
    k = max(i for i in stages if 'Wc_t' in stages[i])
    outs = _run_vgg_q8(fp_vgg, fpq, img, k, dtype=dtype)
    return _run_head_q8(fp_head, outs[-1], outs[:-1], fpq, k, dtype=dtype, out=out)
