"""Int8 post-training-quantized twin of the phase-space fast eval path.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs
197 TFLOP/s), so a quantized forward has a 2x-compute speed-of-light
over the bf16 ceiling the round-3 account pinned (docs/ROUND3.md). This
module is the opt-in experiment: symmetric per-output-channel weight
quantization + per-site static activation scales (abs-max calibration),
every hot conv of the fast UNet path (fast_decode.py) executed as an
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
#         dec{i}.cs (skip conv input). The cls head conv is NOT a site:
#         it runs bf16 (see module docstring).


def _qround(x, scale):
    """Symmetric int8 quantization of a bf16/f32 tensor at a static scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


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
        else:  # plain folded stage (not used by UNet's default phase config)
            from .fast_decode import _apply_stage_plain
            if phase_out is not None:
                x = d2s(phase_out, phase_out.shape[-1] // 4)
                phase_out = None
            x = _apply_stage_plain(st, x, skips[i], dtype)
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
    activation scales (abs-max / 127, widened by ``margin``)."""
    act = {k: jnp.maximum(jnp.asarray(v, jnp.float32) * margin, 1e-12) / 127.0
           for k, v in act_maxes.items()}
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
