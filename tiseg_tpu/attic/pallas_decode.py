"""Fused Pallas kernel for the final phase-space decode stage + classifier.

STATUS (v5e-1 measurement): off by default. The kernel compiles, runs and
is exact, but LOSES to XLA's emitter for this region — 7.0 ms vs 4.5 ms
at B=128 (plus ~1.7 ms for the explicit x pad and ~2 ms of layout copies
XLA inserts around the custom call). Mosaic's vector relayouts for the
misaligned (odd-offset) window slices cost more than the MXU lane-idle
they recover. Kept as a tested, opt-in path (TISEG_FUSED_TAIL=1): the
trade-off may flip on hardware with cheaper sublane shuffles or for
heads with more classes. Details: docs/ROUND2.md "negative results".

The fast eval path's last decode stage (fast_decode._apply_stage_phase at
i=0) plus the classifier matmul is the worst-utilization region of the
UNet program on TPU (measured 4.5 ms of 46 ms at B=128): the block convs
have N=64 output channels (half the MXU lanes idle) and XLA materializes
the tconv intermediate ``t`` to HBM between them. This kernel runs the
whole tail per image in VMEM:

    x (decode1 output, standard layout)   --tconv-->  t   (offm1 phase)
    t, skip z1 (offm1 phase)              --2x2 VALID convs--> y (phase)
    y --bias/relu--> --cls matmul-->      logits (offset-0 phase layout)

One grid step per image: Pallas pipelines the whole-image input blocks
HBM->VMEM (x and the big skip plane stream exactly once); ``t`` and ``y``
never touch HBM. Every matmul operand is kept strictly 2-D ``(G*G, K)``
— Mosaic cannot shape-cast through non-sublane-aligned 3-D views (129
rows), so each output tap (a, b) rebuilds its own t-slice from x windows
(the tconv is <2% of the tail's FLOPs; recomputing it 4x is free next to
keeping layouts legal). Matmuls are K-packed (K=128/256) with M=G*G,
bf16 with f32 accumulation — numerically the same contraction XLA's
convs perform. The whole-image working set needs the scoped-VMEM limit
raised (~50 MB at G=128; v5e carries 128 MB physical VMEM).

Semantics match fast_decode._apply_stage_phase + the cls tail of
apply_fast_unet_head (parity-tested in tests/test_pallas_decode.py
against the flax path). Reference geometry: tiseg/models/heads/unet_head.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _flat(v):
    """(R, C, ch) window -> (R*C, ch)."""
    R, C, ch = v.shape
    return v.reshape(R * C, ch)


def _phase(width, sel):
    """(1, width) bool mask of phase channels (layout (py, px, f))."""
    F = width // 4
    ph = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) // F
    return sel(ph // 2, ph % 2)


def _kernel(Wt_ref, bt_ref, Wct_ref, Wcs_ref, bc_ref, Wcls_ref, bcls_ref,
            x_ref, z_ref, out_ref, *, G, dtype):
    xv = x_ref[0]     # (G+2, G+2, Cx)   x padded by 1
    zv = z_ref[0]     # (G+1, G+1, Cs4)  offm1 phase skip
    M = G * G
    F4t = Wt_ref.shape[-1]
    mrow = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // G   # block row u-a
    mcol = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) % G    # block col v-b

    # ---- per-tap t slices: t[a+i, b+j] for (i, j) in G x G ---------------
    # t[u, v] = relu(sum_{a', b'} x_pad[u+a', v+b'] @ Wt[(a', b')] + bt)
    # with the offm1 edge mask (fast_decode._mask_edges_flat): phase rows
    # py=0 are dead at absolute block row u=0, py=1 at u=G; same for cols.
    taps = []
    for a in range(2):
        for b in range(2):
            im = jnp.concatenate(
                [_flat(xv[a + a2:a + a2 + G, b + b2:b + b2 + G, :])
                 for a2 in range(2) for b2 in range(2)], axis=-1)
            tv = jax.nn.relu(_dot(im, Wt_ref[...]) +
                             bt_ref[...].astype(jnp.float32)).astype(dtype)
            if a == 0:   # u = i: row 0 is absolute block row 0
                dead = (mrow == 0) & _phase(F4t, lambda py, px: py == 0)
            else:        # u = i + 1: row G-1 is absolute block row G
                dead = (mrow == G - 1) & _phase(F4t, lambda py, px: py == 1)
            if b == 0:
                dead = dead | ((mcol == 0) & _phase(F4t, lambda py, px: px == 0))
            else:
                dead = dead | ((mcol == G - 1) & _phase(F4t, lambda py, px: px == 1))
            taps.append(jnp.where(dead, jnp.zeros((), dtype), tv))
    tcat = jnp.concatenate(taps, axis=-1)        # (M, 4*F4t)

    # ---- y = conv(t) + conv(z1) + bias, relu -----------------------------
    y = _dot(tcat, Wct_ref[...])
    for i, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        y = y + _dot(_flat(zv[a:a + G, b:b + G, :]), Wcs_ref[i])
    y = jax.nn.relu(y + bc_ref[...].astype(jnp.float32)).astype(dtype)

    # ---- classifier (block-diag per phase), phase-layout logits ----------
    z = _dot(y, Wcls_ref[...]) + bcls_ref[...].astype(jnp.float32)
    out_ref[0] = z.astype(dtype)


def _d2s(y, F: int):
    """(B, G, G, (2,2,F)) offset-0 phase layout -> (B, 2G, 2G, F)."""
    B, Hb, Wb, _ = y.shape
    y = y.reshape(B, Hb, Wb, 2, 2, F).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, Hb * 2, Wb * 2, F)


def fused_decode0_cls(x, skip_z, Wt, bt, Wc_t, Wc_s_phase, bc,
                      cls_kernel, cls_bias, dtype=jnp.bfloat16):
    """Run the fused final-stage kernel.

    x: (B, G, G, Cx) decode1 output, standard layout.
    skip_z: (B, G+1, G+1, Cs4) offm1 phase skip (PhaseSkip.z).
    Weights as produced by fast_decode.build_fast_unet_head_params for a
    phase stage, plus the raw cls 1x1 kernel (1, 1, F, nc) and bias (nc,).
    Returns logits (B, 2G, 2G, nc) identical to the XLA phase path.
    """
    B, G, _, Cx = x.shape
    Cs4 = skip_z.shape[-1]
    F4t = Wt.shape[-1]            # tconv output (phase) channels, 4*F_t
    F4c = Wc_t.shape[-1]          # decode conv output (phase) channels, 4*F_c
    nc = cls_kernel.shape[-1]

    x_pad = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # weight prep (trace-time constants)
    Wt_m = Wt.astype(dtype).reshape(4 * Cx, F4t)
    Wct_m = Wc_t.astype(dtype).reshape(4 * F4t, F4c)
    Wcs_m = jnp.stack([Wc_s_phase[a, b].astype(dtype)
                       for a in range(2) for b in range(2)])  # (4, Cs4, F4c)
    wk = cls_kernel[0, 0].astype(dtype)  # (F_c, nc)
    Wcls = jax.scipy.linalg.block_diag(*([wk] * 4)).astype(dtype)  # (4F_c, 4nc)
    bcls = jnp.tile(cls_bias.astype(dtype), 4)

    out = pl.pallas_call(
        partial(_kernel, G=G, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((B, G * G, 4 * nc), dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7 + [
            pl.BlockSpec((1, G + 2, G + 2, Cx), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G + 1, G + 1, Cs4), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G * G, 4 * nc), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(Wt_m, jnp.asarray(bt, dtype), Wct_m, Wcs_m, jnp.asarray(bc, dtype),
      Wcls, bcls, x_pad, skip_z.astype(dtype))
    return _d2s(out.reshape(B, G, G, 4 * nc), nc)
