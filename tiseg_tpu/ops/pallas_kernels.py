"""Pallas TPU kernels for the post-processing hot loops.

The 3x3 neighborhood min/max is the innermost primitive of on-device CCL
label propagation and morphological dilation/erosion (tiseg_tpu.ops.ccl /
.morph). The XLA path materializes 8 shifted copies per sweep; this kernel
computes the whole stencil in VMEM in one pass (one HBM read + one write
per sweep, VPU-only work). Grid: one program per batch row; each block is
a full (H, W) plane, padded to the (8, 128) f32/i32 tile.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(x_ref, o_ref, *, op, fill):
    x = x_ref[0]
    H, W = x.shape

    # pad once, then every shift is a static slice (scatter-free: Pallas TPU
    # has no scatter lowering)
    padded = jnp.pad(x, ((1, 1), (1, 1)), constant_values=fill)

    acc = x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = op(acc, padded[1 - dy:1 - dy + H, 1 - dx:1 - dx + W])
    o_ref[0] = acc


def _run(x: jnp.ndarray, op, fill, interpret: bool) -> jnp.ndarray:
    interpret = interpret or jax.default_backend() != 'tpu'
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, H, W = x.shape
    out = pl.pallas_call(
        partial(_stencil_kernel, op=op, fill=fill),
        out_shape=jax.ShapeDtypeStruct((B, H, W), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out[0] if squeeze else out


def neighborhood_max_3x3(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """3x3 grayscale dilation (square SE), zero-padded borders ==
    tiseg_tpu.ops.morph.grey_dilation(x, square_offsets(3)) for
    non-negative inputs."""
    fill = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf
    return _run(x, jnp.maximum, fill, interpret)


def neighborhood_min_3x3(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """3x3 grayscale erosion (square SE), high-padded borders."""
    fill = jnp.iinfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.integer) else jnp.inf
    return _run(x, jnp.minimum, fill, interpret)
