"""On-device DIST dynamic watershed (jnp, jit-able).

TPU twin of the host pipeline (tiseg_tpu.models.utils.postprocess.
dynamic_watershed; reference dist.py:31-129): invert the distance map,
optional H-minima suppression via reconstruction-by-erosion, regional-
minima markers, marker watershed, watershed-line removal.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ccl import connected_components
from .morph import _shift2d, grey_erosion, square_offsets
from .watershed import watershed

SQ3 = square_offsets(3)


def reconstruction_by_erosion(seed: jnp.ndarray, mask: jnp.ndarray, max_iters: int = 256) -> jnp.ndarray:
    """Fixed point of rec <- max(erosion3x3(rec), mask), rec0 = seed
    (requires seed >= mask)."""

    def cond(state):
        rec, changed, i = state
        return changed & (i < max_iters)

    def body(state):
        rec, _, i = state
        nxt = jnp.maximum(grey_erosion(rec, SQ3), mask)
        return nxt, jnp.any(nxt != rec), i + 1

    rec, _, _ = jax.lax.while_loop(cond, body, (seed.astype(jnp.float32), jnp.array(True), jnp.int32(0)))
    return rec


@partial(jax.jit, static_argnames=('lamb', 'p_thresh', 'num_levels'))
def dynamic_watershed_device(p_img: jnp.ndarray, lamb: float = 0.0, p_thresh: float = 0.5,
                             num_levels: int = 64) -> jnp.ndarray:
    """(H, W) distance/prob image (values ~[0, 255]) -> int32 instances."""
    b_img = p_img > p_thresh
    probs_inv = (255.0 - jnp.clip(p_img.astype(jnp.float32), 0, 255))

    if lamb > 0:  # lamb is a static config value (reference uses 0.0)
        hrecons = reconstruction_by_erosion(jnp.minimum(255.0, probs_inv + lamb), probs_inv)
    else:
        hrecons = probs_inv

    # regional minima: reconstruction of (x + 1) minus x is > 0 at minima
    rec1 = reconstruction_by_erosion(jnp.minimum(255.0, hrecons + 1.0), hrecons)
    maxima = (rec1 - hrecons) > 0
    maxima = maxima & b_img

    markers = connected_components(maxima, connectivity=2)
    ws = watershed(hrecons, markers, mask=b_img, connectivity=1, num_levels=num_levels)

    # watershed line: boundary pixels between distinct labels
    line = jnp.zeros(ws.shape, bool)
    for dy, dx in SQ3:
        if dy == 0 and dx == 0:
            continue
        nb = _shift2d(ws, dy, dx, 0)
        line = line | ((ws > 0) & (nb > 0) & (nb != ws))
    return jnp.where(line, 0, ws)
