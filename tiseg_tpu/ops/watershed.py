"""On-device marker-controlled watershed (jnp, jit-able).

TPU-native replacement for skimage.segmentation.watershed on the eval hot
path (reference call sites: hovernet.py:361, dist.py:124). The classic
algorithm is a priority flood (sequential heap); here it becomes
**watershed by level flooding**: quantize the height map into K static
levels, and at each level let existing labels claim connected unlabeled
pixels of height <= level via scan-based label propagation. Plateau
tie-breaks take the min label where the heap took insertion order — the
resulting basins match skimage up to single-pixel ridge placement.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .morph import _shift2d

EIGHT = ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1))
FOUR = ((1, 0), (-1, 0), (0, 1), (0, -1))


def _propagate_labels(labels: jnp.ndarray, allowed: jnp.ndarray, neigh, rounds: int = None) -> jnp.ndarray:
    """Grow positive labels into ``allowed`` unlabeled pixels by one-pixel
    waves (min-label tie-break at equal wave distance). Single-step waves —
    not long-range scans — preserve the flooding adjacency fairness that
    watershed semantics require (a far basin must not race through a
    same-level corridor)."""
    big = jnp.int32(jnp.iinfo(jnp.int32).max // 2)

    def one_round(lab):
        val = jnp.where(lab > 0, lab, big)
        best = big
        for dy, dx in neigh:
            best = jnp.minimum(best, _shift2d(val, dy, dx, big))
        gate = allowed & (lab == 0)
        return jnp.where(gate & (best < big), best, lab)

    if rounds is not None:
        for _ in range(rounds):
            labels = one_round(labels)
        return labels

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = one_round(lab)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.array(True)))
    return labels


@partial(jax.jit, static_argnames=('connectivity', 'num_levels', 'rounds_per_level'))
def watershed(image: jnp.ndarray, markers: jnp.ndarray, mask: jnp.ndarray = None, connectivity: int = 1,
              num_levels: int = 64, rounds_per_level: int = None) -> jnp.ndarray:
    """(H, W) height map + int markers (+ mask) -> int32 basin labels."""
    H, W = image.shape
    if mask is None:
        mask = jnp.ones((H, W), bool)
    mask = mask.astype(bool)
    neigh = FOUR if connectivity == 1 else EIGHT

    img = image.astype(jnp.float32)
    lo = jnp.min(jnp.where(mask, img, jnp.inf))
    hi = jnp.max(jnp.where(mask, img, -jnp.inf))
    scale = jnp.where(hi > lo, (num_levels - 1) / (hi - lo), 0.0)
    level_map = jnp.clip(jnp.round((img - lo) * scale).astype(jnp.int32), 0, num_levels - 1)

    labels0 = jnp.where(mask, markers.astype(jnp.int32), 0)

    def flood_level(level, labels):
        allowed = mask & (level_map <= level)
        return _propagate_labels(labels, allowed, neigh, rounds=rounds_per_level)

    labels = jax.lax.fori_loop(0, num_levels, flood_level, labels0)
    # cleanup: pixels left unclaimed by bounded per-level waves flood to a
    # fixed point (e.g. long thin basins with rounds_per_level set)
    labels = _propagate_labels(labels, mask, neigh, rounds=None)
    return jnp.where(mask, labels, 0)
