"""On-device morphology (jnp, jit-able, static shapes).

TPU-native replacements for the scipy/skimage CPU hot path at eval time
(SURVEY.md §2.1): dilation/erosion as shifted max/min over structuring-
element offsets (XLA fuses these into a handful of VPU passes), flood-fill
based hole filling, and bincount-based small-object removal. All functions
take (H, W) or (B, H, W) arrays and are differentiability-free eval ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def disk_offsets(radius: int):
    offs = [(dy, dx) for dy in range(-radius, radius + 1) for dx in range(-radius, radius + 1)
            if dy * dy + dx * dx <= radius * radius]
    return tuple(offs)


def diamond_offsets(radius: int):
    offs = [(dy, dx) for dy in range(-radius, radius + 1) for dx in range(-radius, radius + 1)
            if abs(dy) + abs(dx) <= radius]
    return tuple(offs)


def square_offsets(width: int):
    r = width // 2
    return tuple((dy, dx) for dy in range(-r, width - r) for dx in range(-r, width - r))


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill):
    """Shift the last two axes by (dy, dx), filling vacated cells."""
    out = jnp.roll(x, (dy, dx), axis=(-2, -1))
    H, W = x.shape[-2], x.shape[-1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = jnp.ones((H, W), bool)
    if dy > 0:
        valid &= row_ids >= dy
    elif dy < 0:
        valid &= row_ids < H + dy
    if dx > 0:
        valid &= col_ids >= dx
    elif dx < 0:
        valid &= col_ids < W + dx
    return jnp.where(valid, out, fill)


def grey_dilation(x: jnp.ndarray, offsets) -> jnp.ndarray:
    """Max over structuring-element shifts (label maps / grayscale)."""
    out = x
    for dy, dx in offsets:
        if dy == 0 and dx == 0:
            continue
        out = jnp.maximum(out, _shift2d(x, dy, dx, _min_value(x.dtype)))
    return out


def grey_erosion(x: jnp.ndarray, offsets) -> jnp.ndarray:
    out = x
    for dy, dx in offsets:
        if dy == 0 and dx == 0:
            continue
        out = jnp.minimum(out, _shift2d(x, dy, dx, _max_value(x.dtype)))
    return out


def _min_value(dtype):
    return jnp.iinfo(dtype).min if jnp.issubdtype(dtype, jnp.integer) else -jnp.inf


def _max_value(dtype):
    return jnp.iinfo(dtype).max if jnp.issubdtype(dtype, jnp.integer) else jnp.inf


def binary_dilation(mask: jnp.ndarray, offsets) -> jnp.ndarray:
    return grey_dilation(mask.astype(jnp.int32), offsets) > 0


def binary_erosion(mask: jnp.ndarray, offsets) -> jnp.ndarray:
    # border treated as foreground (skimage convention)
    inv = ~mask.astype(bool)
    grown = binary_dilation(inv, tuple((-dy, -dx) for dy, dx in offsets))
    return ~grown


def _or_scan(seed: jnp.ndarray, gate: jnp.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
    """Directional reachability: s_j = gate_j & (s_{j-1} | seed_j) scanned
    along ``axis``. The per-element maps f(s) = (s & m) | c compose
    associatively, so this is a log-depth associative_scan — one pass
    propagates reachability an unlimited distance along the axis."""
    axis = axis % gate.ndim  # lax.rev requires nonnegative axes
    m = gate
    c = gate & seed

    def combine(x, y):
        mx, cx = x
        my, cy = y
        return mx & my, (cx & my) | cy

    ms, cs = jax.lax.associative_scan(combine, (m, c), axis=axis, reverse=reverse)
    # applying the composed map to the initial state s0=False yields cs
    return cs


def flood_reachable(seed: jnp.ndarray, gate: jnp.ndarray, max_rounds: int = 16,
                    rounds: int = None) -> jnp.ndarray:
    """4-connected reachability of ``gate`` pixels from ``seed`` via
    alternating directional scans; converges in O(#path turns) rounds.
    rounds=None: fixed-point while_loop (exact, bounded by max_rounds);
    static ``rounds``: unrolled, pipelining-friendly."""
    seed = seed & gate

    def one_round(r):
        for axis, reverse in ((-1, False), (-1, True), (-2, False), (-2, True)):
            r = r | _or_scan(r, gate, axis, reverse)
        return r

    if rounds is not None:
        r = seed
        for _ in range(rounds):
            r = one_round(r)
        return r

    def cond(state):
        reached, changed, i = state
        return changed & (i < max_rounds)

    def body(state):
        reached, _, i = state
        r = one_round(reached)
        return r, jnp.any(r != reached), i + 1

    reached, _, _ = jax.lax.while_loop(cond, body, (seed, jnp.array(True), jnp.int32(0)))
    return reached


def binary_fill_holes(mask: jnp.ndarray, rounds: int = None) -> jnp.ndarray:
    """Holes = background not 4-reachable from the border; filled via
    scan-based on-device flood fill."""
    mask = mask.astype(bool)
    H, W = mask.shape[-2], mask.shape[-1]
    bg = ~mask
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = (row_ids == 0) | (row_ids == H - 1) | (col_ids == 0) | (col_ids == W - 1)
    reached = flood_reachable(bg & border, bg, rounds=rounds)
    return mask | (bg & ~reached)


def remove_small_objects_labeled(labels: jnp.ndarray, min_size: int, max_label: int) -> jnp.ndarray:
    """Zero out labels whose pixel count < min_size. ``max_label`` is the
    static bincount capacity."""
    flat = labels.reshape(-1).astype(jnp.int32)
    sizes = jnp.bincount(flat, length=max_label)
    small = sizes < min_size
    out = jnp.where(small[labels], 0, labels)
    return jnp.where(labels == 0, 0, out)
