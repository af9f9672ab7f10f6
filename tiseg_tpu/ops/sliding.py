"""TPU-native sliding-window ("split") inference and dihedral TTA.

Rebuilds the reference's half-and-half overlap-discard scheme
(tiseg/models/segmentors/base.py:255-302) as a single jit-able program with
**static shapes**: the image is zero-padded onto a patch grid, every window
is a compile-time slice, the network runs over the patch batch via
``lax.map`` (compiled once, chunked to bound memory), and stitching is pure
concatenation of the non-overlapping valid regions — no scatter, no dynamic
shapes, fully fusable by XLA.

Geometry (identical to the reference):
  pad H to H1 with (ws - os) | (H1 - ws), image centered; windows start at
  i = 0, ws-os, 2(ws-os), ...; each window keeps rows [i + os/2, i + ws -
  os/2) except the first (from 0) and last (to H1); finally the centered
  crop back to H x W.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def _pad_amount(size: int, ws: int, os_: int) -> int:
    if size - ws > 0:
        rem = (size - ws) % (ws - os_)
        return (ws - os_) - rem if rem != 0 else 0
    return ws - size


def grid_offsets(size1: int, ws: int, os_: int):
    """Window start offsets along one padded axis."""
    return list(range(0, size1 - os_, ws - os_)) if size1 > ws else [0]


def chunked_apply(fn: Callable, batch: jnp.ndarray, chunk: int):
    """Apply ``fn`` over the leading axis in fixed-size chunks via lax.map
    (one compilation of ``fn``, bounded peak memory)."""
    n = batch.shape[0]
    if n <= chunk:
        return fn(batch)
    n_pad = (-n) % chunk
    if n_pad:
        batch = jnp.concatenate([batch, jnp.zeros((n_pad, *batch.shape[1:]), batch.dtype)], 0)
    chunks = batch.reshape(-1, chunk, *batch.shape[1:])
    out = jax.lax.map(fn, chunks)
    out = jax.tree_util.tree_map(lambda x: x.reshape(-1, *x.shape[2:])[:n], out)
    return out


def _split_extract(img: jnp.ndarray, ws: int, os_: int):
    """Pad onto the window grid and extract every window.

    Returns ``(batch, meta)``: the (P*B, ws, ws, C) patch batch plus the
    geometry needed by :func:`_split_stitch`."""
    B, H, W, C = img.shape
    pad_h = _pad_amount(H, ws, os_)
    pad_w = _pad_amount(W, ws, os_)
    H1, W1 = H + pad_h, W + pad_w
    canvas = jnp.zeros((B, H1, W1, C), img.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, img, (0, pad_h // 2, pad_w // 2, 0))

    i_offs = grid_offsets(H1, ws, os_)
    j_offs = grid_offsets(W1, ws, os_)

    patches = [canvas[:, i:i + ws, j:j + ws, :] for i in i_offs for j in j_offs]
    batch = jnp.concatenate(patches, axis=0)  # (P*B, ws, ws, C)
    meta = (B, H, W, ws, os_, pad_h, pad_w, tuple(i_offs), tuple(j_offs))
    return batch, meta


def _split_stitch(out, meta):
    """Stitch a per-window output pytree back to (B, H, W, K) by keeping each
    window's non-overlapping valid region (half-overlap discard)."""
    B, H, W, ws, os_, pad_h, pad_w, i_offs, j_offs = meta
    H1, W1 = H + pad_h, W + pad_w

    def _valid(offs, size1, idx):
        o = offs[idx]
        s = o + os_ // 2 if idx > 0 else 0
        e = o + ws - os_ // 2 if idx < len(offs) - 1 else size1
        return s - o, e - o  # local (within-window) valid rows

    def stitch(leaf):
        # leaf: (P*B, ws, ws, K) -> (B, H, W, K)
        K = leaf.shape[-1]
        leaf = leaf.reshape(len(i_offs), len(j_offs), B, ws, ws, K)
        rows = []
        for ii in range(len(i_offs)):
            vs_i, ve_i = _valid(i_offs, H1, ii)
            cols = []
            for jj in range(len(j_offs)):
                vs_j, ve_j = _valid(j_offs, W1, jj)
                cols.append(leaf[ii, jj][:, vs_i:ve_i, vs_j:ve_j, :])
            rows.append(jnp.concatenate(cols, axis=2))
        full = jnp.concatenate(rows, axis=1)  # (B, H1, W1, K)
        return full[:, pad_h // 2:pad_h // 2 + H, pad_w // 2:pad_w // 2 + W, :]

    return jax.tree_util.tree_map(stitch, out)


def split_inference(calculate_fn: Callable, img: jnp.ndarray, window: int, overlap: int,
                    chunk: int = 8):
    """Sliding-window forward. ``calculate_fn``: (N, ws, ws, C) -> pytree of
    (N, ws, ws, K). Returns the same pytree stitched to (B, H, W, K).

    The network output passes through ``optimization_barrier`` before the
    stitch: without it XLA fuses the 25 per-window stitch slices into the
    decoder tail and re-materialises it per consumer (measured 27.4 ->
    13.0 ms for one 1000^2 view on v5e — docs/ROUND3.md)."""
    batch, meta = _split_extract(img, window, overlap)
    out = chunked_apply(lambda p: jax.lax.optimization_barrier(calculate_fn(p)), batch, chunk)
    return _split_stitch(out, meta)


def tta_forward_views(calculate_fn: Callable, img: jnp.ndarray, views, mode: str,
                      window: int = 0, overlap: int = 0, chunk: int = 8):
    """Forward every dihedral TTA view, returning one output pytree per view
    (still in view orientation — the caller reverses and fuses).

    In split mode ALL views' sliding-window patches are extracted first and
    run through ONE chunked forward, so the network executes at the large-
    batch sweet spot instead of one small batch per view (v5e, 1000^2
    MoNuSeg protocol: 8 x 25-patch forwards = 219 ms vs 200 patches at
    chunk 100 = 76 ms — docs/ROUND3.md). Rebuilds the reference's
    per-view patch loop (tiseg/models/segmentors/base.py:255-302)."""
    if mode != 'split':
        return [calculate_fn(tta_transform(img, rot, flip)) for rot, flip in views]
    extracted = []
    for rot, flip in views:
        v = tta_transform(img, rot, flip)
        extracted.append(_split_extract(v, window, overlap))
    big = jnp.concatenate([b for b, _ in extracted], axis=0)
    out = chunked_apply(lambda p: jax.lax.optimization_barrier(calculate_fn(p)), big, chunk)
    results, ofs = [], 0
    for batch, meta in extracted:
        n = batch.shape[0]
        out_v = jax.tree_util.tree_map(lambda x: x[ofs:ofs + n], out)
        ofs += n
        results.append(_split_stitch(out_v, meta))
    return results


# ---------------------------------------------------------------------------
# dihedral TTA (reference base.py:304-381)
# ---------------------------------------------------------------------------
def tta_transform(x: jnp.ndarray, rotate_degree: int, flip_direction: str) -> jnp.ndarray:
    """Forward TTA view of an NHWC array: rot90 k times then flip."""
    k = (rotate_degree // 90) % 4
    x = jnp.rot90(x, k=k, axes=(1, 2))
    if flip_direction == 'horizontal':
        x = jnp.flip(x, axis=2)
    elif flip_direction == 'vertical':
        x = jnp.flip(x, axis=1)
    elif flip_direction == 'diagonal':
        x = jnp.flip(x, axis=(1, 2))
    return x


def reverse_tta_transform(x: jnp.ndarray, rotate_degree: int, flip_direction: str) -> jnp.ndarray:
    k = 4 - (rotate_degree // 90) % 4
    if flip_direction == 'horizontal':
        x = jnp.flip(x, axis=2)
    elif flip_direction == 'vertical':
        x = jnp.flip(x, axis=1)
    elif flip_direction == 'diagonal':
        x = jnp.flip(x, axis=(1, 2))
    return jnp.rot90(x, k=k, axes=(1, 2))


def tta_views(test_cfg) -> Sequence[Tuple[int, str]]:
    degrees = test_cfg.get('rotate_degrees', [0])
    flips = test_cfg.get('flip_directions', ['none'])
    return [(d, f) for d in degrees for f in flips]


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """align_corners=False bilinear resize of NHWC (matches the reference's
    F.interpolate via half-pixel centers; tiseg/utils/interpolate.py:7).
    antialias=False: torch's bilinear samples points when downscaling."""
    B, H, W, K = x.shape
    if (H, W) == tuple(out_hw):
        return x
    return jax.image.resize(x, (B, out_hw[0], out_hw[1], K), method='linear', antialias=False)
