"""Segmented row/column-sweep Pallas kernels for instance post-processing.

The round-1 kernels (tiseg_tpu.ops.pallas_postproc) propagate labels one
pixel per round: fill-holes needs H+W rounds and CCL ``ccl_rounds`` (128)
rounds, which dominated end-to-end eval time. These kernels replace
per-pixel rounds with **segmented scans**: one sweep propagates min-labels
across an entire contiguous run of a row (or column) in O(log W) vector
steps (log-doubling guarded by run lengths), so one row+column sweep
iteration covers arbitrary straight-line distance. Convergence needs one
iteration per *bend* of a component's geodesic — a handful for nuclei and
even large snaky glands — instead of one round per *pixel* of its
diameter. Everything (fill holes -> 4-conn CCL -> remove-small -> 8-conn
CCL -> disk dilation, per class) runs in ONE kernel per image, entirely in
VMEM.

Reference semantics: tiseg/models/segmentors/unet.py:71-93 (fill_holes,
remove_small_objects(5) [4-conn], measure.label [8-conn], dilation(disk)).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


# trace-time switch: the sweep algorithm is pure jnp except for the roll
# primitive; with _FORCE_JNP_ROLL the same helpers build an XLA (HBM-
# resident) program usable for planes beyond the VMEM working set.
_FORCE_JNP_ROLL = False


class _jnp_rolls:
    def __enter__(self):
        global _FORCE_JNP_ROLL
        self._old = _FORCE_JNP_ROLL
        _FORCE_JNP_ROLL = True

    def __exit__(self, *a):
        global _FORCE_JNP_ROLL
        _FORCE_JNP_ROLL = self._old


def _log2_steps(n: int):
    """Powers of two < n: the jump schedule for log-doubling."""
    steps, c = [], 1
    while c < n:
        steps.append(c)
        c *= 2
    return steps


def _roll(x, k: int, axis: int):
    """Circular shift so result[i] = x[i-k] (k may be negative)."""
    n = x.shape[axis]
    if _interpret() or _FORCE_JNP_ROLL:
        return jnp.roll(x, k, axis=axis)
    return pltpu.roll(x, k % n, axis=axis)  # mosaic roll needs shift >= 0


def _shift(x, k: int, axis: int, fill):
    """x shifted so result[i] = x[i-k] (k may be negative), edges filled."""
    n = x.shape[axis]
    y = _roll(x, k, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if k >= 0:
        return jnp.where(idx < k, fill, y)
    return jnp.where(idx >= n + k, fill, y)


def _runlen(mask, axis: int, backward: bool = False):
    """L[i] = number of consecutive true pixels ending at i along axis
    (starting at i, if backward), capped at the axis length. int32: run
    lengths would fit int16, but Mosaic's vector rotate (tpu.dynamic_rotate)
    only lowers for 32-bit elements — int16/int8/bool rolls fail to
    compile (probed on v5e), so narrow planes buy nothing here."""
    n = mask.shape[axis]
    L = mask.astype(jnp.int32)
    for c in _log2_steps(n):
        Ls = _shift(L, -c if backward else c, axis, jnp.int32(0))
        L = L + jnp.where(L == c, Ls, 0)
    return L


def _guards(L, axis_n: int):
    """Precomputed (L > c) masks for the log-doubling schedule. Hoisting
    them out of the sweep while_loop (closure constants) saves recomputing
    the compare every sweep iteration."""
    return tuple(L > c for c in _log2_steps(axis_n))


def _seg_run_min(v, g_fwd, g_bwd, axis: int):
    """Min over each contiguous run (segmented total min) along axis.

    Two guarded log-doubling passes: a forward prefix-min (window growth
    stays inside the run because every contribution was itself guarded),
    then a backward pass over the prefix results spreads the run minimum
    to every member.

    ``g_fwd``/``g_bwd``: (L > c) guard masks from :func:`_guards`. The
    rolls are UNMASKED circular rolls: a guarded position is >= c pixels
    inside its run, and runs never cross the image edge, so a wrapped
    value can never be taken — the edge fill would be dead work.
    """
    n = v.shape[axis]
    for g, c in zip(g_fwd, _log2_steps(n)):
        v = jnp.where(g, jnp.minimum(v, _roll(v, c, axis)), v)
    for g, c in zip(g_bwd, _log2_steps(n)):
        v = jnp.where(g, jnp.minimum(v, _roll(v, -c, axis)), v)
    return v


def _shift2d(x, dy: int, dx: int, fill):
    y = x
    if dy:
        y = _shift(y, dy, 0, fill)
    if dx:
        y = _shift(y, dx, 1, fill)
    return y


_DIAGS = ((1, 1), (1, -1), (-1, 1), (-1, -1))


def _ccl_in_kernel(mask, sweeps: int, connectivity: int, seed=None, runlens=None, same=None, big=None):
    """Min-index connected-component labels of a boolean (H, W) plane.

    Exact when ``sweeps`` >= the number of row/col direction changes (plus
    diagonal links for connectivity=2) on some minimal path from each
    pixel to its component's min-index pixel. The sweep loop exits as soon
    as a full sweep changes nothing (fixpoint reached): typical nuclei
    converge in 2-3 sweeps, so the cap is a worst-case bound, not the cost.

    ``seed``: optional initial labels (foreground pixels only; anything
    constant per 4-connected run works). Seeding the 8-conn pass with the
    already-converged 4-conn labels makes it converge in ~1 sweep (the
    remaining work is only merging 4-components across diagonal links).

    ``runlens``: optional precomputed (Lr_f, Lr_b, Lc_f, Lc_b) for this
    mask, saving the 4 log-doubling passes (~30% of a CCL call).

    ``same``: optional int plane defining run identity (class-vectorized
    mode): diagonal links only join pixels with equal ``same`` values (the
    row/col scans already respect it when class-aware runlens are passed).
    ``big`` overrides the sentinel when seeds exceed H*W (class offsets).
    """
    H, W = mask.shape
    big = jnp.int32(H * W + 2 if big is None else big)
    if runlens is not None:
        Lr_f, Lr_b, Lc_f, Lc_b = runlens
    else:
        Lr_f = _runlen(mask, 1)
        Lr_b = _runlen(mask, 1, backward=True)
        Lc_f = _runlen(mask, 0)
        Lc_b = _runlen(mask, 0, backward=True)
    gr_f, gr_b = _guards(Lr_f, W), _guards(Lr_b, W)
    gc_f, gc_b = _guards(Lc_f, H), _guards(Lc_b, H)
    if seed is None:
        seed = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W +
                jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) + 1)
    labels = jnp.where(mask, seed, big)

    def sweep(labels):
        labels = _seg_run_min(labels, gr_f, gr_b, 1)
        labels = _seg_run_min(labels, gc_f, gc_b, 0)
        if connectivity == 2:
            acc = labels
            for dy, dx in _DIAGS:
                sh = _shift2d(labels, dy, dx, big)
                if same is not None:
                    sh = jnp.where(_shift2d(same, dy, dx, jnp.int32(-1)) == same, sh, big)
                acc = jnp.minimum(acc, sh)
            labels = jnp.where(mask, acc, big)
        return labels

    def cond(carry):
        i, _, changed = carry
        return (i < sweeps) & changed

    def body(carry):
        i, labels, _ = carry
        new = sweep(labels)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), labels, jnp.bool_(True)))
    return jnp.where(mask, labels, 0)


def _fill_holes_in_kernel(mask, sweeps: int):
    """Fill background regions not connected (4-conn) to the border.

    A reachability flood would only need booleans, but Mosaic's vector
    rotate is int32-only (see _runlen), so the flood propagates a 0/big
    int32 plane through the same _seg_run_min machinery as the CCLs —
    measured equal-or-faster than an int32-encoded OR flood on v5e."""
    H, W = mask.shape
    big = jnp.int32(H * W + 2)
    bg = ~mask
    Lr_f = _runlen(bg, 1)
    Lr_b = _runlen(bg, 1, backward=True)
    Lc_f = _runlen(bg, 0)
    Lc_b = _runlen(bg, 0, backward=True)
    gr_f, gr_b = _guards(Lr_f, W), _guards(Lr_b, W)
    gc_f, gc_b = _guards(Lc_f, H), _guards(Lc_b, H)
    ri = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = (ri == 0) | (ri == H - 1) | (ci == 0) | (ci == W - 1)
    v = jnp.where(bg & border, jnp.int32(0), big)

    def cond(carry):
        i, _, changed = carry
        return (i < sweeps) & changed

    def body(carry):
        i, v, _ = carry
        new = _seg_run_min(v, gr_f, gr_b, 1)
        new = _seg_run_min(new, gc_f, gc_b, 0)
        return i + 1, new, jnp.any(new != v)

    _, v, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), v, jnp.bool_(True)))
    return mask | (bg & (v >= big))


def _roll_dyn(x, shift, axis: int):
    """Circular roll by a (possibly traced) non-negative shift."""
    if _interpret() or _FORCE_JNP_ROLL:
        return jnp.roll(x, shift, axis=axis)
    return pltpu.roll(x, shift, axis=axis)


def _big_component_mask_in_kernel(labels, min_size: int):
    """True where the pixel's 4-conn component has >= min_size pixels: the
    4-conn BFS ball of graph radius (min_size-1) around any member holds
    >= min(|C|, min_size) component pixels and lies inside the L1 diamond
    of that radius, so an exact same-label count over the diamond decides
    keep/drop — no (H*W+1)-bin bincount. The diamond is walked with
    fori_loops + dynamic rolls (an unrolled window blew the 16MB VMEM
    scoped stack and the compile time at large min_size)."""
    r = min_size - 1
    H, W = labels.shape
    fg = labels > 0
    # UNMASKED circular rolls: a wrapped-in value can only equal the local
    # label if the component spans >= H-2r rows (or W-2r cols) — such a
    # component has far more than min_size pixels and is kept regardless,
    # so edge masking cannot change any keep/drop decision (needs
    # H, W >= 3*min_size - 2; bg pixels self-match at the -1 sentinel but
    # the result is ANDed with fg). Planes too small for that argument take
    # the masked path below: each wrapped-in contribution is zeroed by an
    # explicit source-index validity test, exact at any size.
    masked = min(H, W) < 3 * min_size - 2
    lab = jnp.where(fg, labels, -1)
    if masked:
        ri = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def body_dy(i, cnt):
        dy = i - r
        row = _roll_dyn(lab, jnp.mod(dy, H), axis=0)
        w = r - jnp.abs(dy)
        if masked:
            valid_r = ((ri - dy) >= 0) & ((ri - dy) < H)

        def body_dx(j, cnt):
            dx = j - w
            sh = _roll_dyn(row, jnp.mod(dx, W), axis=1)
            eq = lab == sh
            if masked:
                eq = eq & valid_r & (((ci - dx) >= 0) & ((ci - dx) < W))
            return cnt + eq.astype(jnp.int32)

        return jax.lax.fori_loop(0, 2 * w + 1, body_dx, cnt)

    cnt = jax.lax.fori_loop(0, 2 * r + 1, body_dy, jnp.zeros(labels.shape, jnp.int32))
    return fg & (cnt >= min_size)


def _disk_offsets(radius: int):
    offs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy * dy + dx * dx <= radius * radius and (dy or dx):
                offs.append((dy, dx))
    return tuple(offs)


def _runlen_eq(plane, axis: int, backward: bool = False, fg=None):
    """Run lengths where runs are maximal segments of EQUAL plane values
    (restricted to ``fg``; default: plane > 0). L[i] = pixels from i to its
    run boundary (inclusive), 0 outside fg — the class-aware analog of
    :func:`_runlen` for the vectorized multi-class sweep."""
    fg = plane > 0 if fg is None else fg
    nb = _shift(plane, -1 if backward else 1, axis, jnp.int32(-1))
    nb_fg = _shift(fg.astype(jnp.int32), -1 if backward else 1, axis, jnp.int32(0)) > 0
    conn = fg & nb_fg & (nb == plane)
    R = _runlen(conn, axis, backward=backward)
    return jnp.where(fg, R + 1, 0)


def _seg_run_or(v, g_fwd, g_bwd, axis: int):
    """Bitwise-OR over each equal-value run (the OR analog of
    :func:`_seg_run_min`; same guarded log-doubling argument)."""
    n = v.shape[axis]
    for g, c in zip(g_fwd, _log2_steps(n)):
        v = jnp.where(g, v | _roll(v, c, axis), v)
    for g, c in zip(g_bwd, _log2_steps(n)):
        v = jnp.where(g, v | _roll(v, -c, axis), v)
    return v


def _border_reach_bits(sem, num_classes: int, sweeps: int):
    """reach[p] bit (c-1) set <=> p is 4-conn reachable from the image
    border via pixels that are NOT class c (p included). ~bit(c-1) then
    marks class-c holes for ALL classes in one int32 flood: within-run OR
    scans (runs = equal-sem segments, background included) plus 1-pixel
    hops across run boundaries each sweep, to the monotone fixpoint."""
    H, W = sem.shape
    full = jnp.int32((1 << (num_classes - 1)) - 1)
    allowed = jnp.where(sem > 0, full & ~(jnp.int32(1) << jnp.maximum(sem - 1, 0)), full)
    ones = jnp.ones((H, W), bool)
    rl = (_runlen_eq(sem, 1, fg=ones), _runlen_eq(sem, 1, backward=True, fg=ones),
          _runlen_eq(sem, 0, fg=ones), _runlen_eq(sem, 0, backward=True, fg=ones))
    gr_f, gr_b = _guards(rl[0], W), _guards(rl[1], W)
    gc_f, gc_b = _guards(rl[2], H), _guards(rl[3], H)
    ri = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = (ri == 0) | (ri == H - 1) | (ci == 0) | (ci == W - 1)
    v = jnp.where(border, allowed, jnp.int32(0))

    def cond(carry):
        i, _, changed = carry
        return (i < sweeps) & changed

    def body(carry):
        i, v, _ = carry
        nv = allowed & _seg_run_or(v, gr_f, gr_b, 1)
        nv = allowed & _seg_run_or(nv, gc_f, gc_b, 0)
        acc = nv
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            acc = acc | _shift2d(nv, dy, dx, jnp.int32(0))
        nv = nv | (allowed & acc)
        return i + 1, nv, jnp.any(nv != v)

    _, v, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), v, jnp.bool_(True)))
    return v


def _multiclass_pp_plane(sem, *, num_classes, radius, min_size, sweeps, fill_sweeps):
    """Class-VECTORIZED instance pipeline: one bitmask flood fills every
    class's holes at once; class-offset seeds + class-aware runs let a
    single CCL -> size-filter -> CCL -> dilation pass cover all classes
    (cross-class conflicts resolve to the higher class automatically, the
    same resolution the per-class loop's ascending overwrite produces).

    Exactness caveat vs the per-class loop: when one class's filled hole
    region is disconnected from its source component by ANOTHER class's
    overlapping fill (nested multi-class enclosures), component splits can
    differ. Argmax semantic maps don't produce such nestings; the
    per-class path remains available via multiclass_vectorized=False.
    """
    H, W = sem.shape
    reach = _border_reach_bits(sem, num_classes, fill_sweeps)
    filled_sem = jnp.zeros((H, W), jnp.int32)
    for c in range(1, num_classes):  # ascending: highest class wins overlaps
        filled = (sem == c) | (((reach >> (c - 1)) & 1) == 0)
        filled_sem = jnp.where(filled, jnp.int32(c), filled_sem)
    fg = filled_sem > 0
    big = (num_classes - 1) * H * W + 2
    rl = (_runlen_eq(filled_sem, 1), _runlen_eq(filled_sem, 1, backward=True),
          _runlen_eq(filled_sem, 0), _runlen_eq(filled_sem, 0, backward=True))
    ri = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    seed = ri * W + ci + 1 + jnp.maximum(filled_sem - 1, 0) * (H * W)
    cc4 = _ccl_in_kernel(fg, sweeps, 1, seed=seed, runlens=rl, big=big)
    mask = fg & _big_component_mask_in_kernel(cc4, min_size)
    rl = tuple(jnp.where(mask, L, 0) for L in rl)
    inst0 = _ccl_in_kernel(mask, sweeps, 2, seed=cc4, runlens=rl, same=filled_sem, big=big)
    inst = inst0
    for dy, dx in _disk_offsets(radius):
        inst = jnp.maximum(inst, _shift2d(inst0, dy, dx, jnp.int32(0)))
    sem_out = jnp.where(inst > 0, (inst - 1) // (H * W) + 1, 0)
    return sem_out, inst


def _instance_pp_plane(sem, *, num_classes, radius, min_size, sweeps, fill_sweeps):
    """The full per-plane pipeline; used both inside the fused kernel and
    (with jnp rolls) as a plain XLA program for large planes."""
    H, W = sem.shape
    inst_out = jnp.zeros((H, W), jnp.int32)
    sem_out = jnp.zeros((H, W), jnp.int32)
    offs = _disk_offsets(radius)
    for sem_id in range(1, num_classes):
        mask = sem == sem_id
        mask = _fill_holes_in_kernel(mask, fill_sweeps)
        rl = (_runlen(mask, 1), _runlen(mask, 1, backward=True),
              _runlen(mask, 0), _runlen(mask, 0, backward=True))
        cc4 = _ccl_in_kernel(mask, sweeps, connectivity=1, runlens=rl)
        mask = mask & _big_component_mask_in_kernel(cc4, min_size)
        # the size filter drops whole 4-components, so (a) the surviving cc4
        # labels are still min-per-4-component: a valid (near-converged)
        # seed for the 8-conn pass, and (b) every row/col run is kept or
        # dropped atomically (a run is 4-connected): the filtered mask's
        # run lengths are the unfiltered ones, zeroed at dropped pixels
        rl = tuple(jnp.where(mask, L, 0) for L in rl)
        inst0 = _ccl_in_kernel(mask, sweeps, connectivity=2, seed=cc4, runlens=rl)
        inst = inst0
        for dy, dx in offs:
            inst = jnp.maximum(inst, _shift2d(inst0, dy, dx, jnp.int32(0)))
        inst_shifted = jnp.where(inst > 0, inst + (sem_id - 1) * H * W, 0)
        inst_out = jnp.where(inst_shifted > 0, inst_shifted, inst_out)
        sem_out = jnp.where(inst_shifted > 0, jnp.int32(sem_id), sem_out)
    return sem_out, inst_out


def _fused_pp_xla(sem, plane_fn=None, **kw):
    return (plane_fn or _instance_pp_plane)(sem, **kw)


def _fused_pp_kernel(sem_ref, sem_out_ref, inst_out_ref, *, plane_fn, **kw):
    sem_out, inst_out = plane_fn(sem_ref[0], **kw)
    sem_out_ref[0] = sem_out
    inst_out_ref[0] = inst_out


# fused-kernel working set is ~7 int32 planes; beyond this the same sweep
# algorithm runs as a pure-XLA (HBM-resident) program instead
MAX_VMEM_PLANE_SWEEP = 512 * 512


@partial(jax.jit, static_argnames=('radius', 'min_size', 'num_classes', 'sweeps', 'fill_sweeps',
                                   'multiclass_vectorized'))
def instance_postprocess_sweep(sem_pred: jnp.ndarray, radius: int = 1, min_size: int = 5,
                               num_classes: int = 2, sweeps: int = 8, fill_sweeps: int = 32,
                               multiclass_vectorized: bool = True):
    """UNet-family instance recovery, one fused sweep kernel per image.

    Semantics match tiseg_tpu.ops.ccl.instance_postprocess_device (and the
    reference's scipy/skimage pipeline, unet.py:71-93). Exact when every
    component geodesic has <= ``sweeps`` bends/diagonal links and every
    background hole path to the border has <= ``fill_sweeps`` bends; the
    counts are worst-case caps — each sweep loop exits at its fixpoint
    (typically 2-3 sweeps on nuclei, ~1 for the cc4-seeded 8-conn pass),
    so raising a cap only costs when a plane genuinely needs the depth.
    fill_sweeps defaults high (32): a trained net's prediction produces
    tortuous background channels that a cap of 4 mis-fills (2 px on 1 of
    16 MoNuSeg-density planes, -0.6% throughput to get exact 16/16 —
    docs/ROUND3.md headline reconciliation).
    Returns (sem uint8, inst int32); accepts (H, W) or (B, H, W).

    Planes larger than the VMEM working set (e.g. 1000x1000 whole-image
    MoNuSeg eval) run the identical algorithm as an XLA program with
    HBM-resident planes — same exactness contract, no 512^2 cap.

    ``multiclass_vectorized``: with num_classes > 2 run the single-pass
    class-vectorized pipeline (one bitmask hole flood + one class-offset
    CCL chain) instead of the (num_classes-1)-iteration per-class loop —
    the CoNIC 7-class post-proc cost then no longer scales with the class
    count (see _multiclass_pp_plane for the nested-enclosure caveat).
    """
    squeeze = sem_pred.ndim == 2
    if squeeze:
        sem_pred = sem_pred[None]
    B, H, W = sem_pred.shape
    plane_fn = _multiclass_pp_plane if (num_classes > 2 and multiclass_vectorized) else _instance_pp_plane
    if H * W > MAX_VMEM_PLANE_SWEEP:
        with _jnp_rolls():
            sem_out, inst_out = jax.vmap(
                lambda s: _fused_pp_xla(s, plane_fn=plane_fn, num_classes=num_classes, radius=radius,
                                        min_size=min_size, sweeps=sweeps,
                                        fill_sweeps=fill_sweeps))(sem_pred.astype(jnp.int32))
        sem_out = sem_out.astype(jnp.uint8)
        return (sem_out[0], inst_out[0]) if squeeze else (sem_out, inst_out)
    sem_out, inst_out = pl.pallas_call(
        partial(_fused_pp_kernel, plane_fn=plane_fn, num_classes=num_classes, radius=radius,
                min_size=min_size, sweeps=sweeps, fill_sweeps=fill_sweeps),
        out_shape=(jax.ShapeDtypeStruct((B, H, W), jnp.int32),
                   jax.ShapeDtypeStruct((B, H, W), jnp.int32)),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(sem_pred.astype(jnp.int32))
    sem_out = sem_out.astype(jnp.uint8)
    if squeeze:
        return sem_out[0], inst_out[0]
    return sem_out, inst_out


def _align_foreground_in_kernel(pred, fg, time: int):
    """Expand labeled ``pred`` into unclaimed ``fg`` pixels for up to
    ``time - 1`` simultaneous 8-neighborhood waves (max-id tie-break) —
    the device twin of models.utils.postprocess.align_foreground
    (reference tiseg/models/utils/postprocess.py:123-155). Early-exits at
    the fixpoint."""
    offs = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if dy or dx)

    def cond(carry):
        i, _, changed = carry
        return (i < time - 1) & changed

    def body(carry):
        i, p, _ = carry
        grown = p
        for dy, dx in offs:
            grown = jnp.maximum(grown, _shift2d(p, dy, dx, jnp.int32(0)))
        new = jnp.where((p == 0) & fg & (grown > 0), grown, p)
        return i + 1, new, jnp.any(new != p)

    _, pred, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), pred, jnp.bool_(True)))
    return pred


def _mt_pp_plane(sem, seed, *, num_classes, min_size, sweeps, fill_sweeps, align_time):
    """Multi-task instance recovery per plane (reference multi_task_unet.py
    :83-105): per-class remove-small(min_size) + fill-holes into a semantic
    canvas, 4-conn CCL of the seed map, bounded align_foreground expansion
    of the seed labels into the canvas foreground."""
    H, W = sem.shape
    sem_out = jnp.zeros((H, W), jnp.int32)
    for sem_id in range(1, num_classes):
        mask = sem == sem_id
        cc4 = _ccl_in_kernel(mask, sweeps, connectivity=1)
        mask = mask & _big_component_mask_in_kernel(cc4, min_size)
        mask = _fill_holes_in_kernel(mask, fill_sweeps)
        sem_out = jnp.where(mask, jnp.int32(sem_id), sem_out)
    seed_labels = _ccl_in_kernel(seed > 0, sweeps, connectivity=1)
    inst = _align_foreground_in_kernel(seed_labels, sem_out > 0, align_time)
    return sem_out, inst


def _mt_pp_kernel(sem_ref, seed_ref, sem_out_ref, inst_out_ref, **kw):
    sem_out, inst_out = _mt_pp_plane(sem_ref[0], seed_ref[0], **kw)
    sem_out_ref[0] = sem_out
    inst_out_ref[0] = inst_out


@partial(jax.jit, static_argnames=('num_classes', 'min_size', 'sweeps', 'fill_sweeps', 'align_time'))
def mt_instance_postprocess_sweep(sem_pred: jnp.ndarray, seed_mask: jnp.ndarray,
                                  num_classes: int = 2, min_size: int = 5, sweeps: int = 8,
                                  fill_sweeps: int = 32, align_time: int = 20):
    """Multi-task (seed + canvas) instance recovery, one fused sweep kernel
    per image; (H, W) or (B, H, W) inputs. Large planes take the identical
    XLA (HBM-resident) program. Returns (sem uint8, inst int32)."""
    squeeze = sem_pred.ndim == 2
    if squeeze:
        sem_pred, seed_mask = sem_pred[None], seed_mask[None]
    B, H, W = sem_pred.shape
    kw = dict(num_classes=num_classes, min_size=min_size, sweeps=sweeps,
              fill_sweeps=fill_sweeps, align_time=align_time)
    if H * W > MAX_VMEM_PLANE_SWEEP:
        with _jnp_rolls():
            sem_out, inst_out = jax.vmap(lambda s, d: _mt_pp_plane(s, d, **kw))(
                sem_pred.astype(jnp.int32), seed_mask.astype(jnp.int32))
    else:
        sem_out, inst_out = pl.pallas_call(
            partial(_mt_pp_kernel, **kw),
            out_shape=(jax.ShapeDtypeStruct((B, H, W), jnp.int32),
                       jax.ShapeDtypeStruct((B, H, W), jnp.int32)),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)),
            interpret=_interpret(),
        )(sem_pred.astype(jnp.int32), seed_mask.astype(jnp.int32))
    sem_out = sem_out.astype(jnp.uint8)
    return (sem_out[0], inst_out[0]) if squeeze else (sem_out, inst_out)


@partial(jax.jit, static_argnames=('min_size', 'connectivity', 'sweeps'))
def ccl_filter_sweep(mask: jnp.ndarray, min_size: int = 10, connectivity: int = 1,
                     sweeps: int = 8) -> jnp.ndarray:
    """CCL + remove-small fused in one kernel: min-index labels with
    components < min_size zeroed (the exact local-window count replaces
    the (H*W+1)-bin bincount+gather that dominated the HoVer-Net device
    post-processing, VERDICT round-1 weak #4)."""
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    B, H, W = mask.shape
    labels = ccl_sweep(mask, connectivity=connectivity, sweeps=sweeps)

    # separate kernel: the CCL working set (4 runlen planes + labels) and
    # the window-count working set together exceed the 16MB VMEM scoped
    # stack at 256^2; split, they don't
    def kern(l_ref, out_ref):
        labels = l_ref[0]
        keep = _big_component_mask_in_kernel(labels, min_size)
        out_ref[0] = jnp.where(keep, labels, 0)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(labels)
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=('connectivity', 'sweeps'))
def ccl_sweep(mask: jnp.ndarray, connectivity: int = 2, sweeps: int = 8) -> jnp.ndarray:
    """Standalone segmented-sweep CCL (min-index labels)."""
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    B, H, W = mask.shape

    def kern(m_ref, out_ref):
        out_ref[0] = _ccl_in_kernel(m_ref[0] > 0, sweeps, connectivity)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(mask.astype(jnp.int32))
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=('sweeps',))
def fill_holes_sweep(mask: jnp.ndarray, sweeps: int = 32) -> jnp.ndarray:
    """Standalone segmented-sweep hole filling."""
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    B, H, W = mask.shape

    def kern(m_ref, out_ref):
        out_ref[0] = _fill_holes_in_kernel(m_ref[0] > 0, sweeps).astype(jnp.int32)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(mask.astype(jnp.int32))
    return (out[0] if squeeze else out) > 0
