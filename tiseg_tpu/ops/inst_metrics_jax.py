"""On-device AJI / PQ pre-eval (jnp, jit-able).

TPU twin of tiseg_tpu.utils.metrics.inst_metrics (host numpy): builds the
instance contingency table with one bincount and reduces it with dense
O(N^2) matrix ops over a static instance capacity — at <=1k instances per
image this is microseconds on the VPU/MXU (SURVEY.md §7 step 5). Inputs
must already be contiguously labeled (1..N, e.g. from
tiseg_tpu.ops.ccl.label); re-canonicalization stays on the producer side.

The >=0.5 PQ threshold guarantees unique pairing, so no Hungarian solver
is needed on device (reference inst_metrics.py:197-203); the host path
covers match_iou < 0.5.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('max_instances',))
def contingency(inst_pred: jnp.ndarray, inst_gt: jnp.ndarray, max_instances: int = 512) -> jnp.ndarray:
    """counts[g, p] = |G_g ∩ P_p| including background row/col 0; ids are
    clipped at the static capacity."""
    M = max_instances + 1
    g = jnp.clip(inst_gt.reshape(-1).astype(jnp.int32), 0, max_instances)
    p = jnp.clip(inst_pred.reshape(-1).astype(jnp.int32), 0, max_instances)
    flat = g * M + p
    return jnp.bincount(flat, length=M * M).reshape(M, M).astype(jnp.float32)


@partial(jax.jit, static_argnames=('max_instances',))
def pre_eval_bin_aji_device(inst_pred: jnp.ndarray, inst_gt: jnp.ndarray, max_instances: int = 512):
    """(overall_intersection, overall_union) with the reference's union
    bookkeeping (argmax-per-GT pairing with pred reuse, unpaired GT and
    pred areas added to union; zero when either side is empty)."""
    counts = contingency(inst_pred, inst_gt, max_instances)
    gt_areas = counts.sum(axis=1)[1:]
    pred_areas = counts.sum(axis=0)[1:]
    inter = counts[1:, 1:]
    union = gt_areas[:, None] + pred_areas[None, :] - inter
    union = jnp.where(inter > 0, union, 0.0)
    iou = inter / (union + 1e-6)

    gt_exists = gt_areas > 0
    pred_exists = pred_areas > 0

    best_pred = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    paired_gt = (best_iou > 0) & gt_exists

    overall_inter = jnp.sum(jnp.where(paired_gt, inter[jnp.arange(inter.shape[0]), best_pred], 0.0))
    overall_union = jnp.sum(jnp.where(paired_gt, union[jnp.arange(inter.shape[0]), best_pred], 0.0))

    pred_used = jnp.zeros(pred_areas.shape[0], bool).at[best_pred].max(paired_gt)
    overall_union += jnp.sum(jnp.where(gt_exists & ~paired_gt, gt_areas, 0.0))
    overall_union += jnp.sum(jnp.where(pred_exists & ~pred_used, pred_areas, 0.0))

    any_pair = jnp.any(gt_exists) & jnp.any(pred_exists)
    return jnp.where(any_pair, overall_inter, 0.0), jnp.where(any_pair, overall_union, 0.0)


@partial(jax.jit, static_argnames=('max_instances',))
def pre_eval_bin_pq_device(inst_pred: jnp.ndarray, inst_gt: jnp.ndarray, max_instances: int = 512,
                           match_iou: float = 0.5):
    """(tp, fp, fn, sum_paired_iou) for match_iou >= 0.5 (unique pairing)."""
    counts = contingency(inst_pred, inst_gt, max_instances)
    gt_areas = counts.sum(axis=1)[1:]
    pred_areas = counts.sum(axis=0)[1:]
    inter = counts[1:, 1:]
    union = gt_areas[:, None] + pred_areas[None, :] - inter
    iou = jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

    pair = iou > match_iou
    tp = jnp.sum(pair)
    paired_iou = jnp.sum(jnp.where(pair, iou, 0.0))
    n_gt = jnp.sum(gt_areas > 0)
    n_pred = jnp.sum(pred_areas > 0)
    fn = n_gt - jnp.sum(jnp.any(pair, axis=1))
    fp = n_pred - jnp.sum(jnp.any(pair, axis=0))
    return tp.astype(jnp.float32), fp.astype(jnp.float32), fn.astype(jnp.float32), paired_iou


@partial(jax.jit, static_argnames=('num_classes', 'ignore_index'))
def sem_confusion_device(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int,
                         ignore_index: int = 255):
    """Per-class (TP, TN, FP, FN, Pred, GT) histograms — on-device twin of
    pre_eval_all_semantic_metric (before reduce_zero_label). Pixels with
    target == ignore_index are excluded (routed to a dropped overflow
    bucket, matching the host mask)."""
    p = pred.reshape(-1).astype(jnp.int32)
    t = target.reshape(-1).astype(jnp.int32)
    ign = t == ignore_index
    p = jnp.where(ign, num_classes, p)
    t = jnp.where(ign, num_classes, t)
    eq = (p == t) & ~ign
    TP = jnp.bincount(jnp.where(eq, t, num_classes), length=num_classes + 1)[:num_classes].astype(jnp.float32)
    FP = jnp.bincount(jnp.where(~eq, p, num_classes), length=num_classes + 1)[:num_classes].astype(jnp.float32)
    FN = jnp.bincount(jnp.where(~eq, t, num_classes), length=num_classes + 1)[:num_classes].astype(jnp.float32)
    Pred = jnp.bincount(p, length=num_classes).astype(jnp.float32)
    GT = jnp.bincount(t, length=num_classes).astype(jnp.float32)
    TN = Pred.sum() - (TP + FP + FN)
    return TP, TN, FP, FN, Pred, GT


@partial(jax.jit, static_argnames=('max_instances',))
def relabel_sequential_device(inst: jnp.ndarray, max_instances: int = 512) -> jnp.ndarray:
    """Compact arbitrary non-negative labels (e.g. the sweep kernels'
    min-pixel-index ids) to contiguous 1..N with background 0 — the
    on-device twin of re_instance (datasets/utils re_instance). Capacity-
    bounded: beyond max_instances distinct ids, extras alias (same cap as
    the contingency table)."""
    big = jnp.iinfo(jnp.int32).max
    flat = jnp.concatenate([jnp.zeros(1, jnp.int32), inst.reshape(-1).astype(jnp.int32)])
    ids = jnp.unique(flat, size=max_instances + 1, fill_value=big)
    return jnp.searchsorted(ids, inst.astype(jnp.int32)).astype(jnp.int32)


@partial(jax.jit, static_argnames=('num_classes', 'max_instances'))
def pre_eval_all_device(sem_pred: jnp.ndarray, inst_pred: jnp.ndarray, sem_gt: jnp.ndarray,
                        inst_gt: jnp.ndarray, num_classes: int, max_instances: int = 512):
    """One fused program: relabel both instance maps + semantic confusion +
    binary AJI + binary PQ pre-eval — the full CustomDataset.pre_eval
    package computed on device (only small scalars/vectors reach the host)."""
    ip = relabel_sequential_device(inst_pred, max_instances)
    ig = relabel_sequential_device(inst_gt, max_instances)
    sem = sem_confusion_device(sem_pred, sem_gt, num_classes)
    aji = pre_eval_bin_aji_device(ip, ig, max_instances)
    pq = pre_eval_bin_pq_device(ip, ig, max_instances)
    return sem, aji, pq
