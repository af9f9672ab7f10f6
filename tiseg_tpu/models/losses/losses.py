"""Loss zoo (pure-jnp, NHWC logits (B, H, W, C), integer labels (B, H, W)).

TPU-native rebuild of tiseg/models/losses/* (dice_loss.py, cross_entropy_
loss.py, focal_loss.py, hover_loss.py, ac_loss.py, level_set_loss.py,
var_loss.py, topological_loss.py). All functions are jit/grad-compatible:
no data-dependent control flow; per-instance reductions use segment sums
over a static instance-id capacity instead of the reference's python loops.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

SMOOTH = 1e-4


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# cross entropy family
# ---------------------------------------------------------------------------
def cross_entropy(logits, labels, weight=None, class_weight=None, reduction='mean'):
    """Per-pixel softmax CE. ``weight`` is a per-pixel map, ``class_weight``
    a (C,) vector (reference cross_entropy_loss.py:9-33)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if class_weight is not None:
        cw = jnp.asarray(class_weight)[labels]
        nll = nll * cw
    if weight is not None:
        nll = nll * weight
    if reduction == 'mean':
        return jnp.mean(nll)
    if reduction == 'sum':
        return jnp.sum(nll)
    return nll


def binary_cross_entropy(logits, labels, reduction='mean'):
    """Sigmoid BCE with integer labels expanded one-hot over channels."""
    targets = one_hot(labels, logits.shape[-1])
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


def mse_loss(pred, target, reduction='mean'):
    loss = (pred - target)**2
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


# ---------------------------------------------------------------------------
# dice family
# ---------------------------------------------------------------------------
def batch_multiclass_dice_loss(logits, labels, num_classes: int, weights=None):
    """Sum over foreground classes of (1 - batch-pooled dice); softmax probs
    (reference dice_loss.py:64-100)."""
    probs = jax.nn.softmax(logits, axis=-1)
    target = one_hot(labels, num_classes)
    inter = jnp.sum(probs * target, axis=(0, 1, 2))          # (C,)
    denom = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(target, axis=(0, 1, 2))
    dice = (2 * inter + SMOOTH) / (denom + SMOOTH)
    per_class = 1.0 - dice
    if weights is not None:
        per_class = per_class * jnp.asarray(weights)
    return jnp.sum(per_class[1:])


def batch_multiclass_sigmoid_dice_loss(logits, labels, num_classes: int, weights=None):
    probs = jax.nn.sigmoid(logits)
    target = one_hot(labels, num_classes)
    inter = jnp.sum(probs * target, axis=(0, 1, 2))
    denom = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(target, axis=(0, 1, 2))
    dice = (2 * inter + SMOOTH) / (denom + SMOOTH)
    per_class = 1.0 - dice
    if weights is not None:
        per_class = per_class * jnp.asarray(weights)
    return jnp.sum(per_class[1:])


def multiclass_dice_loss(logits, labels, num_classes: int, weights=None):
    """Per-image dice averaged over batch, summed over *all* classes
    (reference dice_loss.py:139-176)."""
    probs = jax.nn.softmax(logits, axis=-1)
    target = one_hot(labels, num_classes)
    inter = jnp.sum(probs * target, axis=(1, 2))             # (B, C)
    denom = jnp.sum(probs, axis=(1, 2)) + jnp.sum(target, axis=(1, 2))
    dice = (2 * inter + SMOOTH) / (denom + SMOOTH)           # (B, C)
    per_class = 1.0 - jnp.sum(dice, axis=0) / logits.shape[0]
    if weights is not None:
        per_class = per_class * jnp.asarray(weights)
    return jnp.sum(per_class)


def generalized_dice_loss(logits, labels, num_classes: int):
    probs = jax.nn.softmax(logits, axis=-1)
    target = one_hot(labels, num_classes)
    inter = jnp.sum(probs * target, axis=(0, 1, 2))
    add = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(target, axis=(0, 1, 2))
    return 1.0 - (2 * jnp.sum(inter) + SMOOTH) / (jnp.sum(add) + SMOOTH)


def dice_loss(logits, labels, num_classes: int):
    probs = jax.nn.softmax(logits, axis=-1)
    target = one_hot(labels, num_classes)
    inter = jnp.sum(probs * target, axis=(0, 1, 2))
    add = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(target, axis=(0, 1, 2))
    return 1.0 - jnp.mean((2 * inter + SMOOTH) / (add + SMOOTH))


# ---------------------------------------------------------------------------
# focal
# ---------------------------------------------------------------------------
def focal_loss(logits, labels, gamma: float = 2.0, class_weight=None, loss_type='softmax', robust: bool = False):
    """Softmax/sigmoid focal loss; ``robust`` clamps the focusing factor to
    [0, 2] (reference focal_loss.py:6-100, RobustFocalLoss2d)."""
    if loss_type == 'softmax':
        probs = jax.nn.softmax(logits, axis=-1)
        p_t = jnp.take_along_axis(probs, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    else:
        prob = jax.nn.sigmoid(logits[..., 0] if logits.ndim == labels.ndim + 1 else logits)
        p_t = jnp.where(labels > 0, prob, 1 - prob)
    p_t = jnp.clip(p_t, 1e-8, 1 - 1e-8)
    focus = (1 - p_t)**gamma
    if robust:
        focus = jnp.clip(focus, 0.0, 2.0)
    w = 1.0
    if class_weight is not None:
        w = jnp.asarray(class_weight)[labels]
    return jnp.mean(-w * focus * jnp.log(p_t))


def one_hot2dist(class_map: 'np.ndarray', num_classes: int):
    """Host-side signed distance maps per class for the surface loss
    (reference surface_loss.py: one_hot2dist): negative inside the class
    region, positive outside."""
    import numpy as np
    from scipy import ndimage
    out = np.zeros((num_classes, *class_map.shape), np.float32)
    for c in range(num_classes):
        pos = class_map == c
        if pos.any():
            neg_d = ndimage.distance_transform_edt(~pos)
            pos_d = ndimage.distance_transform_edt(pos)
            out[c] = neg_d * (~pos) - (pos_d - 1) * pos
    return out


def surface_loss(probs, dist_maps, idc=(1, 2)):
    """Boundary (surface) loss: mean of probs x signed GT distance over the
    selected foreground classes (reference surface_loss.py:80-118).
    probs: (B, H, W, C) simplex; dist_maps: (B, H, W, C) from one_hot2dist.
    """
    sel = jnp.asarray(idc)
    pc = probs[..., sel]
    dc = dist_maps[..., sel]
    return jnp.mean(pc * dc)


# ---------------------------------------------------------------------------
# HoVer gradient MSE (msge)
# ---------------------------------------------------------------------------
def _hv_sobel_kernel(size: int = 5):
    r = jnp.arange(-(size // 2) + 0.0, size // 2 + 1.0)
    h, v = jnp.meshgrid(r, r, indexing='ij')
    kh = h / (h * h + v * v + 1e-15)
    kv = v / (h * h + v * v + 1e-15)
    return kh, kv


def gradient_mse_loss(pred_hv, true_hv, focus):
    """Masked MSE of HV-map gradients (reference hover_loss.py:6-78).

    pred/true: (B, H, W, 2) with [..., 0]=horizontal, [..., 1]=vertical;
    focus: (B, H, W) nuclei mask.
    """
    kh, kv = _hv_sobel_kernel(5)

    def _grad(x, k):
        # (B, H, W) conv with 5x5 kernel, zero pad
        x4 = x[..., None]
        k4 = k[:, :, None, None]
        return jax.lax.conv_general_dilated(x4, k4, (1, 1), 'SAME',
                                            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[..., 0]

    tg = jnp.stack([_grad(true_hv[..., 0], kh), _grad(true_hv[..., 1], kv)], axis=-1)
    pg = jnp.stack([_grad(pred_hv[..., 0], kh), _grad(pred_hv[..., 1], kv)], axis=-1)
    focus2 = jnp.stack([focus, focus], axis=-1).astype(jnp.float32)
    loss = focus2 * (pg - tg)**2
    return jnp.sum(loss) / (jnp.sum(focus2) + 1e-8)


def masked_mse_loss(pred, target, focus):
    focus = focus.astype(jnp.float32)
    if pred.ndim == focus.ndim + 1:
        focus = focus[..., None]
    loss = focus * (pred - target)**2
    return jnp.sum(loss) / (jnp.sum(focus) * (pred.shape[-1] if pred.ndim == focus.ndim + 1 else 1) + 1e-8)


# ---------------------------------------------------------------------------
# active contour / level set / variance / topological
# ---------------------------------------------------------------------------
def active_contour_loss(probs, target, area_weight=1e-6, len_weight=0.0, w_area=False):
    """probs/target: (B, H, W, C) in [0, 1] (reference ac_loss.py:16-61)."""

    def _edges(x):
        dr = (x[:, 1:, :, :] - x[:, :-1, :, :])[:, 1:, :-2, :]**2
        dc = (x[:, :, 1:, :] - x[:, :, :-1, :])[:, :-2, 1:, :]**2
        return jnp.abs(dr + dc)

    eps = 1e-8
    length = jnp.mean((jnp.sqrt(_edges(probs) + eps) - jnp.sqrt(_edges(target) + eps))**2)
    region_in = jnp.mean(probs * (target - 1.0)**2)
    region_out = jnp.mean((1 - probs) * target**2)
    loss = len_weight * length + region_in + region_out
    if w_area:
        loss = loss + area_weight * jnp.sum(probs)
    return loss


def levelset_loss(mask_scores, norm_img, class_weight=1.0, levelset_evo_weight=1e-6, length_weight=1e-8):
    """mask_scores: (B, H, W, C) probabilities; norm_img: (B, H, W, C_img)
    (reference level_set_loss.py:8-100)."""
    region = 0.0
    for i in range(norm_img.shape[-1]):
        im = norm_img[..., i:i + 1]                           # (B, H, W, 1)
        avg = jnp.sum(im * mask_scores, axis=(1, 2)) / (jnp.sum(mask_scores, axis=(1, 2)) + 1e-8)
        lvl = im - avg[:, None, None, :]
        region = region + jnp.sum(class_weight * lvl * lvl * mask_scores)
    gh = jnp.abs(mask_scores[:, 1:, :, :] - mask_scores[:, :-1, :, :])
    gw = jnp.abs(mask_scores[:, :, 1:, :] - mask_scores[:, :, :-1, :])
    length = jnp.sum(class_weight * gh) + jnp.sum(class_weight * gw)
    return levelset_evo_weight * region + length_weight * length


def variance_loss(logits, inst_gt, max_instances: int = 256):
    """Intra-instance variance of softmax probabilities (reference
    var_loss.py:9-36), via segment sums over a static id capacity."""
    probs = jax.nn.softmax(logits, axis=-1)                   # (B, H, W, C)
    B, H, W, C = probs.shape
    ids = jnp.clip(inst_gt.astype(jnp.int32), 0, max_instances - 1).reshape(B, H * W)
    flat = probs.reshape(B, H * W, C)

    def per_image(p, i):
        cnt = jax.ops.segment_sum(jnp.ones_like(i, jnp.float32), i, num_segments=max_instances)
        s1 = jax.ops.segment_sum(p, i, num_segments=max_instances)
        s2 = jax.ops.segment_sum(p * p, i, num_segments=max_instances)
        n = jnp.maximum(cnt, 1.0)[:, None]
        var = (s2 - s1 * s1 / n) / jnp.maximum(n - 1.0, 1.0)  # unbiased
        valid = (cnt > 1)
        valid = valid.at[0].set(False)                        # id 0 = background
        sum_var = jnp.sum(jnp.where(valid[:, None], var, 0.0))
        n_inst = jnp.sum((cnt > 0).at[0].set(False).astype(jnp.float32))
        return sum_var / (n_inst + 1e-8)

    return jnp.mean(jax.vmap(per_image)(flat, ids))


def topological_loss(dir_logits, dir_gt, pred_contour, target_contour, use_regression=False,
                     weight=False, num_angles: Optional[int] = None):
    """Direction consistency inside the contour band (reference
    topological_loss.py:25-110)."""
    all_contour = ((pred_contour + target_contour) > 0).astype(jnp.float32)
    if use_regression:
        mse = (dir_logits - dir_gt)**2
        if mse.ndim == all_contour.ndim + 1:
            mse = jnp.mean(mse, axis=-1)
        return jnp.sum(mse * all_contour) / (jnp.sum(all_contour) + 1e-8)
    ce = cross_entropy(dir_logits, dir_gt, reduction='none')
    if weight:
        pred_dir = jnp.argmax(dir_logits, axis=-1)
        diff = jnp.abs(pred_dir - dir_gt)
        w = jnp.minimum(diff, num_angles - diff) + 1
        background = (pred_dir == 0) | (dir_gt == 0)
        w = jnp.where(background, 2, w)
        ce = ce * w
    return jnp.sum(ce * all_contour) / (jnp.sum(all_contour) + 1e-8)


# ---------------------------------------------------------------------------
# training metrics (reference losses/dice.py:7-54, iou.py:7-55)
# ---------------------------------------------------------------------------
def _histc(x, num_classes):
    return jnp.bincount(x.reshape(-1).astype(jnp.int32), length=num_classes).astype(jnp.float32)


def tdice(logits, labels, num_classes: int):
    """Total dice over foreground classes, argmax-hardened, x100."""
    pred = jnp.argmax(logits, axis=-1)
    inter = _histc(jnp.where(pred == labels, pred, num_classes), num_classes)
    area_p = _histc(pred, num_classes)
    area_l = _histc(labels, num_classes)
    inter, area_p, area_l = inter[1:], area_p[1:], area_l[1:]
    union = area_p + area_l - inter
    res = 2 * 100 * inter.sum() / (union.sum() + inter.sum())
    return jnp.nan_to_num(res)


def mdice(logits, labels, num_classes: int):
    """Mean per-foreground-class dice, x100."""
    pred = jnp.argmax(logits, axis=-1)
    inter = _histc(jnp.where(pred == labels, pred, num_classes), num_classes)
    area_p = _histc(pred, num_classes)
    area_l = _histc(labels, num_classes)
    dice = 2 * inter / (area_p + area_l)
    return jnp.nan_to_num(100 * jnp.mean(dice[1:]))


def tiou(logits, labels, num_classes: int):
    pred = jnp.argmax(logits, axis=-1)
    inter = _histc(jnp.where(pred == labels, pred, num_classes), num_classes)
    area_p = _histc(pred, num_classes)
    area_l = _histc(labels, num_classes)
    inter, area_p, area_l = inter[1:], area_p[1:], area_l[1:]
    union = area_p + area_l - inter
    return jnp.nan_to_num(100 * inter.sum() / union.sum())


def miou(logits, labels, num_classes: int):
    pred = jnp.argmax(logits, axis=-1)
    inter = _histc(jnp.where(pred == labels, pred, num_classes), num_classes)
    area_p = _histc(pred, num_classes)
    area_l = _histc(labels, num_classes)
    iou = inter / (area_p + area_l - inter)
    return jnp.nan_to_num(100 * jnp.mean(iou[1:]))
