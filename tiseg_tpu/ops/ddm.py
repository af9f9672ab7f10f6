"""Direction differential map (DDM) — on-device jnp twin of the host
implementation (tiseg_tpu.datasets.utils.direction), rebuilding the
reference's torch version (tiseg/models/utils/direct_diff_map.py:95-167).

Fully jit-able: used inside CDNet's fused TTA inference program. The DDM is
invariant to the global direction-label rotation/mirroring introduced by
naive spatial TTA reversal (only *relative* angles between neighboring
pixels matter), which is why per-view DDMs can be computed on
un-remapped direction argmaxes, exactly as the reference does
(cdnet.py:201-216).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..datasets.utils.direction import LABEL_TO_VECTOR

_SHIFTS = ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1))


def label_to_vector(dir_map: jnp.ndarray, num_classes: int = 9) -> jnp.ndarray:
    """(N, H, W) int direction classes -> (N, H, W, 2) (dh, dw) offsets."""
    mapping = jnp.asarray(LABEL_TO_VECTOR[num_classes], dtype=jnp.float32)
    return mapping[jnp.clip(dir_map, 0, len(LABEL_TO_VECTOR[num_classes]) - 1)]


def angle_to_dir_class(angle_deg: jnp.ndarray, num_classes: int = 8) -> jnp.ndarray:
    """Quantize degrees in (-180, 180] to sector indices (jnp twin of the
    host align_angle, tiseg_tpu.datasets.utils.direction)."""
    step = 360.0 / num_classes
    shifted = angle_deg + 180.0 - step / 2
    idx = jnp.ceil(shifted / step).astype(jnp.int32) % num_classes
    return idx


def regression_to_dir_map(reg_dir: jnp.ndarray, background: jnp.ndarray, num_angles: int = 8) -> jnp.ndarray:
    """Radians-regression direction -> 1..num_angles class map, 0 on
    background (reference multi_task_cdnet.py:304-317 eval path)."""
    ang = jnp.clip(reg_dir, 0.0, 2 * jnp.pi) * 180.0 / jnp.pi
    ang = jnp.where(ang > 180.0, ang - 360.0, ang)
    ang = jnp.where(background, 0.0, ang)
    # snap to sector center, then relabel via atan2 of the unit vector —
    # equivalent to align_angle twice, which is idempotent on sector centers
    idx = angle_to_dir_class(ang, num_angles)
    idx = jnp.where(background, -1, idx)
    return idx + 1


def generate_direction_differential_map(dir_map: jnp.ndarray, direction_classes: int = 9) -> jnp.ndarray:
    """(N, H, W) int -> (N, H, W) float DDM in [0, 1]."""
    vec = label_to_vector(dir_map, direction_classes)      # (N, H, W, 2)
    background = dir_map == 0

    norm_a = jnp.sqrt(vec[..., 0]**2 + vec[..., 1]**2)
    cos_min = jnp.full(dir_map.shape, jnp.inf, dtype=jnp.float32)
    for sv, sh in _SHIFTS:
        nb = jnp.roll(jnp.roll(vec, sv, axis=-3), sh, axis=-2)
        num = vec[..., 0] * nb[..., 0] + vec[..., 1] * nb[..., 1]
        den = norm_a * jnp.sqrt(nb[..., 0]**2 + nb[..., 1]**2) + 1e-6
        cos_min = jnp.minimum(cos_min, num / den)

    cos_min = jnp.where(background, 1.0, cos_min)
    ddm = 1.0 - jnp.round(cos_min)
    mx = jnp.max(ddm)
    mn = jnp.min(ddm)
    normalized = (ddm - mn) / jnp.where(mx - mn == 0, 1.0, mx - mn)
    return jnp.where(mx == 0, ddm, normalized)
