"""Label-map generators: the scientific core of the data pipeline.

Host-side numpy rebuilds of the reference ops (tiseg/datasets/ops/
{bound,unet,direction,distance,hv}_map.py). Every op re-canonicalizes the
instance map first (remove <5px 4-conn fragments, split disconnected parts,
renumber) and masks ``sem_gt`` to the fixed instances, exactly like the
reference's ``_fix_inst``.

These run in dataloader workers; crops can also be pre-generated offline.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.ndimage import gaussian_filter

from ...utils import morphology as m
from ..utils import direction
from ..utils.center import fast_centerpoint as calculate_centerpoint
from ..utils.direction import angle_to_vector, generate_direction_differential_map, vector_to_label
from ..utils.gradient import calculate_gradient
from ..utils.instance import fix_instance


_CANONICAL = __import__('weakref').WeakValueDictionary()


def _fix_instance_cached(inst_gt: np.ndarray) -> np.ndarray:
    """fix_instance, skipped when ``inst_gt`` IS an array this process
    already canonicalized (fix_instance is idempotent: dense ascending ids,
    each 8-connected and >= min_size). Stacked label ops in one pipeline
    (e.g. BoundLabelMake then DirectionLabelMake) hand the same fixed array
    forward, so only the first pays. Object-identity keyed (id() validated
    with ``is`` through a weak map), so any transform that rebuilds the
    array — they all do — naturally misses the cache."""
    if _CANONICAL.get(id(inst_gt)) is inst_gt:
        return inst_gt
    fixed = fix_instance(inst_gt)
    _CANONICAL[id(fixed)] = fixed
    return fixed


def instance_boxes(inst_gt: np.ndarray):
    """One-pass (id, (yslice, xslice)) bboxes for all instances: the key
    host-side optimization — every per-instance op below runs on a padded
    bbox crop instead of the full image (exact: each instance is fully
    contained in its crop)."""
    mx = int(inst_gt.max(initial=0))
    if mx <= 0:
        return []
    if 0 < mx <= 4 * inst_gt.size:  # dense-ish ids: one native image pass
        try:
            from ... import native
            rows = native.instance_bboxes(inst_gt, mx)
        except Exception:
            rows = None
        if rows is not None:
            return [(i, (slice(int(r[0]), int(r[1]) + 1), slice(int(r[2]), int(r[3]) + 1)))
                    for i, r in enumerate(rows) if i > 0 and r[1] >= 0]
    ids = np.unique(inst_gt)
    ids = ids[ids != 0]
    if ids.size == 0:
        return []
    dense = np.searchsorted(ids, inst_gt) + 1
    dense[inst_gt == 0] = 0
    slices = ndimage.find_objects(dense, max_label=len(ids))
    return [(int(i), s) for i, s in zip(ids, slices) if s is not None]


def _pad_slices(sl, pad, shape):
    ys, xs = sl
    return (slice(max(ys.start - pad, 0), min(ys.stop + pad, shape[0])),
            slice(max(xs.start - pad, 0), min(xs.stop + pad, shape[1])))


def _boxes_array(inst_gt, pad=2):
    """(nb, 5) int32 (id, y0, y1, x0, x1) padded+clamped rows for the native
    per-instance kernels."""
    h, w = inst_gt.shape[:2]
    return np.array([[k, max(sl[0].start - pad, 0), min(sl[0].stop + pad, h),
                      max(sl[1].start - pad, 0), min(sl[1].stop + pad, w)]
                     for k, sl in instance_boxes(inst_gt)], np.int32).reshape(-1, 5)


class BoundLabelMake:
    """sem_gt_w_bound: background/foreground(+classes)/boundary(=edge_id).

    Per instance: boundary = diamond-dilation(r0) & ~diamond-erosion(r1)
    (reference bound_map.py:36-89).
    """

    def __init__(self, edge_id=2, selem_radius=3):
        self.edge_id = edge_id
        if isinstance(selem_radius, int):
            selem_radius = (selem_radius, selem_radius)
        self.radius = selem_radius

    def __call__(self, data):
        sem_gt = data['sem_gt']
        inst_gt = _fix_instance_cached(data['inst_gt'])
        sem_gt = sem_gt.copy()
        sem_gt[inst_gt == 0] = 0
        data['sem_gt'] = sem_gt
        data['inst_gt'] = inst_gt

        sem_gt_w_bound = sem_gt.copy()
        assert np.allclose(sem_gt > 0, inst_gt > 0)
        bound_native = None
        try:  # native twin: two L1 distance transforms per instance bbox
            from ... import native
            bound_native = native.bound_map(inst_gt, self.radius[0], self.radius[1])
        except Exception:
            pass
        if bound_native is not None:
            sem_gt_w_bound[bound_native] = self.edge_id
        else:
            d0 = m.diamond(self.radius[0])
            d1 = m.diamond(self.radius[1])
            pad = max(self.radius) + 1
            for inst_id, sl in instance_boxes(inst_gt):
                view = _pad_slices(sl, pad, inst_gt.shape)
                mask = inst_gt[view] == inst_id
                bound = m.dilation(mask, d0) & (~m.erosion(mask, d1))
                sem_gt_w_bound[view][bound] = self.edge_id

        data['sem_gt_w_bound'] = sem_gt_w_bound
        data['seg_fields'].append('sem_gt_w_bound')
        return data


class UNetLabelMake:
    """sem_gt_inner (1px-eroded instances) + UNet eq.(2) border weight map
    ``w0 * exp(-(d1+d2)^2 / 2 sigma^2)`` (reference unet_map.py:7-127)."""

    def __init__(self, wc=None, w0=10.0, sigma=5.0):
        self.wc = wc
        self.w0 = w0
        self.sigma = sigma
        if wc is None:
            # Truncation radius from the absorption bound: the map ships as
            # float32(1 + w), and (1 + w) rounds to 1.0f whenever
            # w <= 2^-24, i.e. whenever any contributing distance d >= pix
            # >= sqrt(2 sigma^2 ln(w0 * 2^24)) — candidates beyond that
            # radius cannot move the consumed artifact by one bit
            # (empirically validated against the exact global two-label EDT
            # in docs/ROUND5.md; defaults give 31 vs the old fixed 40).
            self.TRUNC = max(8, int(np.ceil(np.sqrt(
                2.0 * sigma * sigma * np.log(max(w0, 1e-30) * 2.0**24)))))

    def _remove_1px_boundary(self, inst_gt):
        try:  # native twin (tiseg_tpu/native/labelmaps.cpp), exact
            from ... import native
            out = native.remove_1px_boundary(inst_gt)
            if out is not None:
                return out
        except Exception:
            pass
        new = np.zeros(inst_gt.shape[:2], np.int32)
        d1 = m.diamond(1)
        for inst_id, sl in instance_boxes(inst_gt):
            view = _pad_slices(sl, 2, inst_gt.shape)
            er = m.erosion((inst_gt[view] == inst_id).astype(np.uint8), d1)
            new[view][er > 0] = inst_id
        return new

    # conservative class-level radius for the wc path (whose additive base
    # can be 0, so the +1 absorption bound below does not apply); the
    # wc=None constructor overrides it with the absorption-derived radius
    TRUNC = 40

    def _get_weight_map(self, ann, inst_list):
        if len(inst_list) <= 1:
            return np.zeros(ann.shape[:2])
        try:  # native twin: per-instance exact Felzenszwalb EDTs in C++
            from ... import native
            out = native.unet_weight_map(ann, int(np.max(ann)), self.TRUNC, self.w0, self.sigma)
            if out is not None:
                return out  # float64 — same dtype/path as the numpy twin
        except Exception:
            pass
        # running nearest / second-nearest instance-border distances, each
        # instance's EDT computed only on its padded bbox (exact within the
        # truncation radius; see TRUNC)
        BIG = 1e9
        near1 = np.full(ann.shape[:2], BIG)
        near2 = np.full(ann.shape[:2], BIG)
        for inst_id, sl in instance_boxes(ann):
            view = _pad_slices(sl, self.TRUNC, ann.shape)
            d = m.distance_transform_edt((ann[view] != inst_id).astype(np.uint8))
            v1 = near1[view]
            v2 = near2[view]
            smaller = d < v1
            near2[view] = np.where(smaller, v1, np.minimum(v2, d))
            near1[view] = np.where(smaller, d, v1)
            # equidistant tie from a different instance -> near2 == near1
            tie = (~smaller) & (d == v1)
            near2[view][tie] = near1[view][tie]

        pix = np.where(near2 >= BIG, BIG, near1 + near2)
        pen = self.w0 * np.exp(-np.minimum(pix, 4 * self.TRUNC)**2 / (2 * self.sigma**2))
        pen[ann > 0] = 0
        return pen

    def __call__(self, data):
        inst_gt = _fix_instance_cached(data['inst_gt'])
        sem_gt = data['sem_gt'].copy()
        sem_gt[inst_gt == 0] = 0
        data['sem_gt'] = sem_gt
        data['inst_gt'] = inst_gt

        inner = self._remove_1px_boundary(inst_gt)
        sem_gt_inner = sem_gt.copy()
        sem_gt_inner[inner == 0] = 0

        inst_ids = np.unique(inner)
        inst_ids = list(inst_ids[inst_ids > 0])
        wmap = self._get_weight_map(inner, inst_ids)
        if self.wc is None:
            wmap += 1
        else:
            cw = np.zeros(inner.shape[:2])
            for class_id, class_w in self.wc.items():
                cw[inner == class_id] = class_w
            wmap += cw

        data['loss_weight_map'] = wmap
        data['sem_gt_inner'] = sem_gt_inner
        data['seg_fields'].append('sem_gt_inner')
        return data



_POINT_KERNEL = None


def _point_gaussian_255(point_map: np.ndarray) -> np.ndarray:
    """scipy ``gaussian_filter(point_map * 255, sigma=2)`` via sparse kernel
    stamping: the response of one center is the (cached) scipy response of
    a 255-delta — bit-identical per isolated interior center, including
    the exact zeros beyond the truncation radius (8 px at sigma=2).
    Centers closer than 17 px sum their stamps in point order instead of
    scipy's tap order, and border centers fold the window ('reflect')
    after the 2-D response instead of per separable pass — both f32
    rounding-level differences (< 4e-6 on the 0..255 scale) on a soft MSE
    heatmap."""
    global _POINT_KERNEL
    R = 16  # the 255-delta response support is [-8, 8]; R=16 pads for folds
    if _POINT_KERNEL is None:
        delta = np.zeros((2 * R + 1, 2 * R + 1), np.float32)
        delta[R, R] = 255.0
        _POINT_KERNEL = gaussian_filter(delta, sigma=2, order=0).astype(np.float32)
    out = np.zeros(point_map.shape[:2], np.float32)
    H, W = out.shape
    for y, x in np.argwhere(point_map > 0):
        y0, x0 = int(y) - R, int(x) - R
        if 8 <= y < H - 8 and 8 <= x < W - 8:  # interior: one slice add
            out[y - 8:y + 9, x - 8:x + 9] += _POINT_KERNEL[R - 8:R + 9, R - 8:R + 9]
        else:  # border: fold out-of-image taps back in ('reflect': -1 -> 0)
            yy = np.arange(y0, y0 + 2 * R + 1)
            xx = np.arange(x0, x0 + 2 * R + 1)
            yy = np.where(yy < 0, -1 - yy, np.where(yy >= H, 2 * H - 1 - yy, yy))
            xx = np.where(xx < 0, -1 - xx, np.where(xx >= W, 2 * W - 1 - xx, xx))
            np.add.at(out, (yy[:, None], xx[None, :]), _POINT_KERNEL)
    return out


class DirectionLabelMake:
    """point_gt (gaussian center heatmap), dist_gt (sqrt-scaled distance to
    center), dir_gt (quantized angle classes of the distance gradient),
    reg_dir_gt (radians), loss_weight_map (DDM-of-GT based).
    (reference direction_map.py:11-193)

    Cross-backend note: the ksize-11 gradient is computed by cv2, ndimage,
    or the native C++ kernel depending on the host; their f32 summation
    orders differ, so pixels whose gradient angle sits within float noise
    of a sector boundary (or whose gradient magnitude is ~0, e.g. instance
    centers) can quantize to a different dir_gt class per backend. This is
    inherent to the reference formulation (its torch conv has the same
    property vs any CPU path); training is insensitive to it.
    """

    def __init__(self, to_center=True, num_angles=8):
        self.to_center = to_center
        self.num_angles = num_angles

    def __call__(self, data):
        sem_gt = data['sem_gt'].copy()
        inst_gt = _fix_instance_cached(data['inst_gt'])
        sem_gt[inst_gt == 0] = 0
        data['sem_gt'] = sem_gt
        data['inst_gt'] = inst_gt

        point_map, gradient_map, dist_map = self.calculate_point_map(inst_gt, to_center=self.to_center)
        # one full-image arctan2, shared by the class and regression maps
        angle = np.degrees(np.arctan2(gradient_map[..., 0], gradient_map[..., 1]))
        dir_map = self.calculate_dir_map(inst_gt, gradient_map, self.num_angles, angle=angle)
        reg_dir_map = self.calculate_regression_dir_map(inst_gt, gradient_map, angle=angle)
        if self.num_angles == 8:
            weight_map = self.calculate_weight_map(dir_map, dist_map, self.num_angles)
        else:
            weight_map = np.zeros_like(dir_map, dtype=np.float32)

        data['dist_gt'] = dist_map
        data['point_gt'] = point_map
        data['dir_gt'] = dir_map
        data['reg_dir_gt'] = reg_dir_map
        data['loss_weight_map'] = weight_map
        return data

    @staticmethod
    def calculate_weight_map(dir_map, dist_map, num_angle_types):
        try:  # native twin: table DDM + dilation in one pass (exactness
            # pinned in tests/test_native_labelmaps.py)
            from ... import native
            out = native.ddm_weight(dir_map, dist_map,
                                    direction.LABEL_TO_VECTOR[num_angle_types + 1])
            if out is not None:
                return out
        except Exception:
            pass
        dd = generate_direction_differential_map(dir_map, num_angle_types + 1)[0]
        weight = dd * (10 - dist_map)
        weight = m.dilation(weight, m.disk(1))
        return weight.astype(np.float32) * 2 + 1.0

    @staticmethod
    def calculate_dir_map(instance_map, gradient_map, num_angle_types, angle=None):
        if angle is None:
            angle = np.degrees(np.arctan2(gradient_map[..., 0], gradient_map[..., 1]))
        else:
            angle = angle.copy()
        angle[instance_map == 0] = 0
        # one align_angle pass: snapping to a sector center, converting to
        # its unit vector, and re-quantizing the arctan2 of that vector
        # (_dir_map_via_vectors, the reference formulation) is the identity
        # on the sector centers — pinned in tests/test_label_maps_equiv.py
        dir_map = direction.angle_to_direction_label(angle, num_classes=num_angle_types)
        dir_map[instance_map == 0] = -1
        return dir_map + 1

    @staticmethod
    def _dir_map_via_vectors(instance_map, gradient_map, num_angle_types):
        """Reference formulation (direction_map.py:88-97): kept as the
        naive twin for the fast-path equivalence test."""
        angle = np.degrees(np.arctan2(gradient_map[..., 0], gradient_map[..., 1]))
        angle[instance_map == 0] = 0
        vec = angle_to_vector(angle, num_angle_types)
        dir_map = vector_to_label(vec, num_angle_types)
        dir_map[instance_map == 0] = -1
        return dir_map + 1

    @staticmethod
    def calculate_regression_dir_map(instance_map, gradient_map, angle=None):
        if angle is None:
            angle = np.degrees(np.arctan2(gradient_map[..., 0], gradient_map[..., 1]))
        else:
            angle = angle.copy()
        angle[angle < 0] += 360
        angle[instance_map == 0] = 0
        return angle / 180 * np.pi

    @classmethod
    def calculate_point_map(cls, instance_map, to_center=True):
        """Per-instance work runs on padded bbox crops: the center search
        only probes instance pixels, the distance-to-center field is
        analytic, and the ksize-11 gradient needs a 5px halo of the
        (instance-supported) distance field — all exact on crops."""
        H, W = instance_map.shape[:2]
        dist_map = np.zeros((H, W), dtype=np.float32)
        gradient_map = np.zeros((H, W, 2), dtype=np.float32)
        point_map = np.zeros((H, W), dtype=np.float32)

        boxes = instance_boxes(instance_map)
        try:  # native one-call twin of the whole per-instance stage
            # (centers + distance + gradient; tests/test_native_labelmaps.py)
            from ... import native
            res = (native.dlm_point_maps(instance_map, int(max(k for k, _ in boxes)),
                                         ksize=11, to_center=to_center)
                   if boxes else None)
        except Exception:
            res = None
        if res is not None:
            dist_map, gradient_map, centers = res
            ys, xs = centers[1:, 0], centers[1:, 1]
            ok = ys >= 0
            point_map[ys[ok], xs[ok]] = 1
            assert int(point_map.sum()) == len(boxes)
            point_map_gaussian = _point_gaussian_255(point_map)
            return point_map_gaussian, gradient_map, (dist_map**0.5) * 10

        all_centers = None
        try:  # one native call for every id beats per-crop ctypes calls
            from ... import native
            if boxes:
                all_centers = native.all_centerpoints(instance_map, int(max(k for k, _ in boxes)))
        except Exception:
            pass
        for k, sl in boxes:
            view = _pad_slices(sl, 6, instance_map.shape)
            single = (instance_map[view] == k).astype(np.uint8)
            h, w = single.shape
            if all_centers is not None and all_centers[k, 0] >= 0:
                center = [int(all_centers[k, 0] - view[0].start), int(all_centers[k, 1] - view[1].start)]
            else:
                center = calculate_centerpoint(single, h, w)
            assert single[center[0], center[1]] > 0
            point_map[view[0].start + center[0], view[1].start + center[1]] = 1
            if to_center:
                d = cls._distance_to_center(single, center)
            else:
                d = cls._distance_to_centralridge(single)
            dist_map[view] += d
            g = calculate_gradient(d, ksize=11)
            g[single == 0, :] = 0
            gm = gradient_map[view]
            gm[single != 0, :] = 0
            gm += g
        assert int(point_map.sum()) == len(boxes)

        point_map_gaussian = _point_gaussian_255(point_map)
        dist_map = (dist_map**0.5) * 10
        return point_map_gaussian, gradient_map, dist_map

    @staticmethod
    def _distance_to_center(single, center):
        H, W = single.shape[:2]
        point = np.zeros((H, W), dtype=np.uint8)
        point[center[0], center[1]] = 1
        d = m.distance_transform_edt(1 - point) * single
        return (1 - d / (d.max() + 1e-7)) * single

    @staticmethod
    def _distance_to_centralridge(single):
        d = m.distance_transform_edt(single) * single
        return (d / (d.max() + 1e-7)) * single


class DistanceLabelMake:
    """Per-instance chessboard distance map, instance-normalized to (0, 1]
    (reference distance_map.py:23-107)."""

    def __init__(self, inst_norm=True):
        self.inst_norm = inst_norm

    def __call__(self, data):
        sem_gt = data['sem_gt'].copy()
        inst_gt = _fix_instance_cached(data['inst_gt'])
        sem_gt[inst_gt == 0] = 0
        data['sem_gt'] = sem_gt
        data['inst_gt'] = inst_gt

        # one-pass bboxes: the per-id full-image compare + bbox scan was the
        # measured cost of this op (O(n_ids * H * W)); instance_boxes slices
        # equal get_bounding_box on the per-id mask exactly
        boxes = _boxes_array(inst_gt)
        try:  # native twin: per-instance chessboard chamfer in one call
            # (tests/test_native_labelmaps.py pins exactness)
            from ... import native
            out = native.dist_cdt_map(inst_gt, boxes, self.inst_norm)
            if out is not None:
                data['dist_gt'] = out
                data['seg_fields'].append('dist_gt')
                return data
        except Exception:
            pass
        dist_gt = np.zeros(inst_gt.shape, dtype=np.float32)
        for inst_id, *box in boxes.tolist():
            crop = (inst_gt[box[0]:box[1], box[2]:box[3]] == inst_id).astype(np.uint8)
            if crop.shape[0] < 2 or crop.shape[1] < 2:
                continue
            d = m.distance_transform_cdt(crop).astype(np.float32)
            if self.inst_norm:
                mx = np.amax(d)
                if mx <= 0:
                    continue
                d = d / mx
            view = dist_gt[box[0]:box[1], box[2]:box[3]]
            view[crop > 0] = d[crop > 0]

        data['dist_gt'] = dist_gt
        data['seg_fields'].append('dist_gt')
        return data


class HVLabelMake:
    """Horizontal/vertical per-instance coordinate maps normalized to
    [-1, 1], centered at the instance center of mass (reference
    hv_map.py:18-114). Output is channels-last (H, W, 2) — NHWC is the
    TPU-native layout (the reference emits (2, H, W))."""

    def __call__(self, data):
        inst_gt = data['inst_gt']
        # one-pass bboxes (see DistanceLabelMake) — exact replacement for the
        # per-id full-image get_bounding_box scan
        boxes = _boxes_array(inst_gt)
        try:  # native twin: com + signed normalized offsets in one call
            # (tests/test_native_labelmaps.py pins exactness)
            from ... import native
            out = native.hv_map(inst_gt, boxes)
            if out is not None:
                data['hv_gt'] = out
                data['seg_fields'].append('hv_gt')
                return data
        except Exception:
            pass
        x_map = np.zeros(inst_gt.shape[:2], dtype=np.float32)
        y_map = np.zeros(inst_gt.shape[:2], dtype=np.float32)

        for inst_id, *box in boxes.tolist():
            crop = (inst_gt[box[0]:box[1], box[2]:box[3]] == inst_id).astype(np.uint8)
            if crop.shape[0] < 2 or crop.shape[1] < 2:
                continue
            com = list(m.center_of_mass(crop))
            com[0] = int(com[0] + 0.5)
            com[1] = int(com[1] + 0.5)
            rx = np.arange(1, crop.shape[1] + 1) - com[1]
            ry = np.arange(1, crop.shape[0] + 1) - com[0]
            ix, iy = np.meshgrid(rx, ry)
            ix[crop == 0] = 0
            iy[crop == 0] = 0
            ix = ix.astype(np.float32)
            iy = iy.astype(np.float32)
            if np.min(ix) < 0:
                ix[ix < 0] /= -np.amin(ix[ix < 0])
            if np.min(iy) < 0:
                iy[iy < 0] /= -np.amin(iy[iy < 0])
            if np.max(ix) > 0:
                ix[ix > 0] /= np.amax(ix[ix > 0])
            if np.max(iy) > 0:
                iy[iy > 0] /= np.amax(iy[iy > 0])
            xv = x_map[box[0]:box[1], box[2]:box[3]]
            xv[crop > 0] = ix[crop > 0]
            yv = y_map[box[0]:box[1], box[2]:box[3]]
            yv[crop > 0] = iy[crop > 0]

        data['hv_gt'] = np.stack([x_map, y_map], axis=-1)
        data['seg_fields'].append('hv_gt')
        return data
