"""ctypes bindings for the native post-processing library.

Builds lazily on first use (g++ -O3 -shared) and falls back to the numpy
implementations in :mod:`tiseg_tpu.models.utils.postprocess` when no
compiler is available. ``HAS_NATIVE`` reports availability.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, 'postproc.cpp')
_LIB = osp.join(_HERE, 'libtiseg_post.so')
_SRC_LM = osp.join(_HERE, 'labelmaps.cpp')
_LIB_LM = osp.join(_HERE, 'libtiseg_labelmaps.so')

_lib = None
_lib_lm = None


def _compile(src, lib):
    if osp.exists(lib) and osp.getmtime(lib) >= osp.getmtime(src):
        return True
    try:
        subprocess.run(['g++', '-O3', '-march=native', '-shared', '-fPIC', '-o', lib, src],
                       check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def build(force: bool = False) -> bool:
    """Compile the shared libraries; returns True on success."""
    if force:
        for lib in (_LIB, _LIB_LM):
            if osp.exists(lib):
                os.remove(lib)
    return _compile(_SRC, _LIB) and _compile(_SRC_LM, _LIB_LM)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        return None
    lib = ctypes.CDLL(_LIB)
    lib.align_foreground.argtypes = [ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.calculate_centerpoint.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                                          ctypes.POINTER(ctypes.c_int32)]
    lib.label_cc8.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                              ctypes.POINTER(ctypes.c_int32)]
    lib.label_cc8.restype = ctypes.c_int32
    _lib = lib
    return lib


HAS_NATIVE = build()


def align_foreground(pred: np.ndarray, foreground: np.ndarray, time: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..models.utils.postprocess import align_foreground as np_impl
        return np_impl(pred, foreground, time)
    h, w = pred.shape
    out = np.ascontiguousarray(pred.astype(np.int32)).copy()
    fore = np.ascontiguousarray((foreground > 0).astype(np.uint8))
    lib.align_foreground(out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                         fore.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, time)
    return out


def calculate_centerpoint(mask: np.ndarray):
    lib = _load()
    if lib is None:
        from ..datasets.utils.center import calculate_centerpoint as np_impl
        return np_impl(mask)
    h, w = mask.shape
    m = np.ascontiguousarray((mask > 0).astype(np.uint8))
    out = np.zeros(2, np.int32)
    lib.calculate_centerpoint(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return [int(out[0]), int(out[1])]


def _load_lm():
    global _lib_lm
    if _lib_lm is not None:
        return _lib_lm
    if not _compile(_SRC_LM, _LIB_LM):
        return None
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib = ctypes.CDLL(_LIB_LM)
    lib.fix_instance.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i32p]
    lib.fix_instance.restype = ctypes.c_int32
    lib.remove_1px_boundary.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, c_i32p]
    c_f64p = ctypes.POINTER(ctypes.c_double)
    lib.unet_weight_map.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int32,
                                    ctypes.c_int, ctypes.c_float, ctypes.c_float, c_f64p]
    lib.unet_weight_map_global.argtypes = lib.unet_weight_map.argtypes
    lib.bound_map.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.POINTER(ctypes.c_uint8)]
    lib.all_centerpoints.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int32, c_i32p]
    lib.instance_bboxes.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int32, c_i32p]
    lib.dlm_point_maps.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int32,
                                   ctypes.c_int, ctypes.c_int, c_f32p, c_f32p, c_i32p]
    lib.ddm_weight.argtypes = [c_i32p, c_f32p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, c_i32p, c_f32p]
    lib.hv_map.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i32p, c_f32p]
    lib.dist_cdt_map.argtypes = [c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i32p,
                                 ctypes.c_int, c_f32p]
    _lib_lm = lib
    return lib


def _i32(a):
    return np.ascontiguousarray(np.asarray(a).astype(np.int32))


def fix_instance(inst: np.ndarray, min_size: int = 5):
    """Native twin of datasets.utils.instance.fix_instance; returns the
    renumbered map or None when no compiler is available."""
    lib = _load_lm()
    if lib is None:
        return None
    inst = _i32(inst)
    h, w = inst.shape
    out = np.zeros((h, w), np.int32)
    lib.fix_instance(inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, min_size,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def remove_1px_boundary(inst: np.ndarray):
    lib = _load_lm()
    if lib is None:
        return None
    inst = _i32(inst)
    h, w = inst.shape
    out = np.zeros((h, w), np.int32)
    lib.remove_1px_boundary(inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def unet_weight_map(ann: np.ndarray, n_ids: int, trunc: int, w0: float, sigma: float):
    lib = _load_lm()
    if lib is None:
        return None
    ann = _i32(ann)
    h, w = ann.shape
    out = np.zeros((h, w), np.float64)
    lib.unet_weight_map(ann.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, n_ids, trunc,
                        w0, sigma, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def unet_weight_map_global(ann: np.ndarray, n_ids: int, trunc: int, w0: float, sigma: float):
    """Exact GLOBAL two-distinct-label EDT variant (no per-instance bands):
    O(HW) column pass + per-row per-label envelopes. Kept as the oracle the
    banded production kernel's truncation is validated against — measured
    1.8x SLOWER than the banded kernel at MoNuSeg density (docs/ROUND5.md),
    so it is not the default."""
    lib = _load_lm()
    if lib is None:
        return None
    ann = _i32(ann)
    h, w = ann.shape
    out = np.zeros((h, w), np.float64)
    lib.unet_weight_map_global(ann.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, n_ids,
                               trunc, w0, sigma,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def instance_bboxes(inst: np.ndarray, n_ids: int):
    """Tight per-id bboxes in one image pass: (n_ids+1, 4) int32 rows
    (y0, y1, x0, x1), y1 = -1 where an id is absent; None without a
    compiler. Twin of ops/label_maps.py instance_boxes."""
    lib = _load_lm()
    if lib is None:
        return None
    inst = _i32(inst)
    h, w = inst.shape
    out = np.empty((n_ids + 1, 4), np.int32)
    lib.instance_bboxes(inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, n_ids,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def all_centerpoints(inst: np.ndarray, n_ids: int):
    """Per-id FCOS-centerness centers in GLOBAL coords: (n_ids+1, 2) int32,
    row 0 unused, -1 where an id is absent; None without a compiler."""
    lib = _load_lm()
    if lib is None:
        return None
    inst = _i32(inst)
    h, w = inst.shape
    out = np.full((n_ids + 1, 2), -1, np.int32)
    lib.all_centerpoints(inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, n_ids,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def dlm_point_maps(inst: np.ndarray, n_ids: int, ksize: int = 11, to_center: bool = True):
    """DirectionLabelMake per-instance stage in one call: returns
    (dist f32 (H, W) pre-sqrt-scaling, grad f32 (H, W, 2), centers (n_ids+1, 2)
    global yx, -1 where absent); None without a compiler."""
    lib = _load_lm()
    if lib is None:
        return None
    inst = _i32(inst)
    h, w = inst.shape
    dist = np.zeros((h, w), np.float32)
    grad = np.zeros((h, w, 2), np.float32)
    centers = np.full((n_ids + 1, 2), -1, np.int32)
    lib.dlm_point_maps(inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, n_ids,
                       ksize, int(to_center),
                       dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       grad.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       centers.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return dist, grad, centers


def ddm_weight(dir_map: np.ndarray, dist_map: np.ndarray, vecs: np.ndarray):
    """DirectionLabelMake DDM loss-weight map in one call; ``vecs`` is the
    (C, 2) LABEL_TO_VECTOR table for C = num_angles + 1. None without a
    compiler."""
    lib = _load_lm()
    if lib is None:
        return None
    dir_map = _i32(dir_map)
    h, w = dir_map.shape
    dist = np.ascontiguousarray(np.asarray(dist_map, np.float32))
    vecs = _i32(vecs)
    out = np.zeros((h, w), np.float32)
    lib.ddm_weight(dir_map.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                   dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
                   len(vecs), vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def hv_map(inst: np.ndarray, boxes: np.ndarray):
    """HoverNet HV coordinate maps in one call; ``boxes`` is (nb, 5) int32
    rows (id, y0, y1, x0, x1), stop-exclusive, already padded+clamped.
    Returns (H, W, 2) f32 (x, y) or None without a compiler."""
    lib = _load_lm()
    if lib is None:
        return None
    inst = _i32(inst)
    h, w = inst.shape
    boxes = _i32(boxes).reshape(-1, 5)
    out = np.zeros((h, w, 2), np.float32)
    lib.hv_map(inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, len(boxes),
               boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def dist_cdt_map(inst: np.ndarray, boxes: np.ndarray, inst_norm: bool = True):
    """DIST chessboard distance map in one call (same ``boxes`` contract as
    :func:`hv_map`); (H, W) f32 or None without a compiler."""
    lib = _load_lm()
    if lib is None:
        return None
    inst = _i32(inst)
    h, w = inst.shape
    boxes = _i32(boxes).reshape(-1, 5)
    out = np.zeros((h, w), np.float32)
    lib.dist_cdt_map(inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, len(boxes),
                     boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), int(inst_norm),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def bound_map(inst: np.ndarray, r0: int, r1: int):
    lib = _load_lm()
    if lib is None:
        return None
    inst = _i32(inst)
    h, w = inst.shape
    out = np.zeros((h, w), np.uint8)
    lib.bound_map(inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, r0, r1,
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out > 0


def label_cc8(mask: np.ndarray):
    lib = _load()
    if lib is None:
        from ..utils.morphology import label as np_impl
        lab = np_impl(mask != 0, connectivity=2)
        return lab, int(lab.max())
    h, w = mask.shape
    m = np.ascontiguousarray((mask != 0).astype(np.uint8))
    out = np.zeros((h, w), np.int32)
    n = lib.label_cc8(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, int(n)
