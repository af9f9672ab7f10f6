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

_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library; returns True on success."""
    if osp.exists(_LIB) and not force and osp.getmtime(_LIB) >= osp.getmtime(_SRC):
        return True
    try:
        subprocess.run(['g++', '-O3', '-march=native', '-shared', '-fPIC', '-o', _LIB, _SRC],
                       check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


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
