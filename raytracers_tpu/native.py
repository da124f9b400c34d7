"""ctypes bindings to the native C++ components (native/raytracer.cpp).

The native library provides:
  * an independent CPU reference renderer (golden images, semantics
    cross-check — the framework's analog of the reference suite's Rust
    implementation, SURVEY.md §2.1 N1),
  * a separate-phase benchmark entry (BVH ms / render ms, the reference
    driver's timing protocol),
  * a fast P3 PPM serializer.

Build with ``make -C native``.  All entry points raise ``NativeUnavailable``
if the shared library has not been built; callers treat the native path as
an optional accelerator/oracle.
"""
from __future__ import annotations

import ctypes
import os
from functools import lru_cache

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                         "libraytracer_native.so")


class NativeUnavailable(RuntimeError):
    pass


@lru_cache(maxsize=1)
def _lib():
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    except OSError as e:
        raise NativeUnavailable(
            f"native library not built (make -C native): {e}") from e
    lib.rt_render.restype = ctypes.c_int
    lib.rt_bench.restype = ctypes.c_int
    lib.rt_ppm.restype = ctypes.c_long
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except NativeUnavailable:
        return False


def _scene_arrays(spheres):
    c = np.ascontiguousarray(np.asarray(spheres.center), np.float32)
    r = np.ascontiguousarray(np.asarray(spheres.radius), np.float32)
    col = np.ascontiguousarray(np.asarray(spheres.color), np.float32)
    return c, r, col


_FP = ctypes.POINTER(ctypes.c_float)
_IP = ctypes.POINTER(ctypes.c_int32)
_DP = ctypes.POINTER(ctypes.c_double)


def render(spheres, look_from, look_at, fov, width, height,
           max_depth: int = 50) -> np.ndarray:
    """Render with the native CPU renderer -> packed int32 (h, w)."""
    lib = _lib()
    c, r, col = _scene_arrays(spheres)
    lf = np.asarray(look_from, np.float32)
    la = np.asarray(look_at, np.float32)
    out = np.zeros(width * height, np.int32)
    rc = lib.rt_render(c.ctypes.data_as(_FP), r.ctypes.data_as(_FP),
                       col.ctypes.data_as(_FP), c.shape[0],
                       lf.ctypes.data_as(_FP), la.ctypes.data_as(_FP),
                       ctypes.c_float(fov), width, height, max_depth,
                       out.ctypes.data_as(_IP))
    if rc != 0:
        raise RuntimeError(f"rt_render failed with code {rc}")
    return out.reshape(height, width)


def bench(spheres, look_from, look_at, fov, width, height,
          max_depth: int = 50, runs: int = 10):
    """Native CPU baseline timing: returns (bvh_ms, render_ms, image)."""
    lib = _lib()
    c, r, col = _scene_arrays(spheres)
    lf = np.asarray(look_from, np.float32)
    la = np.asarray(look_at, np.float32)
    out = np.zeros(width * height, np.int32)
    bvh_ms = ctypes.c_double()
    render_ms = ctypes.c_double()
    rc = lib.rt_bench(c.ctypes.data_as(_FP), r.ctypes.data_as(_FP),
                      col.ctypes.data_as(_FP), c.shape[0],
                      lf.ctypes.data_as(_FP), la.ctypes.data_as(_FP),
                      ctypes.c_float(fov), width, height, max_depth, runs,
                      ctypes.byref(bvh_ms), ctypes.byref(render_ms),
                      out.ctypes.data_as(_IP))
    if rc != 0:
        raise RuntimeError(f"rt_bench failed with code {rc}")
    return bvh_ms.value, render_ms.value, out.reshape(height, width)


def ppm_bytes(rgb: np.ndarray, height: int, width: int) -> bytes:
    """Fast P3 serialization of an (h*w, 3) uint8 array via the C writer."""
    lib = _lib()
    rgb = np.ascontiguousarray(rgb.astype(np.int32))
    packed = ((rgb[:, 0] << 16) | (rgb[:, 1] << 8) | rgb[:, 2]).astype(np.int32)
    size = lib.rt_ppm(packed.ctypes.data_as(_IP), height, width, None, 0)
    buf = ctypes.create_string_buffer(size)
    lib.rt_ppm(packed.ctypes.data_as(_IP), height, width, buf, size)
    return buf.raw
