"""Native (C++) runtime components, built on demand with g++ via ctypes.

The reference's native surface is the MSDeformAttn CUDA extension
(downstream/OVIS/.../ops/src). Our TPU compute path is the JAX/Pallas core
(streamformer_tpu.ops.msdeform_attn); the native kernel here is the
OpenMP-parallel CPU implementation used for host-side preprocessing-scale
workloads and as an independent second oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmsdeform.so")
_SRC = os.path.join(_HERE, "msdeform.cpp")

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the native library if needed; returns the .so path."""
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
    ):
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
            _SRC, "-o", _LIB_PATH,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        import ctypes

        path = build()
        _lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        _lib.ms_deform_attn_forward.argtypes = [f32p, i32p, f32p, f32p, f32p] + [
            ctypes.c_int
        ] * 7
        _lib.ms_deform_attn_backward.argtypes = [
            f32p, i32p, f32p, f32p, f32p, f32p, f32p, f32p,
        ] + [ctypes.c_int] * 7
    return _lib


def ms_deform_attn_forward_np(value, shapes, loc, weight):
    """numpy forward through the native kernel."""
    import numpy as np

    lib = load()
    value = np.ascontiguousarray(value, np.float32)
    shapes_a = np.ascontiguousarray(shapes, np.int32)
    loc = np.ascontiguousarray(loc, np.float32)
    weight = np.ascontiguousarray(weight, np.float32)
    b, s, m, d = value.shape
    _, q, _, l, p, _ = loc.shape
    out = np.zeros((b, q, m * d), np.float32)

    def ptr(a, ty):
        return a.ctypes.data_as(ty)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ms_deform_attn_forward(
        ptr(value, f32p), ptr(shapes_a, i32p), ptr(loc, f32p),
        ptr(weight, f32p), ptr(out, f32p), b, s, m, d, q, l, p,
    )
    return out


def ms_deform_attn_backward_np(value, shapes, loc, weight, grad_out):
    import numpy as np

    lib = load()
    value = np.ascontiguousarray(value, np.float32)
    shapes_a = np.ascontiguousarray(shapes, np.int32)
    loc = np.ascontiguousarray(loc, np.float32)
    weight = np.ascontiguousarray(weight, np.float32)
    grad_out = np.ascontiguousarray(grad_out, np.float32)
    b, s, m, d = value.shape
    _, q, _, l, p, _ = loc.shape
    gv = np.zeros_like(value)
    gl = np.zeros_like(loc)
    gw = np.zeros_like(weight)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)

    def ptr(a, ty):
        return a.ctypes.data_as(ty)

    lib.ms_deform_attn_backward(
        ptr(value, f32p), ptr(shapes_a, i32p), ptr(loc, f32p),
        ptr(weight, f32p), ptr(grad_out, f32p), ptr(gv, f32p), ptr(gl, f32p),
        ptr(gw, f32p), b, s, m, d, q, l, p,
    )
    return gv, gl, gw
