"""Engine layer: native host-side packing with Python fallback.

Mirrors the reference's engine split (``engine/__init__.py:1-5``: try the
native extension, else pure-Python fallback). The native core is C++ built
on demand with the system compiler and bound via ctypes (no pybind in this
environment); the fallback is the jnp implementation in
:mod:`quantize_tpu.quant.pack`. Both produce identical bit streams.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

from ..quant.pack import PackDescriptor
from ..quant.pack import tpack as _tpack_jnp
from ..quant.pack import tunpack as _tunpack_jnp

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "native", "tpack.cpp")
_CACHE_DIR = os.environ.get(
    "QUANTIZE_TPU_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "quantize_tpu_native")
)


def _build_lib() -> Optional[str]:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "libtpack.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except Exception:
        return None


def get_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build_lib()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.tpack_u32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.tunpack_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.quantize_channel_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def tpack(x, n_bits: int, signed: bool) -> Tuple[np.ndarray, PackDescriptor]:
    """Dense-pack integers; native path when available, jnp fallback."""
    lib = get_native()
    if lib is None:
        packed, des = _tpack_jnp(x, n_bits, signed)
        return np.asarray(packed), des
    des = PackDescriptor(n_bits, signed, tuple(np.shape(x)))
    lo, hi = (-(1 << (n_bits - 1)), (1 << (n_bits - 1)) - 1) if signed else (0, (1 << n_bits) - 1)
    v = np.clip(np.rint(np.asarray(x, np.float64)), lo, hi).astype(np.int32)
    if signed:
        v = v + (1 << (n_bits - 1))
    v = np.ascontiguousarray(v.reshape(-1))
    n = v.size
    out = np.zeros((-(-n * n_bits // 8),), np.uint8)
    lib.tpack_u32(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, n_bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, des


def tunpack(packed, des: PackDescriptor, dtype=np.float32) -> np.ndarray:
    lib = get_native()
    if lib is None:
        return np.asarray(_tunpack_jnp(packed, des, dtype))
    packed = np.ascontiguousarray(np.asarray(packed, np.uint8))
    n = int(np.prod(des.shape)) if des.shape else 1
    vals = np.empty((n,), np.int32)
    lib.tunpack_u32(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, des.n_bits,
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if des.signed:
        vals = vals - (1 << (des.n_bits - 1))
    return vals.reshape(des.shape).astype(dtype)
