"""ctypes bindings to the native data-pipeline library (native/dataio.cpp).

Provides drop-in accelerated versions of IDX parsing and shuffled batch
gathering.  The library is built on demand with ``make`` (g++ + zlib); if
unavailable, callers fall back to the pure-numpy implementations in
data/datasets.py -- behavior is identical, verified by tests.
"""
from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
from typing import Optional

import numpy as np

__all__ = ["load_native", "native_available", "read_idx_native", "gather_rows"]

logger = logging.getLogger(__name__)

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libdataio.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False

_IDX_DTYPES = {
    0x08: np.uint8, 0x09: np.int8, 0x0B: np.int16,
    0x0C: np.int32, 0x0D: np.float32, 0x0E: np.float64,
}


def load_native(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    try:
        if not _LIB_PATH.exists() and build and _NATIVE_DIR.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        if not _LIB_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.dataio_idx_info.restype = ctypes.c_int
        lib.dataio_idx_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dataio_read_idx.restype = ctypes.c_int64
        lib.dataio_read_idx.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.dataio_gather_f32.restype = None
        lib.dataio_gather_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.dataio_gather_i32.restype = None
        lib.dataio_gather_i32.argtypes = lib.dataio_gather_f32.argtypes
        _lib = lib
    except Exception as e:  # missing toolchain, etc. -- numpy fallback
        logger.info("native dataio unavailable (%s); using numpy fallback", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return load_native() is not None


def read_idx_native(path) -> Optional[np.ndarray]:
    """IDX file -> numpy array via the native parser; None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    dims = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int(0)
    code = lib.dataio_idx_info(str(path).encode(), dims, ctypes.byref(ndim))
    if code < 0:
        raise ValueError(f"{path}: not an IDX file (native parser code {code})")
    dtype = _IDX_DTYPES[code]
    shape = tuple(int(dims[i]) for i in range(ndim.value))
    out = np.empty(shape, dtype=dtype)
    n = lib.dataio_read_idx(
        str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if n < 0:
        raise ValueError(f"{path}: IDX payload read failed (code {n})")
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """dst[i] = src[idx[i]] with the multithreaded native gather when
    possible; numpy fancy indexing otherwise."""
    lib = load_native()
    src = np.ascontiguousarray(src)
    if lib is None or src.dtype != np.float32 or src.ndim != 2:
        return src[idx]
    idx64 = np.ascontiguousarray(idx, dtype=np.int64)
    out = np.empty((idx64.shape[0], src.shape[1]), dtype=np.float32)
    lib.dataio_gather_f32(
        src.ctypes.data_as(ctypes.c_void_p),
        idx64.ctypes.data_as(ctypes.c_void_p),
        idx64.shape[0],
        src.shape[1],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
