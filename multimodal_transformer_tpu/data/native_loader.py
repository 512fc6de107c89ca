"""ctypes bindings for the native data plane (native/fastload.cpp).

Provides the C++ fast path for L0 table parsing and L1 windowing assignment;
the pandas/numpy implementations in send.py / windowing.py remain the
reference semantics (and the fallback when the shared library has not been
built).  Build with `make -C native`; auto-built on first use if a toolchain
is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastload.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.parse_table.restype = ctypes.c_int
    lib.parse_table.argtypes = [
        ctypes.c_char_p, ctypes.c_char,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_char_p)]
    lib.window_assign.restype = ctypes.c_int64
    lib.window_assign.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
    lib.fastload_free.restype = None
    lib.fastload_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_table(path: str, fmt: str) -> Optional[Tuple[np.ndarray,
                                                       List[str]]]:
    """Parse a numeric table.  Returns (data [rows, cols] float32 with NaNs
    for non-numeric cells, column labels) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    delim = {"tsv": b"\t", "ssv": b" ", "csv": b",", "txt": b","}[fmt]
    data_p = ctypes.POINTER(ctypes.c_float)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    header_p = ctypes.c_char_p()
    rc = lib.parse_table(path.encode(), ctypes.c_char(delim),
                         ctypes.byref(data_p), ctypes.byref(rows),
                         ctypes.byref(cols), ctypes.byref(header_p))
    if rc != 0:
        return None
    n, c = rows.value, cols.value
    arr = np.ctypeslib.as_array(data_p, shape=(n, c)).copy()
    header = header_p.value.decode().split("\n")
    lib.fastload_free(data_p)
    lib.fastload_free(ctypes.cast(header_p, ctypes.c_void_p))
    return arr, header


def window_assign(times: np.ndarray,
                  window_size: float) -> Optional[Tuple[np.ndarray,
                                                        np.ndarray]]:
    """Native windowing assignment; returns (starts, counts) per window."""
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(times, dtype=np.float64)
    starts_p = ctypes.POINTER(ctypes.c_int64)()
    counts_p = ctypes.POINTER(ctypes.c_int64)()
    nw = lib.window_assign(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(t),
        float(window_size), ctypes.byref(starts_p), ctypes.byref(counts_p))
    if nw < 0:
        return None
    if nw == 0:
        lib.fastload_free(starts_p)
        lib.fastload_free(counts_p)
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    starts = np.ctypeslib.as_array(starts_p, shape=(nw,)).copy()
    counts = np.ctypeslib.as_array(counts_p, shape=(nw,)).copy()
    lib.fastload_free(starts_p)
    lib.fastload_free(counts_p)
    return starts, counts
