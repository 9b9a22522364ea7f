"""Loader for the native C++ I/O runtime (ucgio.cpp).

Builds the shared library with g++ on first use (cached beside the source);
falls back to None if no toolchain is available, in which case the pure-Python
I/O paths are used.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ucgio.cpp")
_SO = os.path.join(_HERE, "libucgio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Returns the loaded ctypes library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        lib.ucgio_write_dump_frame.restype = ctypes.c_int
        lib.ucgio_write_dump_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_char_p,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ucgio_parse_rows.restype = ctypes.c_long
        lib.ucgio_parse_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def write_dump_frame(path: str, append: bool, step: int, box_lo, box_hi,
                    bounds: str, header: str, cols, int_mask) -> bool:
    """cols: list of 1-D float64 numpy arrays (one per column).
    Returns True when the native path handled the write."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return False
    natoms = len(cols[0])
    ncols = len(cols)
    block = np.ascontiguousarray(np.stack(cols, axis=0), dtype=np.float64)
    lo = np.ascontiguousarray(box_lo, dtype=np.float64)
    hi = np.ascontiguousarray(box_hi, dtype=np.float64)
    im = np.ascontiguousarray(int_mask, dtype=np.int32)
    rc = lib.ucgio_write_dump_frame(
        path.encode(), int(append), int(step), natoms, ncols,
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        bounds.encode(), header.encode(),
        block.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return rc == 0


def parse_rows(text: bytes, nrows: int, maxcols: int):
    """Parse nrows whitespace-numeric lines from ``text``.  Returns
    (rows (nrows, maxcols) float64, ncols (nrows,) int32) or None."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    rows = np.zeros((nrows, maxcols), dtype=np.float64)
    ncols = np.zeros(nrows, dtype=np.int32)
    got = lib.ucgio_parse_rows(
        text, len(text), nrows, maxcols,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ncols.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if got != nrows:
        return None
    return rows, ncols
