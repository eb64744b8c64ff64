"""ctypes bindings for the native data-loader core (gather.cc).

The shared library is built on first use with the system g++ (one ~1 s
compile, atomically cached next to this file); every entry point has a
pure-numpy fallback so the loader works on hosts without a toolchain.
``ANERF_NO_NATIVE=1`` forces the fallback (used by the parity tests).

This is the native half of the data layer — the analog of the torch
DataLoader's C++ worker machinery the reference leans on
(reference core/load_data.py:71-84); the Python half (sampling policy,
collate, threading) stays in data/dataset.py + data/pipeline.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'gather.cc')
_SO = os.path.join(_HERE, f'_loader_{sys.platform}.so')

_lib = None
_tried = False


def _build():
    """Compile gather.cc and return a CDLL handle, or None.

    Builds to a unique temp name and dlopens THAT path: dlopen caches
    handles by pathname (and ctypes never dlcloses), so reloading a
    rebuilt library at the old ``_SO`` path would silently return the
    stale pre-rebuild handle.  The temp build is then os.replace()d
    into ``_SO`` so later processes skip the compile (atomic — safe
    under concurrent workers)."""
    fd, tmp = tempfile.mkstemp(suffix='.so', dir=_HERE)
    os.close(fd)
    try:
        subprocess.run(
            ['g++', '-O3', '-fopenmp', '-shared', '-fPIC', _SRC, '-o', tmp],
            check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(tmp)
        os.replace(tmp, _SO)
        return lib
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get('ANERF_NO_NATIVE'):
        return None
    lib = None
    if os.path.exists(_SO):
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            lib = None
    if lib is None or not hasattr(lib, 'sample_distinct'):
        lib = _build()  # stale/missing cached build -> fresh-path handle
    if lib is None or not hasattr(lib, 'sample_distinct'):
        return None  # degrade to the numpy fallbacks, never raise
    lib.gather_u8_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_void_p]
    lib.gather_u8_f32.restype = None
    lib.nonzero_u8.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_void_p]
    lib.nonzero_u8.restype = ctypes.c_int64
    lib.sample_distinct.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    lib.sample_distinct.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def gather_f32(row: np.ndarray, idxs: np.ndarray,
               scale: float = 1.0) -> np.ndarray:
    """``row[idxs].astype(float32) * scale`` in one fused pass.

    ``row``: (HW, C) pixel rows (uint8 fast path; any dtype via the
    numpy fallback), e.g. a memmap view from BaseH5Dataset._read_row.
    """
    row = np.asarray(row)
    lib = _load()
    if (lib is None or row.dtype != np.uint8
            or not row.flags['C_CONTIGUOUS'] or row.ndim != 2):
        out = row[idxs].astype(np.float32)
        if scale != 1.0:
            out *= np.float32(scale)
        return out
    idxs = np.ascontiguousarray(idxs, dtype=np.int64)
    n, c = len(idxs), row.shape[1]
    out = np.empty((n, c), np.float32)
    lib.gather_u8_f32(row.ctypes.data, idxs.ctypes.data, n, c,
                      ctypes.c_float(scale), out.ctypes.data)
    return out


def sample_distinct(valid_lists, u: np.ndarray) -> np.ndarray:
    """Distinct draw per row: row r picks ``u.shape[1]`` distinct entries
    of ``valid_lists[r]`` (an int32 array), uniformly without
    replacement, driven by the uniforms ``u[r]`` (partial Fisher-Yates,
    identical math in the native and numpy paths so the draw does not
    depend on toolchain availability).  Returns (rows, k) int32."""
    rows, k = u.shape
    out = np.empty((rows, k), np.int32)
    lens = np.array([len(v) for v in valid_lists], np.int64)
    lib = _load()
    if lib is not None and all(
            v.dtype == np.int32 and v.flags['C_CONTIGUOUS']
            for v in valid_lists):
        ptrs = (ctypes.c_void_p * rows)(
            *[v.ctypes.data for v in valid_lists])
        u = np.ascontiguousarray(u, dtype=np.float64)
        lib.sample_distinct(ptrs, lens.ctypes.data, u.ctypes.data,
                            rows, k, out.ctypes.data)
        return out
    for r in range(rows):
        v, L, swap = valid_lists[r], int(lens[r]), {}
        for i in range(k):
            j = min(i + int(u[r, i] * (L - i)), L - 1)
            out[r, i] = v[swap.get(j, j)]
            swap[j] = swap.get(i, i)
    return out


def nonzero(mask: np.ndarray) -> np.ndarray:
    """Indices of nonzero entries of a flat mask (np.where analog)."""
    mask = np.asarray(mask).reshape(-1)
    lib = _load()
    if lib is None or mask.dtype != np.uint8 \
            or not mask.flags['C_CONTIGUOUS']:
        return np.where(mask > 0)[0]
    out = np.empty(mask.shape[0], np.int64)
    k = lib.nonzero_u8(mask.ctypes.data, mask.shape[0], out.ctypes.data)
    return out[:k]
