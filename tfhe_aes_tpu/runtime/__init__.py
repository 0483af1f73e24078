"""Native (C++) host runtime with transparent numpy fallback.

Builds runtime/native.cpp with g++ on first import (cached as a .so next to
the source); every entry point has a numpy fallback so the framework works
without a toolchain.  See native.cpp for what lives here and why.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libtfheaes_native.so"
_SRC = _DIR / "native.cpp"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-pthread", str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.chacha20_fill_u64  # newest symbol: probe for a stale binary
    except (OSError, AttributeError):
        # Stale .so (e.g. built from an older native.cpp on another
        # machine, where checkout mtimes hide the skew): rebuild once.
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
    lib.signed_limbs_u64.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.balanced_residues_u64.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.ntt_rows_mod.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.chacha20_fill_u64.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_uint32]
    _lib = lib
    return _lib


def signed_limbs(v: np.ndarray, n_limbs: int) -> np.ndarray:
    """u64 [...] -> int8 [..., n_limbs] (native; numpy fallback)."""
    lib = get_lib()
    if lib is None:
        from ..utils import torus
        return torus.signed_limbs(v, n_limbs).astype(np.int8)
    v = np.ascontiguousarray(v, dtype=np.uint64)
    out = np.empty(v.shape + (n_limbs,), dtype=np.int8)
    lib.signed_limbs_u64(v.ctypes.data, out.ctypes.data, v.size, n_limbs)
    return out


def balanced_residues(v: np.ndarray, p: int) -> np.ndarray:
    """u64 [...] -> balanced int32 residues mod p (signed representative)."""
    lib = get_lib()
    v = np.ascontiguousarray(v, dtype=np.uint64)
    if lib is None:
        from ..utils import torus
        limbs = torus.signed_limbs(v, 8)
        acc = np.zeros(v.shape, dtype=np.int64)
        for i in range(8):
            acc += limbs[..., i] * pow(2, 8 * i, p)
        r = acc % p
        return np.where(r > p // 2, r - p, r).astype(np.int32)
    out = np.empty(v.shape, dtype=np.int32)
    lib.balanced_residues_u64(v.ctypes.data, out.ctypes.data, v.size, p)
    return out


def ntt_rows_mod(rows: np.ndarray, mat: np.ndarray, p: int) -> np.ndarray:
    """Balanced int32 rows [m, n] x canonical mat [n, n] -> balanced NTT."""
    lib = get_lib()
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    mat_c = np.ascontiguousarray(mat, dtype=np.int32)
    if lib is None:
        from ..utils import crt
        from ..ops import modular
        return modular.host_balanced(
            crt._matmul_mod_f64(rows.astype(np.int64), mat_c.astype(np.int64),
                                p), p).astype(np.int32)
    m, n = rows.shape
    out = np.empty((m, n), dtype=np.int32)
    lib.ntt_rows_mod(rows.ctypes.data, mat_c.ctypes.data, out.ctypes.data,
                     m, n, p)
    return out
