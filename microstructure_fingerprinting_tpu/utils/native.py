"""On-demand compilation + ctypes bindings for the native host kernels.

Where the reference leans on Numba-JITted machine code for its host hot
loops (mf_utils.py:218-224 etc.), this framework's host-side hot loop is the
float64 candidate re-scoring; its gather/lerp kernel lives in
native/mf_native.cpp and is compiled here with g++ on first use (cached as a
shared object next to the source). Everything degrades gracefully to NumPy
when no compiler is available (models/refine.py checks ``available()``).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "mf_native.cpp")


def _so_path():
    """Build next to the source when writable, else in a user cache dir
    (installed site-packages are often read-only)."""
    src_dir = os.path.dirname(_SRC)
    if os.access(src_dir, os.W_OK):
        return os.path.join(src_dir, "mf_native.so")
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "microstructure_fingerprinting_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "mf_native.so")


_SO = _so_path()


def _compile():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        # retry without OpenMP (still beats NumPy)
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                            "-o", _SO, _SRC],
                           check=True, capture_output=True, timeout=120)
            return True
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.isfile(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.interp_columns_f64.argtypes = [dp, ip, dp, dp, ip, ip, dp, dp,
                                           ip, i64, i64, i64, i64, i64, i64,
                                           dp]
        lib.interp_columns_f64.restype = None
        lib.candidate_grams_f64.argtypes = [dp, dp, i64, i64, i64, i64,
                                            dp, dp]
        lib.candidate_grams_f64.restype = None
        _LIB = lib
        return _LIB


def available():
    return _load() is not None


def interp_columns_f64(xs, cnt, ys, gdir, lo, hi, wg, newdir, atom_ids,
                       out=None):
    """Native rotated-column interpolation; see mf_native.cpp.
    Returns (B, M, Nseq) candidate-major columns (written into ``out``
    when given, avoiding a copy)."""
    lib = _load()
    assert lib is not None
    B, M = atom_ids.shape
    Nseq = gdir.shape[0]
    S, Kmax, N = ys.shape
    if out is None:
        out = np.empty((B, M, Nseq), dtype=np.float64)
    assert out.flags["C_CONTIGUOUS"] and out.shape == (B, M, Nseq)
    lib.interp_columns_f64(
        np.ascontiguousarray(xs, np.float64),
        np.ascontiguousarray(cnt, np.int32),
        np.ascontiguousarray(ys, np.float64),
        np.ascontiguousarray(gdir, np.float64),
        np.ascontiguousarray(lo, np.int32),
        np.ascontiguousarray(hi, np.int32),
        np.ascontiguousarray(wg, np.float64),
        np.ascontiguousarray(newdir, np.float64),
        np.ascontiguousarray(atom_ids, np.int32),
        B, Nseq, S, Kmax, N, M, out)
    return out


def candidate_grams_f64(cols, y):
    """Native per-candidate Gram scalars: cols (C, B, M, Nseq), y (B, Nseq)
    -> (G (C, C, B, M), Y (C, B, M))."""
    lib = _load()
    assert lib is not None
    C, B, M, Nseq = cols.shape
    G = np.empty((C, C, B, M), dtype=np.float64)
    Yv = np.empty((C, B, M), dtype=np.float64)
    lib.candidate_grams_f64(np.ascontiguousarray(cols, np.float64),
                            np.ascontiguousarray(y, np.float64),
                            C, B, Nseq, M, G, Yv)
    return G, Yv
