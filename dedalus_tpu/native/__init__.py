"""
Native (C++/LAPACK) host kernels, loaded via ctypes.

Parity role: the reference's compiled layer (Cython CSR/solver kernels,
longdouble special-function internals). Compiled on first use with g++ and
cached next to the source; all callers fall back to scipy when unavailable.
Disable with DEDALUS_TPU_NATIVE=0.
"""

import ctypes
import os
import pathlib
import subprocess
import logging

import numpy as np

logger = logging.getLogger(__name__)

_HERE = pathlib.Path(__file__).parent
_SO = _HERE / "libpencil_kernels.so"
_SRC = _HERE / "pencil_kernels.cpp"

_lib = None


def _lapack_so():
    """Prefer scipy's bundled OpenBLAS (fast), fall back to system LAPACK."""
    import scipy
    libs = pathlib.Path(scipy.__file__).parent.parent / "scipy.libs"
    hits = sorted(libs.glob("libscipy_openblas*.so"))
    if hits:
        return str(hits[0])
    for cand in ["/lib/x86_64-linux-gnu/liblapack.so.3",
                 "/usr/lib/x86_64-linux-gnu/liblapack.so.3"]:
        if pathlib.Path(cand).exists():
            return cand
    return None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO), "-ldl"]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("DEDALUS_TPU_NATIVE", "1") == "0":
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lapack = _lapack_so()
        if lapack is None:
            raise RuntimeError("no LAPACK shared library found")
        rc = lib.init_lapack(lapack.encode())
        if rc != 0:
            raise RuntimeError(f"init_lapack({lapack}) failed with code {rc}")
        lib.batched_lu_factor.restype = ctypes.c_int
        lib.batched_lu_factor.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.batched_inverse.restype = ctypes.c_int
        lib.batched_inverse.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int]
        lib.jacobi_recurrence_ld.restype = None
        lib.jacobi_recurrence_ld.argtypes = [ctypes.c_int, ctypes.c_int] + \
            [ctypes.POINTER(ctypes.c_double)] * 5
        _lib = lib
        return _lib
    except Exception as exc:  # compiler or LAPACK missing: fall back to scipy
        logger.warning(f"Native kernels unavailable ({exc}); using scipy fallbacks")
        return None


def batched_inverse(A):
    """In-place-free batched inversion: (G, P, P) float64 -> inverses, or None."""
    lib = get_lib()
    if lib is None:
        return None
    A = np.ascontiguousarray(A, dtype=np.float64)
    out = A.copy()
    G, P, _ = out.shape
    rc = lib.batched_inverse(out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), G, P)
    if rc != 0:
        raise np.linalg.LinAlgError(f"Singular pencil matrix in group {rc - 1}")
    return out
