"""Native (C++) host-pipeline components, bound via ctypes.

The TPU compute path is jax/XLA/Pallas; the host-side data pipeline is
where native code pays off (the reference's equivalent work was done by
scipy/h5py). Libraries are built lazily with g++ on first use and cached
next to the sources; every consumer has a pure-Python fallback, so the
framework works identically without a toolchain.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_lib() -> Optional[Path]:
    src = _NATIVE_DIR / "ylm.cpp"
    out = _NATIVE_DIR / "libylm.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def get_ylm_lib() -> Optional[ctypes.CDLL]:
    """The compiled ylm library, building it on first use; None when no
    toolchain is available (callers fall back to scipy)."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    path = _build_lib()
    if path is None:
        _BUILD_FAILED = True
        return None
    lib = ctypes.CDLL(str(path))
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.ylm_field.argtypes = [dp, dp, dp, ctypes.c_int, ctypes.c_int, ctypes.c_int, fp]
    lib.ylm_field.restype = ctypes.c_int
    lib.ylm_field_ex.argtypes = [
        dp, dp, dp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, fp,
    ]
    lib.ylm_field_ex.restype = ctypes.c_int
    lib.ylm_fields.argtypes = [dp, dp, dp, ctypes.c_int, ip, ip, ctypes.c_int, fp]
    lib.ylm_fields.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def ylm_field_native(
    x: np.ndarray, y: np.ndarray, z: np.ndarray, m: int, l: int,  # noqa: E741
    normalize: bool = True,
) -> Optional[np.ndarray]:
    """Native |Y_lm * r| field; None if the native library is unavailable.

    ``normalize=True`` applies the reference's complex lexicographic min-max
    normalisation. NOTE: that normalisation is numerically ill-conditioned —
    symmetric grids produce exact real-part ties in the complex ordering, so
    a 1e-15 perturbation can flip which point is "min" and shift the whole
    field; scipy-path and native-path outputs may legitimately differ for
    tie-affected (l, m). The unnormalised field is exact (~1e-16 vs the
    closed formula)."""
    lib = get_ylm_lib()
    if lib is None:
        return None
    n = len(x)
    assert len(y) == n and len(z) == n, "native path expects a cubic grid"
    out = np.empty(n * n * n, np.float32)
    rc = lib.ylm_field_ex(
        np.ascontiguousarray(x, np.float64),
        np.ascontiguousarray(y, np.float64),
        np.ascontiguousarray(z, np.float64),
        n, int(l), int(m), int(normalize), out,
    )
    if rc != 0:
        raise ValueError(f"ylm_field failed with code {rc} (l={l}, m={m})")
    return out.reshape(n, n, n)
