"""ctypes bindings for the native (C++) host data pipeline.

Loads ``libtnml_data.so`` (built from ``native/data_core.cpp``), compiling
it on first use if a toolchain is available; every entry point silently
falls back to NumPy when the library is absent, so the native path is a
performance accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "data_core.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libtnml_data.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", "-o", _LIB_PATH, _SRC, "-lpthread",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC):
            _build()
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64, i32, u64, f64p, f32p, i64p, i32p = (
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        )
        lib.tnml_diagonals_dataset.argtypes = [
            i64, i32, ctypes.c_double, ctypes.c_double, u64, f64p, i32p,
        ]
        lib.tnml_psi_embed_f32.argtypes = [f32p, i64, f32p]
        lib.tnml_psi_embed_f64.argtypes = [f64p, i64, f64p]
        lib.tnml_max_pool_2x2_f64.argtypes = [f64p, i64, i32, i32, f64p]
        lib.tnml_shuffle_indices.argtypes = [i64p, i64, u64]
        lib.tnml_gather_rows_f32.argtypes = [f32p, i64p, i64, i64, f32p]
        lib.tnml_version.restype = i32
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def diagonals_dataset(
    n_samples: int, linear_dim: int = 5, sigma: float = 0.5,
    prob_zero: float = 0.5, seed: int = 0,
):
    """Native noisy-diagonals generator (same distribution as
    ``data.diagonals.create_dataset``; per-sample PRNG streams, so a given
    seed is reproducible independent of thread count)."""
    lib = get_lib()
    if lib is None:
        from tensornetworkforml_tpu.data.diagonals import create_dataset

        return create_dataset(n_samples, linear_dim, sigma, prob_zero, seed)
    data = np.empty((n_samples, linear_dim, linear_dim), dtype=np.float64)
    labels = np.empty(n_samples, dtype=np.int32)
    lib.tnml_diagonals_dataset(
        n_samples, linear_dim, sigma, prob_zero,
        np.uint64(seed if seed is not None else 0),
        _ptr(data, ctypes.c_double), _ptr(labels, ctypes.c_int32),
    )
    return data, labels.astype(np.int64)


def psi_embed(x: np.ndarray) -> np.ndarray:
    """Host psi embedding ``(..., N) -> (..., N, 2)`` via the native lib."""
    lib = get_lib()
    x = np.ascontiguousarray(x)
    if lib is None:
        half_pi_x = (np.pi / 2.0) * x
        return np.stack([np.sin(half_pi_x), np.cos(half_pi_x)], axis=-1)
    out = np.empty(x.shape + (2,), dtype=x.dtype)
    if x.dtype == np.float32:
        lib.tnml_psi_embed_f32(
            _ptr(x, ctypes.c_float), x.size, _ptr(out, ctypes.c_float)
        )
    elif x.dtype == np.float64:
        lib.tnml_psi_embed_f64(
            _ptr(x, ctypes.c_double), x.size, _ptr(out, ctypes.c_double)
        )
    else:
        raise TypeError(f"unsupported dtype {x.dtype}")
    return out


def max_pool_2x2(x: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from tensornetworkforml_tpu.data.mnist import max_pool_2x2 as np_pool

        return np_pool(x)
    x = np.ascontiguousarray(x, dtype=np.float64)
    b, h, w = x.shape
    out = np.empty((b, h // 2, w // 2), dtype=np.float64)
    lib.tnml_max_pool_2x2_f64(
        _ptr(x, ctypes.c_double), b, h, w, _ptr(out, ctypes.c_double)
    )
    return out


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        return np.random.default_rng(seed).permutation(n)
    idx = np.arange(n, dtype=np.int64)
    lib.tnml_shuffle_indices(_ptr(idx, ctypes.c_int64), n, np.uint64(seed))
    return idx


def gather_rows(data: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Contiguous batch gather ``out[k] = data[idx[k]]`` (float32 2-D)."""
    lib = get_lib()
    if lib is None or data.dtype != np.float32 or data.ndim != 2:
        return data[idx]
    data = np.ascontiguousarray(data)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    out = np.empty((len(idx), data.shape[1]), dtype=np.float32)
    lib.tnml_gather_rows_f32(
        _ptr(data, ctypes.c_float), _ptr(idx, ctypes.c_int64),
        len(idx), data.shape[1], _ptr(out, ctypes.c_float),
    )
    return out
