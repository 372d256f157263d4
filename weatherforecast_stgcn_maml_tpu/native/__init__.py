"""ctypes bindings for the native host-side pipeline (native/wf_native.cpp).

Every function has a pure-numpy fallback, so the framework works without the
compiled library; when `libwf_native.so` is present (built by `make -C
native`, or on demand via `build()`), graph construction and feature
preprocessing switch to the fused single-pass C++ implementations. Use
`available()` to check and `set_enabled(False)` to force the numpy path
(tests compare both).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libwf_native.so")

_lib = None
_enabled = True


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.path.exists(_SO_PATH):
        lib = ctypes.CDLL(_SO_PATH)
        for name in (
            "wf_knn_edges",
            "wf_normalized_adjacency",
            "wf_nan_fill_stats",
            "wf_normalize",
            "wf_gather_windows",
        ):
            getattr(lib, name).restype = None
        _lib = lib
    return _lib


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree; returns availability."""
    global _lib
    if os.path.exists(_SO_PATH):
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    _lib = None
    return _load() is not None


def available() -> bool:
    return _enabled and _load() is not None


def set_enabled(flag: bool) -> None:
    global _enabled
    _enabled = flag


def knn_edges_native(positions: np.ndarray, k: int) -> np.ndarray | None:
    if not available():
        return None
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    n = pos.shape[0]
    out = np.empty((n * k, 2), dtype=np.int64)
    _load().wf_knn_edges(
        _ptr(pos), ctypes.c_int64(n), ctypes.c_int64(k), _ptr(out)
    )
    return out


def normalized_adjacency_native(
    edges: np.ndarray, num_nodes: int, pad_to: int
) -> np.ndarray | None:
    if not available():
        return None
    e = _i64(edges)
    out = np.empty((pad_to, pad_to), dtype=np.float32)
    _load().wf_normalized_adjacency(
        _ptr(e),
        ctypes.c_int64(len(e)),
        ctypes.c_int64(num_nodes),
        ctypes.c_int64(pad_to),
        _ptr(out),
    )
    return out


def nan_fill_stats_native(data: np.ndarray):
    """In-place NaN fill of [..., C]; returns (mean[C], std[C]) or None."""
    if not available():
        return None
    if not (data.dtype == np.float32 and data.flags.c_contiguous):
        return None
    c = data.shape[-1]
    rows = data.size // c
    mean = np.empty(c, np.float32)
    std = np.empty(c, np.float32)
    _load().wf_nan_fill_stats(
        _ptr(data), ctypes.c_int64(rows), ctypes.c_int64(c), _ptr(mean), _ptr(std)
    )
    return mean, std


def normalize_native(data: np.ndarray, mean: np.ndarray, std: np.ndarray) -> bool:
    """In-place z-score of [..., C]; returns False if unavailable."""
    if not available():
        return False
    if not (data.dtype == np.float32 and data.flags.c_contiguous):
        return False
    c = data.shape[-1]
    _load().wf_normalize(
        _ptr(data),
        ctypes.c_int64(data.size // c),
        ctypes.c_int64(c),
        _ptr(_f32(mean)),
        _ptr(_f32(std)),
    )
    return True


def gather_windows_native(
    features: np.ndarray, anchors: np.ndarray, window: int, horizon: int, y_channels: int
):
    """Materialize (x [S,W,N,C], y [S,H,N,yc]) window batches, or None."""
    if not available():
        return None
    f = features
    if not (f.dtype == np.float32 and f.flags.c_contiguous):
        return None
    t, n, c = f.shape
    a = _i64(anchors)
    s = len(a)
    if s and (a.min() < window or a.max() + horizon >= t):
        # The C++ gather memcpy's blindly; an out-of-range anchor would read
        # out-of-bounds memory and silently corrupt training data where the
        # numpy fallback raises and the jit path clamps. Fail loudly here.
        raise ValueError(
            f"anchor out of range: need window <= a <= T-1-horizon "
            f"(window={window}, horizon={horizon}, T={t}, "
            f"anchors [{a.min()}, {a.max()}])"
        )
    x = np.empty((s, window, n, c), np.float32)
    y = np.empty((s, horizon, n, y_channels), np.float32)
    _load().wf_gather_windows(
        _ptr(f),
        ctypes.c_int64(t),
        ctypes.c_int64(n),
        ctypes.c_int64(c),
        _ptr(a),
        ctypes.c_int64(s),
        ctypes.c_int64(window),
        ctypes.c_int64(horizon),
        ctypes.c_int64(y_channels),
        _ptr(x),
        _ptr(y),
    )
    return x, y
