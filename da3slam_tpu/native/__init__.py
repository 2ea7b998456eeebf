"""Native (C++) runtime ops with ctypes bindings.

The shared library builds lazily on first use (g++, cached next to the
source); every entry point has a pure-Python fallback so the framework
works without a toolchain.  ``is_available()`` reports whether the native
path loaded.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "src" / "pointcloud.cpp"
_LIB_PATH = Path(__file__).parent / "libda3pc.so"
_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.voxel_downsample.restype = ctypes.c_int64
            lib.voxel_downsample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.write_ply.restype = ctypes.c_int
            lib.write_ply.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            lib.read_ply.restype = ctypes.c_int64
            lib.read_ply.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.write_3dgs_splats.restype = ctypes.c_int64
            lib.write_3dgs_splats.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ]
            _lib = lib
        except Exception:
            _load_failed = True
        return _lib


def is_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray | None):
    if a is None:
        return ctypes.POINTER(ctypes.c_uint8)()
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def voxel_downsample(
    points: np.ndarray, colors: np.ndarray | None = None, voxel: float = 0.01
) -> tuple[np.ndarray, np.ndarray | None]:
    """Average points (and colors) per occupied voxel.

    Native when available; numpy fallback otherwise.  Output order is
    unspecified (hash order).
    """
    points = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    n = points.shape[0]
    if colors is not None:
        colors = np.ascontiguousarray(colors, np.uint8).reshape(-1, 3)

    lib = _load()
    if lib is not None and n > 0:
        out_pts = np.empty_like(points)
        out_cols = np.empty_like(colors) if colors is not None else None
        m = lib.voxel_downsample(
            _fptr(points), _u8ptr(colors), n, ctypes.c_float(voxel),
            _fptr(out_pts), _u8ptr(out_cols),
        )
        if m >= 0:
            return out_pts[:m], (out_cols[:m] if out_cols is not None else None)

    # numpy fallback
    finite = np.isfinite(points).all(axis=1)
    pts = points[finite]
    cols = colors[finite] if colors is not None else None
    if pts.size == 0:
        return pts, cols
    keys = np.floor(pts / voxel).astype(np.int64)
    _, inverse, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    m = counts.shape[0]
    out_pts = np.zeros((m, 3), np.float64)
    np.add.at(out_pts, inverse, pts)
    out_pts = (out_pts / counts[:, None]).astype(np.float32)
    out_cols = None
    if cols is not None:
        oc = np.zeros((m, 3), np.float64)
        np.add.at(oc, inverse, cols)
        out_cols = np.clip(oc / counts[:, None] + 0.5, 0, 255).astype(np.uint8)
    return out_pts, out_cols


def write_ply_native(path, points: np.ndarray, colors: np.ndarray | None = None) -> bool:
    """Binary PLY via the C++ writer.  Returns False if native is absent
    (caller should fall back to the Python writer)."""
    lib = _load()
    if lib is None:
        return False
    points = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    if colors is not None:
        colors = np.ascontiguousarray(colors, np.uint8).reshape(-1, 3)
    rc = lib.write_ply(str(path).encode(), _fptr(points), _u8ptr(colors), points.shape[0])
    return rc == 0


def write_3dgs_splats_native(
    path,
    points_grid: np.ndarray,  # [V, H, W, 3] world points (strided grid)
    colors_grid: np.ndarray,  # [V, H, W, 3] uint8
    conf_grid: np.ndarray,  # [V, H, W]
    depth_grid: np.ndarray,  # [V, H, W]
    conf_threshold: float,
    opacity_scale: float,
    max_ratio: float = 8.0,
) -> int | None:
    """Fused anisotropic-splat PLY export (tangent frames + quats + filter +
    serialize in one C++ pass — see pointcloud.cpp:write_3dgs_splats).
    Returns the splat count, or None if native is absent (caller falls back
    to the NumPy path)."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points_grid, np.float32)
    cols = np.ascontiguousarray(colors_grid, np.uint8)
    conf = np.ascontiguousarray(conf_grid, np.float32)
    depth = np.ascontiguousarray(depth_grid, np.float32)
    V, H, W = depth.shape
    if pts.shape != (V, H, W, 3) or cols.shape != (V, H, W, 3):
        return None
    n = lib.write_3dgs_splats(
        str(path).encode(), _fptr(pts), _u8ptr(cols), _fptr(conf),
        _fptr(depth), V, H, W,
        ctypes.c_float(conf_threshold), ctypes.c_float(opacity_scale),
        ctypes.c_float(max_ratio),
    )
    return int(n) if n >= 0 else None


def read_ply_native(path) -> tuple[np.ndarray, np.ndarray | None] | None:
    """Binary PLY via the C++ reader; None if native absent or unsupported
    format (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    probe = lib.read_ply(str(path).encode(), None, None)
    if probe < 0:
        return None
    n, has_color = probe // 2, bool(probe % 2)
    pts = np.empty((n, 3), np.float32)
    cols = np.empty((n, 3), np.uint8) if has_color else None
    got = lib.read_ply(str(path).encode(), _fptr(pts), _u8ptr(cols))
    if got != n:
        return None
    return pts, cols
