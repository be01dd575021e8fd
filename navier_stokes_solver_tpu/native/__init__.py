"""Native (C++) host runtime: fast IO via a ctypes-loaded shared library.

The reference's host-side services (VTU serialization, gmsh mesh parsing)
are C++ inside deal.II; this package provides the same natively.  The
library builds on first use with the system ``g++`` (no pybind11 in the
image; plain C ABI + ctypes).  Every entry point has a pure-Python fallback
so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "native_available", "write_vtu_native", "read_msh_native"]

_SRC = os.path.join(os.path.dirname(__file__), "src", "nstpu_io.cpp")
_LIB_DIR = os.environ.get("NSTPU_NATIVE_DIR", os.path.dirname(__file__))
_LIB_PATH = os.path.join(_LIB_DIR, "libnstpu_io.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.nstpu_write_vtu.restype = ctypes.c_int
        lib.nstpu_write_vtu.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.nstpu_msh_open.restype = ctypes.c_void_p
        lib.nstpu_msh_open.argtypes = [ctypes.c_char_p]
        lib.nstpu_msh_counts.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_int64)
        ] * 5
        lib.nstpu_msh_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nstpu_msh_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def write_vtu_native(
    path: str,
    points: np.ndarray,
    conn: np.ndarray,
    velocity: np.ndarray,
    pressure: np.ndarray,
    partitioning: np.ndarray,
) -> bool:
    """C++ single-piece VTU writer. Returns False if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    points = np.ascontiguousarray(points, dtype=np.float64)
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    velocity = np.ascontiguousarray(velocity, dtype=np.float64)
    pressure = np.ascontiguousarray(pressure, dtype=np.float64)
    partitioning = np.ascontiguousarray(partitioning, dtype=np.float64)
    rc = lib.nstpu_write_vtu(
        path.encode(),
        _dptr(points), points.shape[0],
        _iptr(conn), conn.shape[0],
        _dptr(velocity), _dptr(pressure), _dptr(partitioning),
    )
    if rc != 0:
        raise OSError(f"nstpu_write_vtu failed with code {rc} for {path!r}")
    return True


def read_msh_native(path: str):
    """C++ gmsh MSH1/MSH2/MSH4.1 parser.

    Returns dict(nodes_xy [n,2], tri [t,3], tri_tag [t], quad [q,4],
    quad_tag [q], edges [e,2], edge_tag [e], tet [k,4], tet_tag [k]) or
    None if unavailable.  Raises ValueError on parse failure.
    """
    lib = get_lib()
    if lib is None:
        return None
    h = lib.nstpu_msh_open(path.encode())
    if not h:
        raise ValueError(f"failed to parse gmsh file {path!r}")
    try:
        counts = [ctypes.c_int64() for _ in range(5)]
        lib.nstpu_msh_counts(h, *[ctypes.byref(c) for c in counts])
        n_nodes, n_tri, n_quad, n_edges, n_tet = (c.value for c in counts)
        nodes_xy = np.empty((n_nodes, 2), dtype=np.float64)
        tri = np.empty((n_tri, 3), dtype=np.int32)
        tri_tag = np.empty(n_tri, dtype=np.int32)
        quad = np.empty((n_quad, 4), dtype=np.int32)
        quad_tag = np.empty(n_quad, dtype=np.int32)
        edges = np.empty((n_edges, 2), dtype=np.int32)
        edge_tag = np.empty(n_edges, dtype=np.int32)
        tet = np.empty((n_tet, 4), dtype=np.int32)
        tet_tag = np.empty(n_tet, dtype=np.int32)
        lib.nstpu_msh_fill(
            h, _dptr(nodes_xy), _iptr(tri), _iptr(tri_tag), _iptr(quad),
            _iptr(quad_tag), _iptr(edges), _iptr(edge_tag), _iptr(tet),
            _iptr(tet_tag),
        )
    finally:
        lib.nstpu_msh_close(h)
    return dict(
        nodes_xy=nodes_xy, tri=tri, tri_tag=tri_tag, quad=quad,
        quad_tag=quad_tag, edges=edges, edge_tag=edge_tag, tet=tet,
        tet_tag=tet_tag,
    )
