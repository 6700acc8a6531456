"""ctypes bindings for the native mesh-ops library.

Compiled on first use with g++ (cached next to the source); every caller
checks :func:`available` and falls back to the numpy implementation, so the
framework works without a toolchain — just slower on the host stages.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "meshops.cpp")
_LIB_PATH = os.path.join(_HERE, "libmeshops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                _SRC,
                "-o",
                _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.mc_slab.restype = ctypes.c_longlong
        lib.mc_slab.argtypes = [
            _F32P,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_int,
            _I64P,
            _I64P,
            ctypes.c_longlong,
            _I64P,
            _I64P,
            _I64P,
            _I64P,
            _I64P,
            ctypes.c_longlong,
            _I64P,
            _F32P,
        ]
        lib.mc_blocks.restype = ctypes.c_longlong
        lib.mc_blocks.argtypes = [
            _F32P,
            _I64P,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_int,
            _I64P,
            _I64P,
            ctypes.c_longlong,
            _I64P,
            _I64P,
            _I64P,
            _I64P,
            _I64P,
            ctypes.c_longlong,
            _I64P,
            _F32P,
        ]
        lib.cells_to_tri_keys.restype = ctypes.c_longlong
        lib.cells_to_tri_keys.argtypes = [
            _I64P,
            _U8P,
            ctypes.c_longlong,
            ctypes.c_longlong,
            _I64P,
            _I64P,
            ctypes.c_longlong,
            _I64P,
            _I64P,
            ctypes.c_longlong,
            _I64P,
        ]
        lib.weld.restype = ctypes.c_longlong
        lib.weld.argtypes = [_I64P, ctypes.c_longlong, _I64P, _I64P]
        lib.write_stl_soup.restype = ctypes.c_longlong
        lib.write_stl_soup.argtypes = [ctypes.c_char_p, _F32P, ctypes.c_longlong]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def mc_slab(
    corners: np.ndarray, z0: int, midpoint: bool
) -> tuple[np.ndarray, np.ndarray]:
    """Native twin of ops.marching_cubes._slab_triangles.  ``corners`` is
    f32[sz+1, r1, r1]; returns (keys i64[T,3], pos f32[T,3,3] grid units)."""
    from ..ops.marching_cubes import (
        CORNERS,
        EDGE_AXIS,
        EDGE_ORIGIN,
        EDGES,
        triangle_table,
    )

    lib = _load()
    assert lib is not None
    tri_edges, n_tris = triangle_table()
    corners = np.ascontiguousarray(corners, dtype=np.float32)
    sz = corners.shape[0] - 1
    r1 = corners.shape[1]
    capacity = max(1 << 16, 4 * sz * r1 * 8)
    te = np.ascontiguousarray(tri_edges.reshape(-1))
    nt = np.ascontiguousarray(n_tris)
    ea = np.ascontiguousarray(EDGE_AXIS)
    eo = np.ascontiguousarray(EDGE_ORIGIN.reshape(-1))
    e0 = np.ascontiguousarray(EDGES[:, 0])
    e1 = np.ascontiguousarray(EDGES[:, 1])
    co = np.ascontiguousarray(CORNERS.reshape(-1))
    while True:
        keys = np.empty((capacity * 3,), dtype=np.int64)
        pos = np.empty((capacity * 9,), dtype=np.float32)
        n = lib.mc_slab(
            corners.reshape(-1),
            sz,
            r1,
            int(z0),
            1 if midpoint else 0,
            te,
            nt,
            tri_edges.shape[1],
            ea,
            eo,
            e0,
            e1,
            co,
            capacity,
            keys,
            pos,
        )
        if n >= 0:
            return keys[: n * 3].reshape(n, 3), pos[: n * 9].reshape(n, 3, 3)
        capacity *= 2


def mc_blocks(
    corners: np.ndarray, coords: np.ndarray, resolution: int, midpoint: bool
) -> tuple[np.ndarray, np.ndarray]:
    """Native twin of ops.marching_cubes._block_triangles over K blocks.
    ``corners`` is f32[K, nz+1, ny+1, nx+1]; ``coords`` is i64[K, 3] global
    (x0, y0, z0) cell origins.  Returns (keys i64[T,3], pos f32[T,3,3])."""
    from ..ops.marching_cubes import (
        CORNERS,
        EDGE_AXIS,
        EDGE_ORIGIN,
        EDGES,
        triangle_table,
    )

    lib = _load()
    assert lib is not None
    tri_edges, n_tris = triangle_table()
    corners = np.ascontiguousarray(corners, dtype=np.float32)
    coords = np.ascontiguousarray(coords, dtype=np.int64)
    K = corners.shape[0]
    nz, ny, nx = (corners.shape[1] - 1, corners.shape[2] - 1, corners.shape[3] - 1)
    capacity = max(1 << 16, 2 * K * nz * max(ny, nx))
    te = np.ascontiguousarray(tri_edges.reshape(-1))
    nt = np.ascontiguousarray(n_tris)
    ea = np.ascontiguousarray(EDGE_AXIS)
    eo = np.ascontiguousarray(EDGE_ORIGIN.reshape(-1))
    e0 = np.ascontiguousarray(EDGES[:, 0])
    e1 = np.ascontiguousarray(EDGES[:, 1])
    co = np.ascontiguousarray(CORNERS.reshape(-1))
    while True:
        keys = np.empty((capacity * 3,), dtype=np.int64)
        pos = np.empty((capacity * 9,), dtype=np.float32)
        n = lib.mc_blocks(
            corners.reshape(-1),
            coords.reshape(-1),
            K,
            nz,
            ny,
            nx,
            int(resolution) + 1,
            1 if midpoint else 0,
            te,
            nt,
            tri_edges.shape[1],
            ea,
            eo,
            e0,
            e1,
            co,
            capacity,
            keys,
            pos,
        )
        if n >= 0:
            return keys[: n * 3].reshape(n, 3), pos[: n * 9].reshape(n, 3, 3)
        capacity *= 2


def cells_to_tri_keys(
    cells_idx: np.ndarray, cells_cfg: np.ndarray, resolution: int
) -> np.ndarray:
    """Native twin of export.compact._cells_to_tri_keys_np: expands
    (global cell index, config) pairs to i64[T, 3] global edge keys."""
    from ..ops.marching_cubes import EDGE_AXIS, EDGE_ORIGIN, triangle_table

    lib = _load()
    assert lib is not None
    tri_edges, n_tris = triangle_table()
    cells_idx = np.ascontiguousarray(cells_idx, dtype=np.int64)
    cells_cfg = np.ascontiguousarray(cells_cfg, dtype=np.uint8)
    te = np.ascontiguousarray(tri_edges.reshape(-1))
    nt = np.ascontiguousarray(n_tris)
    ea = np.ascontiguousarray(EDGE_AXIS)
    eo = np.ascontiguousarray(EDGE_ORIGIN.reshape(-1))
    capacity = max(1 << 12, int(tri_edges.shape[1]) * cells_idx.shape[0])
    keys = np.empty((capacity * 3,), dtype=np.int64)
    n = lib.cells_to_tri_keys(
        cells_idx,
        cells_cfg,
        cells_idx.shape[0],
        int(resolution),
        te,
        nt,
        tri_edges.shape[1],
        ea,
        eo,
        capacity,
        keys,
    )
    assert n >= 0
    return keys[: n * 3].reshape(n, 3)


def weld(keys: np.ndarray) -> tuple[int, np.ndarray, np.ndarray]:
    """Exact-key vertex welding.  Returns (num_unique, inverse, first_idx)."""
    lib = _load()
    assert lib is not None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n = keys.shape[0]
    inverse = np.empty((n,), dtype=np.int64)
    first_idx = np.empty((n,), dtype=np.int64)
    num = lib.weld(keys, n, inverse, first_idx)
    return int(num), inverse, first_idx[:num]


def write_stl_soup(path: str, tris: np.ndarray) -> int:
    lib = _load()
    assert lib is not None
    tris = np.ascontiguousarray(tris, dtype=np.float32)
    n = tris.shape[0]
    return int(lib.write_stl_soup(path.encode(), tris.reshape(-1), n))
