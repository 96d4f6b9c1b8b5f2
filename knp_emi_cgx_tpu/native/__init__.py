"""ctypes loader for the native host kernels (see knp_native.cpp).

Builds the shared library on first use with g++ (no pybind11 in this
environment — plain C ABI + ctypes).  Every entry point has a pure-numpy
fallback in its caller, so the framework works even without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libknp_native.so")
_SRC = os.path.join(_HERE, "knp_native.cpp")

_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    if os.path.exists(_SO) and not force:
        if os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, text=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        pass
    try:
        # fallback: no OpenMP toolchain support
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, text=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.build_facets.restype = ctypes.c_int64
    lib.build_facets.argtypes = [
        ctypes.c_int64, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.aggregate.restype = ctypes.c_int64
    lib.aggregate.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.coalesce_coo.restype = ctypes.c_int64
    lib.coalesce_coo.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.partition_bfs.restype = None
    lib.partition_bfs.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return _lib


def build_facets(cells: np.ndarray):
    """Unique facets + facet->cell adjacency.  Returns (facets, facet_cells)
    or None if the native library is unavailable; facets come in first-seen
    order with sorted vertex ids."""
    lib = get_lib()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    n_cells, nv = cells.shape
    nfv = nv - 1
    # 3D packing limit: 21 bits per vertex id
    if nfv == 3 and cells.max() >= (1 << 21):
        return None
    out_f = np.empty((n_cells * nv, nfv), dtype=np.int32)
    out_c = np.empty((n_cells * nv, 2), dtype=np.int64)
    nf = lib.build_facets(n_cells, nv, cells, out_f.reshape(-1),
                          out_c.reshape(-1))
    if nf < 0:
        raise RuntimeError("Non-manifold mesh: facet shared by >2 cells")
    return out_f[:nf].copy(), out_c[:nf].copy()


def aggregate(indptr: np.ndarray, indices: np.ndarray):
    """Greedy SA aggregation.  Returns (agg, n_agg) or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    n = indptr.shape[0] - 1
    agg = np.empty(n, dtype=np.int64)
    n_agg = lib.aggregate(n, indptr, indices, agg)
    return agg, int(n_agg)


def coalesce_coo(keys: np.ndarray):
    """Sorted-unique + inverse for packed COO keys (np.unique equivalent).
    Returns (unique_sorted, inverse) or None."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    out_u = np.empty_like(keys)
    out_inv = np.empty(keys.shape[0], dtype=np.int32)
    nu = lib.coalesce_coo(keys.shape[0], keys, out_u, out_inv)
    return out_u[:nu].copy(), out_inv


def partition(indptr: np.ndarray, indices: np.ndarray, n_parts: int):
    """BFS region-growing partition of a graph.  Returns part ids or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    n = indptr.shape[0] - 1
    part = np.empty(n, dtype=np.int32)
    lib.partition_bfs(n, indptr, indices, np.int32(n_parts), part)
    return part
