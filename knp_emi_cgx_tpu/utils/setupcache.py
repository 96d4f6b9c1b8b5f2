"""Mesh-hash-keyed disk cache for expensive host-side setup products.

The AMG hierarchy build (aggregation + Galerkin triple products over 8
blocks x ~5 levels) dominates repeated-run setup at tissue scale (~46 s at
48^3, ~2.5 min at 64^3 on one core).  The hierarchy is a pure function of
the block CSR matrix and the setup parameters, so it is cached to
``.cache/`` keyed by a content hash; a hit replays as device uploads only.

Nothing here touches the hot path: lookups happen once per run, before the
first step.  Reference role: DOLFINx/FFCx cache compiled kernels under
``~/.cache/fenics`` for the same reason (SURVEY L0/L2 setup costs).
"""
from __future__ import annotations

import hashlib
import os

import numpy as np
import scipy.sparse as sp

_VERSION = 2   # bump to invalidate all entries on algorithm changes
# v2: coarse-level strength filtering removed (theta applies to the finest
# level only) — hierarchies built by v1 coarsen pathologically at scale


def cache_dir() -> str:
    d = os.environ.get("KNP_EMI_CACHE_DIR")
    if d is None:
        root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        d = os.path.join(root, ".cache")
    os.makedirs(d, exist_ok=True)
    return d


def content_key(*arrays, extra: str = "") -> str:
    """Stable hash of numpy array contents + a parameter string."""
    h = hashlib.sha256()
    h.update(f"v{_VERSION}:{extra}".encode())
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:32]


def _csr_to_dict(prefix: str, A: sp.csr_matrix, out: dict):
    out[f"{prefix}_indptr"] = A.indptr
    out[f"{prefix}_indices"] = A.indices
    out[f"{prefix}_data"] = A.data
    out[f"{prefix}_shape"] = np.asarray(A.shape)


def _csr_from_dict(prefix: str, d) -> sp.csr_matrix:
    return sp.csr_matrix(
        (d[f"{prefix}_data"], d[f"{prefix}_indices"], d[f"{prefix}_indptr"]),
        shape=tuple(d[f"{prefix}_shape"]))


def save_amg_hierarchy(key: str, levels, coarse_inv: np.ndarray):
    """levels: list of (A_csr, P_csr_or_None, Binv_csr, lam) host tuples."""
    out = {"n_levels": np.asarray(len(levels)),
           "coarse_inv": coarse_inv}
    for i, (A, P, B, lam) in enumerate(levels):
        _csr_to_dict(f"A{i}", A, out)
        _csr_to_dict(f"B{i}", B, out)
        out[f"lam{i}"] = np.asarray(lam)
        out[f"hasP{i}"] = np.asarray(P is not None)
        if P is not None:
            _csr_to_dict(f"P{i}", P.tocsr(), out)
    path = os.path.join(cache_dir(), f"amg_{key}.npz")
    tmp = path + f".tmp{os.getpid()}.npz"
    np.savez_compressed(tmp, **out)
    os.replace(tmp, path)


def load_amg_hierarchy(key: str):
    """Returns (levels, coarse_inv) or None on miss/corruption."""
    path = os.path.join(cache_dir(), f"amg_{key}.npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as d:
            nl = int(d["n_levels"])
            levels = []
            for i in range(nl):
                A = _csr_from_dict(f"A{i}", d)
                B = _csr_from_dict(f"B{i}", d)
                P = _csr_from_dict(f"P{i}", d) if bool(d[f"hasP{i}"]) else None
                lam = np.asarray(d[f"lam{i}"])
                # scalar (classic) or per-dof vector (per-component bounds)
                levels.append((A, P, B, float(lam) if lam.ndim == 0 else lam))
            return levels, np.asarray(d["coarse_inv"])
    except Exception:
        return None
