"""Disk setup cache (utils/setupcache.py): AMG hierarchies keyed by matrix
content replay bit-identically (STATUS r2 gap: setup caching to disk)."""
import shutil

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from knp_emi_cgx_tpu.solvers.amg import SmoothedAggregationAMG
from knp_emi_cgx_tpu.utils import setupcache


def _laplacian2d(n):
    I = sp.identity(n)
    T = sp.diags([-1, 2, -1], [-1, 0, 1], shape=(n, n))
    return (sp.kron(I, T) + sp.kron(T, I)).tocsr()


def test_amg_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("KNP_EMI_CACHE_DIR", str(tmp_path))
    A = _laplacian2d(48)
    amg_miss = SmoothedAggregationAMG(A, cache=True)
    amg_hit = SmoothedAggregationAMG(A, cache=True)
    amg_ref = SmoothedAggregationAMG(A)
    assert len(amg_hit.levels) == len(amg_miss.levels)
    r = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    y_miss = np.asarray(amg_miss(r))
    np.testing.assert_array_equal(np.asarray(amg_hit(r)), y_miss)
    np.testing.assert_array_equal(np.asarray(amg_ref(r)), y_miss)
    assert len(list(tmp_path.glob("amg_*.npz"))) == 1


def test_amg_cache_key_sensitivity(tmp_path, monkeypatch):
    monkeypatch.setenv("KNP_EMI_CACHE_DIR", str(tmp_path))
    A = _laplacian2d(24)
    SmoothedAggregationAMG(A, cache=True)
    B = A.copy()
    B.data = B.data * 1.5          # different values -> different key
    SmoothedAggregationAMG(B, cache=True)
    assert len(list(tmp_path.glob("amg_*.npz"))) == 2


def test_cache_corruption_is_a_miss(tmp_path, monkeypatch):
    monkeypatch.setenv("KNP_EMI_CACHE_DIR", str(tmp_path))
    A = _laplacian2d(24)
    SmoothedAggregationAMG(A, cache=True)
    f = next(tmp_path.glob("amg_*.npz"))
    f.write_bytes(b"garbage")
    amg = SmoothedAggregationAMG(A, cache=True)   # silently rebuilds
    r = jnp.asarray(np.random.default_rng(1).standard_normal(A.shape[0]))
    assert np.all(np.isfinite(np.asarray(amg(r))))
