"""Sparse matrix kernels for the KNP-EMI operator.

The operator has *static sparsity* (semi-implicit linearisation: only values
change per step, SURVEY §7.1), stored CSR.  `csr_matvec` is the XLA
formulation (gather + segment_sum, fuses well and is TPU-compatible at any
size); a Pallas ELL kernel for large 3D meshes lives in `pallas_spmv.py`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def csr_matvec(indptr, indices, vals, x):
    """y = A @ x for CSR (indptr [n+1], indices [nnz], vals [nnz])."""
    n = indptr.shape[0] - 1
    # row id per nnz entry
    row_ids = jnp.searchsorted(indptr, jnp.arange(indices.shape[0]), side="right") - 1
    prod = vals * x[indices]
    return jax.ops.segment_sum(prod, row_ids, num_segments=n,
                               indices_are_sorted=True)


def make_csr_matvec(indptr, indices):
    """Precompute the per-nnz row ids once; returns a jittable matvec closure.

    Prefer this over `csr_matvec` in hot loops — the searchsorted is hoisted.
    """
    row_ids = jnp.searchsorted(indptr, jnp.arange(indices.shape[0]),
                               side="right") - 1
    n = indptr.shape[0] - 1

    def matvec(vals, x):
        prod = vals * x[indices]
        return jax.ops.segment_sum(prod, row_ids, num_segments=n,
                                   indices_are_sorted=True)

    return matvec


def csr_to_dense(indptr, indices, vals, n_cols=None):
    """Densify a CSR matrix (small systems / direct solver path)."""
    n = indptr.shape[0] - 1
    if n_cols is None:
        n_cols = n
    row_ids = jnp.searchsorted(indptr, jnp.arange(indices.shape[0]), side="right") - 1
    A = jnp.zeros((n, n_cols), dtype=vals.dtype)
    return A.at[row_ids, indices].add(vals)
