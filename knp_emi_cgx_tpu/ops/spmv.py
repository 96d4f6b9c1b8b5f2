"""Sparse matrix kernels for the KNP-EMI operator.

The operator has *static sparsity* (semi-implicit linearisation: only values
change per step, SURVEY §7.1), stored CSR.  `csr_matvec` is the XLA
formulation (gather + segment_sum): it fuses well and is TPU-compatible at
any size, and XLA lowers the sorted segment_sum to efficient vector code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_row_ids(indptr):
    """Host-side expansion of CSR indptr to per-nnz row ids (int32 device
    array).  Always compute this on the host: a device searchsorted would
    trigger one XLA compile per matrix shape at setup time."""
    import numpy as np

    indptr_np = np.asarray(indptr)
    # build in int32 on the host: converting dtype via jnp.asarray compiles
    # one convert_element_type executable per distinct shape
    return jnp.asarray(np.repeat(
        np.arange(indptr_np.shape[0] - 1, dtype=np.int32),
        np.diff(indptr_np)))


def csr_mv(vals, x, indices, row_ids, n):
    """y = A @ x with all index arrays as explicit arguments (never capture
    them in closures — jit-embedded constants are re-shipped to the device
    every execution on remote runtimes; arguments stay resident)."""
    prod = vals * x[indices]
    return jax.ops.segment_sum(prod, row_ids, num_segments=n,
                               indices_are_sorted=True)


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

    Prefer this over `csr_matvec` in hot loops — the row-id expansion is
    hoisted, and computed on the HOST (a device searchsorted here would
    trigger one XLA compilation per distinct matrix shape at setup time,
    which is ruinous over many AMG levels).
    """
    import numpy as np

    indptr_np = np.asarray(indptr)
    row_ids = jnp.asarray(
        np.repeat(np.arange(indptr_np.shape[0] - 1),
                  np.diff(indptr_np)), dtype=jnp.int32)
    indices = jnp.asarray(indices, dtype=jnp.int32)
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
