"""Direct linear solvers for small/medium systems.

The reference uses MUMPS LU with null-pivot handling (icntl 24/25,
KNPEMIx_solver.py:167-172, 378-383).  Here the pure-Neumann singular system
(one-dimensional nullspace: joint constants of phi_i and phi_e) is handled
explicitly and deterministically by a bordered (deflated) solve that returns
the unique solution orthogonal to the nullspace — unlike MUMPS, whose
returned representative depends on internal pivot ordering.  Any other
representative is x + c*n; the time dynamics are invariant to c (only
phi_m = phi_i - phi_e and the concentrations feed back).
"""
from __future__ import annotations

import jax.numpy as jnp

from knp_emi_cgx_tpu.ops.spmv import csr_to_dense


def dense_solve(indptr, indices, vals, b):
    A = csr_to_dense(indptr, indices, vals)
    return jnp.linalg.solve(A, b)


def dense_solve_deflated(indptr, indices, vals, b, nullspace):
    """Solve the singular system A x = b returning the representative with
    x . nullspace = 0, via the bordered system [[A, n], [n^T, 0]].

    Also removes any (roundoff-level) nullspace component of b — the
    equivalent of PETSc's `nullspace.remove(b)` (KNPEMIx_solver.py:333);
    for this discretisation b is consistent in exact arithmetic (the joint
    phi test-function constant is a left nullvector and the channel-current
    terms cancel between the phi_i and phi_e rows).
    """
    n = b.shape[0]
    A = csr_to_dense(indptr, indices, vals)
    b = b - jnp.dot(nullspace, b) * nullspace
    M = jnp.zeros((n + 1, n + 1), dtype=vals.dtype)
    M = M.at[:n, :n].set(A)
    M = M.at[:n, n].set(nullspace)
    M = M.at[n, :n].set(nullspace)
    rhs = jnp.concatenate([b, jnp.zeros((1,), dtype=b.dtype)])
    x = jnp.linalg.solve(M, rhs)
    return x[:n]
