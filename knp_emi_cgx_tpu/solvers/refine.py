"""Selective-f64 solve: production tolerances (rtol 1e-9, preconditioned
norm — KNPEMIx_solver.py:27,39) on TPU with f32 physics storage.

Measured behaviour on the KNP-EMI operator (see tests/test_refine.py):

* pure-f32 GMRES "converges" its internal Givens residual below any rtol,
  but the REAL preconditioned residual stagnates near f32 eps (~1e-7
  relative) — 1e-9 cannot be certified on-chip in f32;
* classic mixed-precision IR (f64 outer residual + f32 inner GMRES) also
  stalls: the leftover residual concentrates on the membrane-coupling
  directions that the block-diagonal preconditioner handles worst, so the
  f32 correction solves hit their eps floor before reaching 1e-3/cycle;
* a preconditioner applied through an f32 cast is a NOISY operator — it
  breaks the Arnoldi relation and costs hundreds of iterations.

What works, and what this module provides: keep assembly, gating and field
state in f32 (the bulk of the per-step FLOPs and memory traffic), and run
ONLY the Krylov solve in f64 — emulated on TPU at ~9x the f32 elementwise
cost but needed for just a handful of SpMVs per step with warm starts.  The
preconditioner must be BUILT at f64 storage (host-side, free) so it applies
as a fixed operator in f64 arithmetic.

This matches the reference's production criterion exactly: left-
preconditioned GMRES, rtol on the preconditioned residual norm.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.ops.spmv import csr_mv
from knp_emi_cgx_tpu.solvers.krylov import gmres


def repaired_vals64(vals, row_ids, n, repair):
    """The f64 operator solve_f64 actually solves: f32 values cast up, with
    each row's phi-column sum subtracted from the row's phi-partner entry so
    the constant-potentials nullspace is EXACT (discrete compatibility that
    independent f32 rounding of the assembled values destroys)."""
    f64 = jnp.float64
    vals64 = vals.astype(f64)
    slots, col_mask = repair
    rowsum = jax.ops.segment_sum(vals64 * col_mask.astype(f64), row_ids,
                                 num_segments=n, indices_are_sorted=True)
    return vals64.at[slots].add(-rowsum)


class F64SolveResult(NamedTuple):
    x: jnp.ndarray            # f64 solution
    iterations: jnp.ndarray
    residual: jnp.ndarray     # final preconditioned residual norm
    converged: jnp.ndarray


def solve_f64(vals, b, x0, indices, row_ids, n,
              M: Callable | None = None,
              nullspace: jnp.ndarray | None = None,
              rtol: float = 1e-9,
              restart: int = 30,
              max_outer: int = 50,
              project_nullspace: bool = False,
              repair: tuple | None = None) -> F64SolveResult:
    """Solve the f32-assembled system at production rtol in f64 arithmetic.

    vals/b may be f32 (they are cast up — the cast is exact); x0 should be
    f64 across timesteps so the warm start does not reinject f32 rounding.
    M must already be an f64-applying operator (build the block
    preconditioner with dtype=jnp.float64).  Requires jax_enable_x64.

    repair: (phi_repair_slots [n], phi_col_mask [nnz]) from the assembler —
    restores the EXACT nullspace of the pure-Neumann operator that f32
    assembly rounding destroyed (zero row sums over potential columns).
    Without it, the attainable residual of the singular system floors at
    f32 eps regardless of solver precision — measured, tests/test_refine.py.
    """
    f64 = jnp.float64
    vals64 = vals.astype(f64)
    b64 = b.astype(f64)
    ns64 = None
    if nullspace is not None:
        # rebuild the nullspace vector exactly in f64 from its sparsity (a
        # cast-up f32 vector is only unit/constant to f32 accuracy)
        mask = (nullspace != 0).astype(f64)
        ns64 = mask / jnp.linalg.norm(mask)
        if repair is not None:
            vals64 = repaired_vals64(vals, row_ids, n, repair)
    res = gmres(
        lambda v: csr_mv(vals64, v, indices, row_ids, n),
        b64, x0.astype(f64), M=M, nullspace=ns64, rtol=rtol,
        restart=restart, max_outer=max_outer,
        project_nullspace=project_nullspace)
    return F64SolveResult(x=res.x, iterations=res.iterations,
                          residual=res.residual, converged=res.converged)
