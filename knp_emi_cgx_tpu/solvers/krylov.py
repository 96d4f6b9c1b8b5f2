"""Jittable restarted GMRES with optional preconditioning and nullspace
projection.

TPU-native replacement of PETSc KSP (KNPEMIx_solver.py:152-295).  Static
shapes throughout: the Krylov basis is a fixed [restart+1, n] array; the
inner Arnoldi loop is a `lax.while_loop` that EXITS as soon as the Givens
residual passes tolerance (no wasted SpMVs past convergence), and outer
restarts are a second while_loop.  All reductions are plain dots that psum
across devices when the operator is sharded.

Left preconditioning with the preconditioned-residual norm matches the
reference's default KSP configuration (`norm_type: preconditioned`,
KNPEMIx_solver.py:39,279).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray   # total inner iterations
    residual: jnp.ndarray     # final (preconditioned) residual norm
    converged: jnp.ndarray


def _identity(x):
    return x


@functools.partial(jax.jit, static_argnames=("matvec", "M", "restart",
                                             "max_outer", "project_nullspace",
                                             "norm0"))
def gmres(matvec: Callable,
          b: jnp.ndarray,
          x0: jnp.ndarray,
          M: Callable | None = None,
          nullspace: jnp.ndarray | None = None,
          rtol: float = 1e-8,
          restart: int = 30,
          max_outer: int = 50,
          project_nullspace: bool = False,
          norm0: str = "Mb") -> GMRESResult:
    """Left-preconditioned restarted GMRES solving A x = b.

    matvec : x -> A @ x
    M      : r -> approx A^{-1} r (left preconditioner), identity if None
    nullspace : unit vector n; if project_nullspace, rhs/residual and Krylov
        vectors are kept orthogonal to n (PETSc MatNullSpace equivalent); the
        returned x keeps x0's nullspace component, like PETSc KSP.
    rtol   : relative tolerance on the preconditioned residual norm.
    norm0  : what rtol is relative to — "Mb" (||M b||) or "r0" (the initial
        preconditioned residual ||M (b - A x0)||, PETSc KSPConvergedDefault
        semantics with a nonzero initial guess).
    """
    if M is None:
        M = _identity
    n = b.shape[0]
    dtype = b.dtype
    eps_floor = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)

    def proj(v):
        if nullspace is None or not project_nullspace:
            return v
        return v - jnp.dot(nullspace, v) * nullspace

    b = proj(b)
    # the post-M projection matches PETSc's KSP_PCApply, which removes the
    # attached nullspace from every preconditioner application — the
    # convergence denominator is ||proj(M b)||
    if norm0 == "r0":
        norm_ref = jnp.linalg.norm(proj(M(b - matvec(x0))))
    else:
        norm_ref = jnp.linalg.norm(proj(M(b)))
    tol = rtol * jnp.maximum(norm_ref, eps_floor)

    def arnoldi_cycle(x):
        r = proj(M(b - matvec(x)))
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((restart + 1, n), dtype=dtype)
        H = jnp.zeros((restart + 1, restart), dtype=dtype)
        cs = jnp.zeros(restart, dtype=dtype)
        sn = jnp.zeros(restart, dtype=dtype)
        g = jnp.zeros(restart + 1, dtype=dtype)
        V = V.at[0].set(r / jnp.maximum(beta, eps_floor))
        g = g.at[0].set(beta)

        def body(carry):
            j, V, H, cs, sn, g, _res = carry
            w = proj(M(matvec(V[j])))

            # modified Gram-Schmidt against columns 0..j
            def mgs(i, wh):
                w, hcol = wh
                active = i <= j
                hij = jnp.where(active, jnp.dot(V[i], w), 0.0)
                return w - hij * V[i], hcol.at[i].set(hij)

            w, hcol = jax.lax.fori_loop(
                0, restart + 1, mgs,
                (w, jnp.zeros(restart + 1, dtype=dtype)))
            hj1 = jnp.linalg.norm(w)
            hcol = hcol.at[j + 1].set(hj1)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, eps_floor))

            # apply previous Givens rotations
            def rot(i, hc):
                active = i < j
                hi, hi1 = hc[i], hc[i + 1]
                new_i = jnp.where(active, cs[i] * hi + sn[i] * hi1, hi)
                new_i1 = jnp.where(active, -sn[i] * hi + cs[i] * hi1, hi1)
                return hc.at[i].set(new_i).at[i + 1].set(new_i1)

            hcol = jax.lax.fori_loop(0, restart, rot, hcol)
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c = hcol[j] / jnp.maximum(denom, eps_floor)
            s = hcol[j + 1] / jnp.maximum(denom, eps_floor)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            gj = g[j]
            g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            H = H.at[:, j].set(hcol[: restart + 1])
            res = jnp.abs(g[j + 1])
            return j + 1, V, H, cs, sn, g, res

        def cond(carry):
            j, *_, res = carry
            return (j < restart) & (res > tol)

        j, V, H, cs, sn, g, res = jax.lax.while_loop(
            cond, body, (jnp.array(0), V, H, cs, sn, g, beta))

        # solve the j x j least-squares triangle (static shapes: mask the
        # inactive trailing rows/cols and guard the diagonal)
        active = jnp.arange(restart) < j
        R = H[:restart, :restart]
        diag = jnp.where(active, jnp.diagonal(R), 1.0)
        diag = jnp.where(jnp.abs(diag) > 0, diag, 1.0)
        R = R.at[jnp.diag_indices(restart)].set(diag)
        rhs = jnp.where(active, g[:restart], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
        # Krylov update is orthogonal to the nullspace (all V columns are
        # projected) — x keeps x0's nullspace component, like PETSc.
        x_new = x + V[:restart].T @ y
        return x_new, res, j

    def cond(carry):
        _, res, it, outer = carry
        return (res > tol) & (outer < max_outer)

    def step(carry):
        x, _, it, outer = carry
        x, res, cnt = arnoldi_cycle(x)
        return x, res, it + cnt, outer + 1

    r0 = jnp.linalg.norm(M(b - matvec(x0)))
    x, res, it, outer = jax.lax.while_loop(
        cond, step, (x0, r0, jnp.array(0), jnp.array(0)))
    return GMRESResult(x=x, iterations=it, residual=res, converged=res <= tol)
