"""Jittable restarted GMRES with optional preconditioning and nullspace
projection.

TPU-native replacement of PETSc KSP (KNPEMIx_solver.py:152-295).  Static
shapes throughout: the Krylov basis is a fixed [restart, n] array; the inner
Arnoldi loop is a `lax.fori_loop` with masking past convergence, and outer
restarts are a `lax.while_loop`.  All reductions are plain dots that `psum`
across devices when the operator is sharded (the multi-chip path shards x
and the SpMV; XLA inserts the collectives).

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
                                             "max_outer", "project_nullspace"))
def gmres(matvec: Callable,
          b: jnp.ndarray,
          x0: jnp.ndarray,
          M: Callable | None = None,
          nullspace: jnp.ndarray | None = None,
          rtol: float = 1e-8,
          restart: int = 30,
          max_outer: int = 50,
          project_nullspace: bool = False) -> GMRESResult:
    """Left-preconditioned restarted GMRES solving A x = b.

    matvec : x -> A @ x
    M      : r -> approx A^{-1} r (left preconditioner), identity if None
    nullspace : unit vector n; if project_nullspace, the rhs/residual and
        iterates are kept orthogonal to n (PETSc MatNullSpace equivalent).
    rtol   : relative tolerance on the preconditioned residual norm.
    """
    if M is None:
        M = _identity
    n = b.shape[0]
    dtype = b.dtype

    def proj(v):
        if nullspace is None or not project_nullspace:
            return v
        return v - jnp.dot(nullspace, v) * nullspace

    b = proj(b)
    norm_Mb = jnp.linalg.norm(M(b))
    tol = rtol * jnp.maximum(norm_Mb, jnp.asarray(1e-300, dtype))

    def arnoldi_cycle(x):
        r = proj(M(b - matvec(x)))
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((restart + 1, n), dtype=dtype)
        H = jnp.zeros((restart + 1, restart), dtype=dtype)
        cs = jnp.zeros(restart, dtype=dtype)
        sn = jnp.zeros(restart, dtype=dtype)
        g = jnp.zeros(restart + 1, dtype=dtype)
        V = V.at[0].set(r / jnp.maximum(beta, 1e-300))
        g = g.at[0].set(beta)

        def body(j, carry):
            V, H, cs, sn, g, res, done, cnt = carry
            cnt = cnt + jnp.where(done, 0, 1)
            w = proj(M(matvec(V[j])))
            # modified Gram-Schmidt
            def mgs(i, wh):
                w, hcol = wh
                hij = jnp.where(i <= j, jnp.dot(V[i], w), 0.0)
                w = w - hij * V[i]
                return w, hcol.at[i].set(hij)

            w, hcol = jax.lax.fori_loop(0, j + 1, mgs,
                                        (w, jnp.zeros(restart + 1, dtype=dtype)))
            hj1 = jnp.linalg.norm(w)
            hcol = hcol.at[j + 1].set(hj1)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, 1e-300))

            # apply existing Givens rotations to the new column
            def rot(i, hc):
                hi, hi1 = hc[i], hc[i + 1]
                hc = hc.at[i].set(cs[i] * hi + sn[i] * hi1)
                return hc.at[i + 1].set(-sn[i] * hi + cs[i] * hi1)

            hcol = jax.lax.fori_loop(0, j, rot, hcol)
            # new rotation
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c = hcol[j] / jnp.maximum(denom, 1e-300)
            s = hcol[j + 1] / jnp.maximum(denom, 1e-300)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            gj = g[j]
            g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            H = H.at[:, j].set(hcol[:restart + 1])
            res = jnp.abs(g[j + 1])
            # `done` only gates the iteration counter; continuing Arnoldi past
            # convergence is mathematically harmless (residual is monotone).
            newly_done = res <= tol
            return V, H, cs, sn, g, res, done | newly_done, cnt

        V, H, cs, sn, g, res, done, cnt = jax.lax.fori_loop(
            0, restart, body,
            (V, H, cs, sn, g, beta, beta <= tol, jnp.array(0)))

        # back-substitution on the full restart triangle (converged columns
        # beyond the active size have identity-ish structure; to keep shapes
        # static we solve the full system with guarded diagonal)
        R = H[:restart, :restart]
        Rd = jnp.where(jnp.abs(jnp.diag(R)) > 0, jnp.diag(R), 1.0)
        R = R.at[jnp.diag_indices(restart)].set(Rd)
        y = jax.scipy.linalg.solve_triangular(R, g[:restart], lower=False)
        # Every Krylov basis vector is projected, so the update is orthogonal
        # to the nullspace and x keeps x0's nullspace component — the same
        # behaviour as PETSc KSP with a MatNullSpace attached.
        x_new = x + V[:restart].T @ y
        return x_new, res, cnt

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
