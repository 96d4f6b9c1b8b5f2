"""Block-diagonal preconditioner for the KNP-EMI operator.

Re-design of the reference's Benedusi-style preconditioner form
(`KNPEMIx_problem.py:657-744`, block-Jacobi variant) + hypre BoomerAMG
(`KNPEMIx_solver.py:267-273`).  The preconditioner is block-diagonal over the
8 fields:

  concentration blocks:  M + dt * D * K        on the owning subdomain
  potential blocks:      dt * (sum_k z_k^2 D_k / psi * kbar_k) * K
                         + (C_M/F) * M_Gamma   (membrane facet mass)

Note: the reference *subtracts* the facet mass in its P form
(KNPEMIx_problem.py:737-738), which makes the potential blocks indefinite;
we add it (the Schur-complement-consistent sign), which keeps every block SPD
and mesh-robust.  Like the reference (reassemble_P defaults to False,
KNPEMIx_solver.py:34), P is built once from the initial state.

Application modes:
  * "dense"  — exact block inverses precomputed on host; application is a
    handful of dense matvecs (MXU-friendly; fine up to ~10^4 dofs/field).
  * "chebyshev" — matrix-free Chebyshev iterations on each SPD block with
    host-estimated spectral bounds (scales to large 3D meshes; the AMG
    V-cycle upgrade hooks in here).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import scipy.sparse as sp
import scipy.sparse.linalg as spla

from knp_emi_cgx_tpu.fem.p1 import (cell_geometry, facet_geometry,
                                    facet_quadrature, reference_mass)


def _build_blocks(assembler, u0_np):
    """Host-side assembly of the per-field preconditioner blocks (CSR)."""
    topo = assembler.topo
    p = assembler.params
    mesh = topo.mesh
    dim = mesh.dim
    N = assembler.N_ions
    nvar = assembler.nvar

    grads, vols = cell_geometry(mesh.points, mesh.cells)
    Mref = reference_mass(dim)

    blocks = []
    for side, cells_idx, dofs in (
        ("i", topo.intra_cells, topo.intra_dofs),
        ("e", topo.extra_cells, topo.extra_dofs),
    ):
        nloc = len(dofs)
        rank = np.full(mesh.num_points, -1, dtype=np.int64)
        rank[dofs] = np.arange(nloc)
        Vt = rank[mesh.cells[cells_idx]]
        g = grads[cells_idx]
        v = vols[cells_idx]
        K_e = np.einsum("cai,cbi->cab", g, g) * v[:, None, None]
        M_e = v[:, None, None] * Mref[None, :, :]
        R = np.broadcast_to(Vt[:, :, None], K_e.shape).ravel()
        C = np.broadcast_to(Vt[:, None, :], K_e.shape).ravel()
        Dkey = "Di" if side == "i" else "De"
        ion_off = 0 if side == "i" else nvar

        phi_coef = np.zeros(len(cells_idx))
        for k, ion in enumerate(p.ion_list):
            D, z = ion[Dkey], ion["z"]
            vals = (M_e + p.dt * D * K_e).ravel()
            blocks.append(sp.csr_matrix((vals, (R, C)), shape=(nloc, nloc)))
            kmean = u0_np[ion_off + k][mesh.cells[cells_idx]].mean(axis=1)
            phi_coef += p.dt * z * z * D / p.psi * kmean

        vals_phi = (phi_coef[:, None, None] * K_e).ravel()
        B_phi = sp.csr_matrix((vals_phi, (R, C)), shape=(nloc, nloc))

        # membrane facet mass on this side's local numbering
        mverts = topo.membrane_verts
        Nq, wq = facet_quadrature(dim, degree=10)
        L_f = facet_geometry(mesh.points, mverts)
        NN = np.einsum("q,qa,qb->ab", wq, Nq, Nq)
        fvals = (p.C_M / p.F) * L_f[:, None, None] * NN[None, :, :]
        fr = rank[mverts]
        FR = np.broadcast_to(fr[:, :, None], fvals.shape).ravel()
        FC = np.broadcast_to(fr[:, None, :], fvals.shape).ravel()
        B_phi = B_phi + sp.csr_matrix((fvals.ravel(), (FR, FC)),
                                      shape=(nloc, nloc))
        blocks.append(B_phi)
    # ordering: [ion_i x N, phi_i, ion_e x N, phi_e] — matches field layout
    return blocks


class BlockDiagonalPreconditioner:
    def __init__(self, assembler, u0, mode: str = "dense", dtype=None):
        dtype = dtype or assembler.dtype
        u0_np = np.asarray(u0, dtype=np.float64)
        blocks = _build_blocks(assembler, u0_np)
        self.mode = mode
        self.sizes = [b.shape[0] for b in blocks]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        assert self.offsets[-1] == assembler.n_dofs

        if mode == "dense":
            self.inv = [jnp.asarray(np.linalg.inv(b.toarray()), dtype=dtype)
                        for b in blocks]
        elif mode == "chebyshev":
            self.blocks = blocks
            self.cheb = []
            for b in blocks:
                d = np.asarray(b.diagonal())
                Dinv = sp.diags(1.0 / d)
                # spectral bound of D^-1 B via a few power iterations
                lam_max = float(abs(spla.eigs(Dinv @ b, k=1, which="LM",
                                              return_eigenvectors=False,
                                              maxiter=200, tol=1e-2)[0]))
                self.cheb.append((
                    jnp.asarray(b.indptr), jnp.asarray(b.indices),
                    jnp.asarray(b.data, dtype=dtype),
                    jnp.asarray(1.0 / d, dtype=dtype),
                    lam_max,
                ))
        else:
            raise ValueError(mode)

    def __call__(self, r):
        outs = []
        if self.mode == "dense":
            for i, inv in enumerate(self.inv):
                seg = r[self.offsets[i]:self.offsets[i + 1]]
                outs.append(inv @ seg)
            return jnp.concatenate(outs)
        # Chebyshev(k) on each block with Jacobi scaling
        from knp_emi_cgx_tpu.ops.spmv import csr_matvec

        for i, (indptr, indices, vals, dinv, lam_max) in enumerate(self.cheb):
            seg = r[self.offsets[i]:self.offsets[i + 1]]
            x = _chebyshev(indptr, indices, vals, dinv, lam_max, seg, iters=8)
            outs.append(x)
        return jnp.concatenate(outs)


def _chebyshev(indptr, indices, vals, dinv, lam_max, b, iters=8,
               lam_min_frac=0.06):
    """Chebyshev semi-iteration for SPD block with Jacobi scaling."""
    from knp_emi_cgx_tpu.ops.spmv import csr_matvec

    lmax = 1.1 * lam_max
    lmin = lam_min_frac * lam_max
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    x = jnp.zeros_like(b)
    r = b
    d = dinv * r / theta
    sigma = theta / delta
    rho = 1.0 / sigma
    for _ in range(iters):
        x = x + d
        r = b - csr_matvec(indptr, indices, vals, x)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + 2.0 * rho_new / delta * (dinv * r)
        rho = rho_new
    return x
