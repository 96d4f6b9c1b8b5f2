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
import jax
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


def build_monolithic_precond(assembler, u0_np, joint_phi: bool = False):
    """Monolithic preconditioner matrix in the monolithic dof ordering.

    joint_phi=False: block_diag of the per-field Benedusi blocks (the
    reference's block-Jacobi P form).

    joint_phi=True: additionally keeps the CROSS membrane capacitive
    coupling between phi_i and phi_e — the block-diagonal form drops the
    -(C_M/F) M_Gamma off-diagonal, which is the DOMINANT coupling on
    dense-tissue meshes (large membrane area), and iteration counts grow
    from ~3 (2-cell square) to ~36 (100-cell tissue) because of it.  The
    joint phi operator

        [[K_i + aM, -aM], [-aM, K_e + aM]],  a = C_M/F

    is symmetric positive semi-definite (conduction plus aM x [[1,-1],
    [-1,1]]); its near-kernel is per-compartment constants with membrane
    jumps — exactly the structure the EMI solver already conquers with
    compartment-split aggregates + 2x2 membrane-pair block smoothing
    (problems/emi.py, 6-7 iterations).  Returns
    (Pm csr, components, block_pairs) ready for SmoothedAggregationAMG.
    """
    blocks = _build_blocks(assembler, u0_np)
    sizes = [b.shape[0] for b in blocks]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    assert offsets[-1] == assembler.n_dofs
    N = assembler.N_ions
    Pm = sp.block_diag(blocks, format="csr")
    components = np.repeat(np.arange(len(blocks)), sizes)
    block_pairs = None

    if joint_phi:
        topo = assembler.topo
        mesh = topo.mesh
        p = assembler.params
        dim = mesh.dim
        off_phi = {0: offsets[N], 1: offsets[2 * N + 1]}   # phi_i, phi_e
        ranks = []
        for dofs in (topo.intra_dofs, topo.extra_dofs):
            r = np.full(mesh.num_points, -1, dtype=np.int64)
            r[dofs] = np.arange(len(dofs))
            ranks.append(r)

        mverts = topo.membrane_verts
        Nq, wq = facet_quadrature(dim, degree=10)
        L_f = facet_geometry(mesh.points, mverts)
        NN = np.einsum("q,qa,qb->ab", wq, Nq, Nq)
        fvals = (p.C_M / p.F) * L_f[:, None, None] * NN[None, :, :]
        gi = off_phi[0] + ranks[0][mverts]                 # [n_mf, nv]
        ge = off_phi[1] + ranks[1][mverts]
        R = np.broadcast_to(gi[:, :, None], fvals.shape).ravel()
        C = np.broadcast_to(ge[:, None, :], fvals.shape).ravel()
        cross = sp.csr_matrix((-fvals.ravel(), (R, C)),
                              shape=(assembler.n_dofs, assembler.n_dofs))
        Pm = (Pm + cross + cross.T).tocsr()

        # phi components: per-biological-cell labels for phi_i, one ECS
        # label for phi_e (aggregates never span compartments — the
        # tentative prolongation reproduces every jump mode exactly)
        comp_v = np.zeros(mesh.num_points, dtype=np.int64)
        ic = topo.intra_cells
        comp_v[mesh.cells[ic].ravel()] = np.repeat(
            np.asarray(mesh.cell_tags)[ic], mesh.cells.shape[1])
        base = len(blocks)
        act_i = np.nonzero(ranks[0] >= 0)[0]
        components[off_phi[0] + ranks[0][act_i]] = base + comp_v[act_i]
        # (phi_e keeps its own block label — the ECS compartment)

        mv = np.unique(np.asarray(mverts).ravel())
        d0 = off_phi[0] + ranks[0][mv]
        d1 = off_phi[1] + ranks[1][mv]
        ok = (ranks[0][mv] >= 0) & (ranks[1][mv] >= 0)
        block_pairs = np.stack([d0[ok], d1[ok]], axis=1)

    Pm.sort_indices()
    # relabel components densely
    _, components = np.unique(components, return_inverse=True)
    return Pm, components, block_pairs


class BlockDiagonalPreconditioner:
    def __init__(self, assembler, u0, mode: str = "dense", dtype=None,
                 df: bool = False, cache: bool = False):
        """df: also build the compensated double-f32 application path
        (`apply_df`) — the production-tolerance preconditioner on TPU, where
        a plain f32 apply is a noisy operator that stalls the df32 Krylov
        recurrence (solvers/df32.py)."""
        dtype = dtype or assembler.dtype
        u0_np = np.asarray(u0, dtype=np.float64)
        self.mode = mode
        self.df = df
        if mode == "amg2":
            # joint-phi monolithic SA-AMG (see build_monolithic_precond):
            # ONE V-cycle over the whole vector, keeping the membrane
            # capacitive coupling that block-diagonal P drops — the
            # tissue-scale iteration-count fix
            from knp_emi_cgx_tpu.solvers.amg import SmoothedAggregationAMG

            Pm, components, pairs = build_monolithic_precond(
                assembler, u0_np, joint_phi=True)
            self._joint = SmoothedAggregationAMG(
                Pm, dtype=dtype, df=df, cache=cache,
                components=components, block_pairs=pairs,
                per_component_lam=True)
            self.apply_blocks = []
            return
        blocks = _build_blocks(assembler, u0_np)
        self.sizes = [b.shape[0] for b in blocks]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        assert self.offsets[-1] == assembler.n_dofs

        # which blocks are potentials (index N and 2N+1 in field ordering)
        N = assembler.N_ions
        phi_blocks = {N, 2 * N + 1}

        def dense_of(i, b):
            # ship the sparse data, densify + invert ON DEVICE — transfers
            # O(nnz) instead of O(n^2) through the host->TPU tunnel
            from knp_emi_cgx_tpu.ops.spmv import csr_to_dense

            dense = csr_to_dense(jnp.asarray(np.asarray(b.indptr, dtype=np.int32)),
                                 jnp.asarray(np.asarray(b.indices, dtype=np.int32)),
                                 jnp.asarray(np.asarray(b.data, dtype=np.dtype(dtype))))
            return ("dense", jnp.linalg.inv(dense))

        def cheb_of(i, b, iters):
            from knp_emi_cgx_tpu.ops.spmv import expand_row_ids

            d = np.asarray(b.diagonal())
            dinv_b = sp.diags(1.0 / d) @ b
            # Gershgorin bound on D^-1 B (SPD): lam_max <= max row sum of |.|
            lam_max = float(np.abs(dinv_b).sum(axis=1).max())
            return ("cheb", {
                "indices": jnp.asarray(np.asarray(b.indices, dtype=np.int32)),
                "row_ids": expand_row_ids(b.indptr),
                "vals": jnp.asarray(np.asarray(b.data, dtype=np.dtype(dtype))),
                "dinv": jnp.asarray(np.asarray(1.0 / d, dtype=np.dtype(dtype))),
                "lam_max": lam_max, "iters": iters, "n": b.shape[0],
            })

        def amg_of(i, b):
            from knp_emi_cgx_tpu.solvers.amg import SmoothedAggregationAMG

            return ("amg", SmoothedAggregationAMG(b.tocsr(), dtype=dtype,
                                                  df=df, cache=cache))

        self.apply_blocks = []
        for i, b in enumerate(blocks):
            if mode == "dense" or (mode == "mixed" and i in phi_blocks):
                self.apply_blocks.append(dense_of(i, b))
            elif mode == "amg":
                # AMG V-cycle on every block: mesh-robust and O(n), the
                # hypre-BoomerAMG equivalent (scales to 3D tissue meshes)
                self.apply_blocks.append(amg_of(i, b))
            elif mode in ("chebyshev", "mixed"):
                # ion blocks: mass + dt*D*K, well conditioned — few sweeps
                self.apply_blocks.append(cheb_of(i, b, 5))
            else:
                raise ValueError(mode)
        jax.block_until_ready([a[1] for a in self.apply_blocks
                               if a[0] == "dense"])

    # -- device-array bundling (see utils/devicestate.py) --
    def device_state(self):
        if self.mode == "amg2":
            return self._joint.device_state()
        out = []
        for kind, data in self.apply_blocks:
            if kind == "dense":
                out.append(data)
            elif kind == "amg":
                out.append(data.device_state())
            else:
                out.append({k: data[k] for k in
                            ("indices", "row_ids", "vals", "dinv")})
        return out

    def install(self, st):
        if self.mode == "amg2":
            return self._joint.install(st)
        old = []
        new_blocks = []
        for (kind, data), d in zip(self.apply_blocks, st):
            if kind == "dense":
                old.append(data)
                new_blocks.append((kind, d))
            elif kind == "amg":
                old.append(data.install(d))
                new_blocks.append((kind, data))
            else:
                old.append({k: data[k] for k in d})
                data = dict(data)
                data.update(d)
                new_blocks.append((kind, data))
        self.apply_blocks = new_blocks
        return old

    def __call__(self, r):
        if self.mode == "amg2":
            return self._joint(r)
        outs = []
        for i, (kind, data) in enumerate(self.apply_blocks):
            seg = r[self.offsets[i]:self.offsets[i + 1]]
            if kind == "dense":
                outs.append(data @ seg)
            elif kind == "amg":
                outs.append(data(seg))
            else:
                outs.append(_chebyshev(data, seg))
        return jnp.concatenate(outs)

    def apply_df(self, rh, rl):
        """Compensated double-f32 apply (requires df=True at construction).
        A fixed linear operator to ~2^-48 accuracy — usable inside the df32
        production-tolerance GMRES without stalling its recurrence."""
        from knp_emi_cgx_tpu.solvers.df32 import dense_mv_df

        if self.mode == "amg2":
            return self._joint.apply_df(rh, rl)
        outs_h, outs_l = [], []
        for i, (kind, data) in enumerate(self.apply_blocks):
            sh = rh[self.offsets[i]:self.offsets[i + 1]]
            sl = rl[self.offsets[i]:self.offsets[i + 1]]
            if kind == "dense":
                yh, yl = dense_mv_df(data.astype(jnp.float32), sh, sl)
            elif kind == "amg":
                yh, yl = data.apply_df(sh, sl)
            else:
                raise NotImplementedError(
                    "df32 apply supports dense/amg block modes")
            outs_h.append(yh)
            outs_l.append(yl)
        return jnp.concatenate(outs_h), jnp.concatenate(outs_l)


def _chebyshev(blk, b, lam_min_frac=0.06):
    """Chebyshev semi-iteration for an SPD block with Jacobi scaling."""
    from knp_emi_cgx_tpu.ops.spmv import csr_mv

    lam_max, iters, n = blk["lam_max"], blk["iters"], blk["n"]
    dinv = blk["dinv"]
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
        r = b - csr_mv(blk["vals"], x, blk["indices"], blk["row_ids"], n)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + 2.0 * rho_new / delta * (dinv * r)
        rho = rho_new
    return x
