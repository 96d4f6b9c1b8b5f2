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
  * "amg" — SA-AMG V-cycle per block (the hypre-BoomerAMG role).
  * "amg_phi" — "amg" for the concentration blocks + ONE joint hierarchy
    for the (phi_i, phi_e) pair keeping the membrane capacitive
    cross-coupling (the EMI-solver recipe; see `jphi_of` below).
  * "amg2" — one joint-phi monolithic hierarchy over all 8 fields
    (measured worse than "amg" at the bench point; kept as an option).
  * "amg_gs" — phi-first block GAUSS-SEIDEL: same blocks as "amg_phi",
    applied triangularly — the (phi_i, phi_e) jphi cycle first, then the
    ion cycles on the coupling-corrected residual r_ion - A_ion,phi z_phi
    (one extra operator matvec per apply; the composition lives in the
    solver, which owns the matvec — this class only exposes the two
    halves via `apply_part`/`apply_df_part`).  Measured on tissue16x8c at
    rtol 1e-9 (scripts/pc_lab.py): warm 11.25-11.75 its vs 16.75 for the
    best diagonal form (jphi s3c2) in the same run, MATCHING the
    triangular form's exact-apply floor (11.25); the block-diagonal FORM
    floor (18.8-22) is bypassed, not approached.  The triangular form is
    deliberately NOT symmetrized: GMRES does not need symmetry, and the
    reverse sweep would double the V-cycle cost for no measured gain
    (phi-first beats ion-first 11.25 vs 14.0 — the drift coupling
    ion<-phi is the strong direction).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import scipy.sparse as sp


def _build_blocks(assembler, u0_np):
    """Host-side assembly of the per-field preconditioner blocks (CSR).

    Consumes the assembler's stored host tables (`_sides[..]["K_e_np"]`,
    `mtab_np`, ...) instead of recomputing P1 geometry, so the blocks match
    the operator's element space for any fem_order (P1 or P2).

    Dirichlet rows/cols are eliminated to identity exactly like the
    operator's (the reference assembles P with the same BCs,
    KNPEMIx_solver.py:125-133): without this the BC rows' unit diagonal
    sits ~1e4 above the physical scale in the preconditioned spectrum and
    restarted GMRES stagnates on MMS/Dirichlet problems."""
    a = assembler
    p = a.params
    bc_flag = a.bc_flag_np

    def _with_bcs(B, off):
        bcf = bc_flag[off:off + B.shape[0]]
        if not bcf.any():
            return B.tocsr()
        D = sp.diags((~bcf).astype(float))
        return (D @ B @ D + sp.diags(bcf.astype(float))).tocsr()

    blocks = []
    for s in a._sides:
        side_i = s["ion_off"] == 0
        dofs = a.intra_dofs_np if side_i else a.extra_dofs_np
        nloc = len(dofs)
        rank = np.full(a.n_pts, -1, dtype=np.int64)
        rank[dofs] = np.arange(nloc)
        Vt_g = s["Vt_np"]                       # padded: zero-valued rows
        Vt = rank[Vt_g]
        K_e, M_e = s["K_e_np"], s["M_e_np"]
        R = np.broadcast_to(Vt[:, :, None], K_e.shape).ravel()
        C = np.broadcast_to(Vt[:, None, :], K_e.shape).ravel()

        off0 = sum(b.shape[0] for b in blocks)
        phi_coef = np.zeros(len(Vt_g))
        for k, ion in enumerate(p.ion_list):
            D, z = ion[s["Dkey"]], ion["z"]
            vals = (M_e + p.dt * D * K_e).ravel()
            blocks.append(_with_bcs(
                sp.csr_matrix((vals, (R, C)), shape=(nloc, nloc)),
                off0 + k * nloc))
            kmean = u0_np[s["ion_off"] + k][Vt_g].mean(axis=1)
            phi_coef += p.dt * z * z * D / p.psi * kmean

        vals_phi = (phi_coef[:, None, None] * K_e).ravel()
        B_phi = sp.csr_matrix((vals_phi, (R, C)), shape=(nloc, nloc))

        # membrane facet mass on this side's local numbering
        NN = np.einsum("q,qa,qb->ab", a.wq_np, a.Nq_np, a.Nq_np)
        fvals = (p.C_M / p.F) * a.L_f_np[:, None, None] * NN[None, :, :]
        fr = rank[a.mtab_np]
        FR = np.broadcast_to(fr[:, :, None], fvals.shape).ravel()
        FC = np.broadcast_to(fr[:, None, :], fvals.shape).ravel()
        B_phi = B_phi + sp.csr_matrix((fvals.ravel(), (FR, FC)),
                                      shape=(nloc, nloc))
        blocks.append(_with_bcs(B_phi, off0 + p.N_ions * nloc))
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
        a = assembler
        mesh = a.topo.mesh
        p = a.params
        off_phi = {0: offsets[N], 1: offsets[2 * N + 1]}   # phi_i, phi_e
        ranks = []
        for dofs in (a.intra_dofs_np, a.extra_dofs_np):
            r = np.full(a.n_pts, -1, dtype=np.int64)
            r[dofs] = np.arange(len(dofs))
            ranks.append(r)

        mverts = a.mtab_np
        NN = np.einsum("q,qa,qb->ab", a.wq_np, a.Nq_np, a.Nq_np)
        fvals = (p.C_M / p.F) * a.L_f_np[:, None, None] * NN[None, :, :]
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
        comp_v = np.zeros(a.n_pts, dtype=np.int64)
        ic = a.topo.intra_cells
        comp_v[a.cell_tab_np[ic].ravel()] = np.repeat(
            np.asarray(mesh.cell_tags)[ic], a.cell_tab_np.shape[1])
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


def build_joint_phi(assembler, bi, be, off_i, off_e):
    """Compacted joint (phi_i, phi_e) matrix [[B_i, -aM], [-aM^T, B_e]]
    (a = C_M/F): the Benedusi potential blocks PLUS the membrane
    capacitive cross-coupling that the block-diagonal P form drops — the
    dominant coupling on dense-tissue meshes (reference P form:
    KNPEMIx_problem.py:657-744; the coupling is the EMI operator
    structure, problems/emi.py).  off_i/off_e: the blocks' row offsets in
    the monolithic dof ordering (for BC masking).

    Returns (J csr [ni+ne], components, pairs, ni): components label
    biological compartments (aggregates must never span them), pairs are
    the (phi_i, phi_e) membrane dof partners for 2x2 block smoothing."""
    a = assembler
    p = a.params
    ni, ne = bi.shape[0], be.shape[0]
    rank_i = np.full(a.n_pts, -1, dtype=np.int64)
    rank_i[a.intra_dofs_np] = np.arange(ni)
    rank_e = np.full(a.n_pts, -1, dtype=np.int64)
    rank_e[a.extra_dofs_np] = np.arange(ne)

    NN = np.einsum("q,qa,qb->ab", a.wq_np, a.Nq_np, a.Nq_np)
    fvals = (p.C_M / p.F) * a.L_f_np[:, None, None] * NN[None, :, :]
    gi = rank_i[a.mtab_np]                      # [n_mf, nfn]
    ge = ni + rank_e[a.mtab_np]
    R = np.broadcast_to(gi[:, :, None], fvals.shape).ravel()
    C = np.broadcast_to(ge[:, None, :], fvals.shape).ravel()
    nj = ni + ne
    cross = sp.csr_matrix((-fvals.ravel(), (R, C)), shape=(nj, nj))
    # Dirichlet/pinned dofs keep their identity rows: zero the cross
    # coupling there (bi/be already BC-eliminated in _build_blocks)
    bcf = np.concatenate([a.bc_flag_np[off_i:off_i + ni],
                          a.bc_flag_np[off_e:off_e + ne]])
    if bcf.any():
        Dm = sp.diags((~bcf).astype(float))
        cross = Dm @ cross @ Dm
    J = (sp.block_diag([bi, be]).tocsr() + cross + cross.T).tocsr()
    J.sort_indices()

    # aggregates never span biological compartments: per-cell tag
    # labels on phi_i dofs, one ECS label on phi_e dofs
    comp_node = np.zeros(a.n_pts, dtype=np.int64)
    ic = a.topo.intra_cells
    comp_node[a.cell_tab_np[ic].ravel()] = np.repeat(
        np.asarray(a.topo.mesh.cell_tags)[ic], a.cell_tab_np.shape[1])
    components = np.zeros(nj, dtype=np.int64)
    components[:ni] = comp_node[a.intra_dofs_np] + 1

    # 2x2 smoothing blocks on (phi_i, phi_e) membrane dof partners
    mv = np.unique(a.mtab_np)
    pairs = np.stack([rank_i[mv], ni + rank_e[mv]], axis=1)
    return J, components, pairs, ni


class LatticeBlockPreconditioner:
    """Block-diagonal preconditioner applied natively to UNCOMPACTED
    lattice vectors [nf * n_pts] (the stencil operator's solution space,
    ops/stencil.py), with gather-free geometric V-cycles
    (solvers/lattice_amg.py) — built for the axon TPU where XLA's gather
    lowering is ~500x off the bandwidth bound.

    The per-field hierarchies are BATCHED into one block-diagonal lattice
    AMG: the field axis is a never-coarsened lattice axis, so every level
    is a single [K, nf*n] diagonal stack and the whole apply is ~17 wide
    fused ops instead of nf*17 thin ones (8 separate per-field V-cycles
    measured launch/op-count-bound at 24^3: ~25 ms/apply; the op count is
    the production bottleneck at small per-field sizes).  Per-field
    spectral bounds keep the smoothing correctly scaled per block
    (mass+diffusion vs conduction operators differ by orders of
    magnitude).  Compartment-constant deflation covers the potential
    blocks' near-kernel (see LatticeAMG `deflate`).

    mode="amg_phi": the (phi_i, phi_e) pair additionally gets ONE joint
    hierarchy keeping the membrane capacitive cross-coupling (pair
    smoothing + deflation), the concentrations stay in the batched
    block-diagonal hierarchy.

    Same P form and V-cycle semantics as BlockDiagonalPreconditioner;
    only the aggregation is geometric (2^dim lattice blocks).
    """

    def __init__(self, assembler, u0, dims, mode: str = "amg",
                 amg_opts: dict | None = None):
        from knp_emi_cgx_tpu.solvers.lattice_amg import LatticeAMG

        a = assembler
        u0_np = np.asarray(u0, dtype=np.float64)
        blocks = _build_blocks(a, u0_np)
        assert len(blocks) == a.nf
        n_pts = self.n_pts = int(np.prod(dims))
        self.mode = mode
        self.N = N = a.N_ions
        self.nf = nf = a.nf
        opts = dict(amg_opts or {})
        sizes = [b.shape[0] for b in blocks]
        offs = np.concatenate([[0], np.cumsum(sizes)])

        # per-compartment indicator vectors on the lattice (the potential
        # blocks' near-kernel — see LatticeAMG `deflate`): one row per
        # biological cell over its vertex closure, one for the ECS
        comp_node = np.zeros(n_pts, dtype=np.int64)
        ic = a.topo.intra_cells
        comp_node[a.cell_tab_np[ic].ravel()] = np.repeat(
            np.asarray(a.topo.mesh.cell_tags)[ic], a.cell_tab_np.shape[1])
        tags = np.unique(comp_node[comp_node > 0])
        Z_i = (comp_node[None, :] == tags[:, None]).astype(np.float64)
        Z_e = np.zeros((1, n_pts))
        Z_e[0, a.extra_dofs_np] = 1.0

        def bc_masked(Z, f):
            bcf = a.bc_flag_np[offs[f]:offs[f + 1]]
            if not bcf.any():
                return Z
            lift = np.ones(n_pts)
            act = a.intra_dofs_np if f < a.nvar else a.extra_dofs_np
            lift[act[bcf]] = 0.0
            return Z * lift[None, :]

        self.joint = None
        phi_fields = (N, 2 * N + 1)
        if mode in ("amg_phi", "amg_gs"):
            J, _, _, _ = build_joint_phi(a, blocks[N], blocks[2 * N + 1],
                                         int(offs[N]), int(offs[2 * N + 1]))
            active_j = np.concatenate([a.intra_dofs_np,
                                       n_pts + a.extra_dofs_np])
            pad = np.zeros_like(Z_i)
            Z_j = np.concatenate([
                np.concatenate([bc_masked(Z_i, N), pad], axis=1),
                np.concatenate([np.zeros_like(Z_e),
                                bc_masked(Z_e, 2 * N + 1)], axis=1)])
            jopts = {"smooth_iters": 3, **opts}
            self.joint = LatticeAMG(J, active_j, dims, n_fields=2,
                                    pair_smooth=True, deflate=Z_j, **jopts)
            batch_fields = [f for f in range(nf) if f not in phi_fields]
        else:
            batch_fields = list(range(nf))
        self.batch_fields = batch_fields

        # batched block-diagonal hierarchy over the remaining fields
        B_all = sp.block_diag([blocks[f] for f in batch_fields]).tocoo()
        act_all, Z_rows = [], []
        nb = len(batch_fields)
        for slot, f in enumerate(batch_fields):
            act_f = (a.intra_dofs_np if f < a.nvar else a.extra_dofs_np)
            act_all.append(slot * n_pts + act_f)
            if f == N:                      # phi_i (mode "amg" only)
                Zr = np.zeros((Z_i.shape[0], nb * n_pts))
                Zr[:, slot * n_pts:(slot + 1) * n_pts] = bc_masked(Z_i, f)
                Z_rows.append(Zr)
            elif f == 2 * N + 1:            # phi_e (mode "amg" only)
                Zr = np.zeros((1, nb * n_pts))
                Zr[:, slot * n_pts:(slot + 1) * n_pts] = bc_masked(Z_e, f)
                Z_rows.append(Zr)
        defl = np.concatenate(Z_rows) if Z_rows else None
        self.batched = LatticeAMG(
            B_all, np.concatenate(act_all), dims, n_fields=nb,
            per_field_lam=True, coarse_size=200 * nb, deflate=defl)

    def apply_df(self, rh, rl):
        """df32 apply on lattice vectors; fixed operator to ~2^-48."""
        n, N = self.n_pts, self.N
        if self.joint is None:
            return self.batched.apply_df(rh, rl)
        # gather the batched fields' contiguous segments, apply, and
        # interleave the joint (phi_i, phi_e) result back
        segs_h = [jax.lax.slice(rh, (f * n,), ((f + 1) * n,))
                  for f in self.batch_fields]
        segs_l = [jax.lax.slice(rl, (f * n,), ((f + 1) * n,))
                  for f in self.batch_fields]
        zh, zl = self.batched.apply_df(jnp.concatenate(segs_h),
                                       jnp.concatenate(segs_l))
        lo_i, lo_e = N * n, (2 * N + 1) * n
        jh = jnp.concatenate([jax.lax.slice(rh, (lo_i,), (lo_i + n,)),
                              jax.lax.slice(rh, (lo_e,), (lo_e + n,))])
        jl = jnp.concatenate([jax.lax.slice(rl, (lo_i,), (lo_i + n,)),
                              jax.lax.slice(rl, (lo_e,), (lo_e + n,))])
        ph, pl = self.joint.apply_df(jh, jl)
        outs_h, outs_l = [], []
        slot = 0
        for f in range(self.nf):
            if f == N:
                outs_h.append(ph[:n]); outs_l.append(pl[:n])
            elif f == 2 * N + 1:
                outs_h.append(ph[n:]); outs_l.append(pl[n:])
            else:
                outs_h.append(
                    jax.lax.slice(zh, (slot * n,), ((slot + 1) * n,)))
                outs_l.append(
                    jax.lax.slice(zl, (slot * n,), ((slot + 1) * n,)))
                slot += 1
        return jnp.concatenate(outs_h), jnp.concatenate(outs_l)

    # -- phi-first Gauss-Seidel halves (pc_mode "amg_gs") --------------
    def apply_df_part(self, rh, rl, part):
        """Masked half-apply on lattice vectors: part='phi' runs only the
        joint (phi_i, phi_e) hierarchy, part='ion' only the batched
        concentration hierarchy; zeros elsewhere.  The solver composes the
        triangular sweep with the step's own stencil matvec."""
        if self.joint is None:   # not an assert: must survive python -O
            raise ValueError("amg_gs needs the joint phi pair "
                             "(mode amg_phi/amg_gs)")
        n, N = self.n_pts, self.N
        zero = jnp.zeros((n,), dtype=rh.dtype)
        if part == "phi":
            lo_i, lo_e = N * n, (2 * N + 1) * n
            jh = jnp.concatenate([jax.lax.slice(rh, (lo_i,), (lo_i + n,)),
                                  jax.lax.slice(rh, (lo_e,), (lo_e + n,))])
            jl = jnp.concatenate([jax.lax.slice(rl, (lo_i,), (lo_i + n,)),
                                  jax.lax.slice(rl, (lo_e,), (lo_e + n,))])
            ph, pl = self.joint.apply_df(jh, jl)
            outs_h, outs_l = [], []
            for f in range(self.nf):
                if f == N:
                    outs_h.append(ph[:n]); outs_l.append(pl[:n])
                elif f == 2 * N + 1:
                    outs_h.append(ph[n:]); outs_l.append(pl[n:])
                else:
                    outs_h.append(zero); outs_l.append(zero)
            return jnp.concatenate(outs_h), jnp.concatenate(outs_l)
        segs_h = [jax.lax.slice(rh, (f * n,), ((f + 1) * n,))
                  for f in self.batch_fields]
        segs_l = [jax.lax.slice(rl, (f * n,), ((f + 1) * n,))
                  for f in self.batch_fields]
        zh, zl = self.batched.apply_df(jnp.concatenate(segs_h),
                                       jnp.concatenate(segs_l))
        outs_h, outs_l = [], []
        slot = 0
        for f in range(self.nf):
            if f in (N, 2 * N + 1):
                outs_h.append(zero); outs_l.append(zero)
            else:
                outs_h.append(
                    jax.lax.slice(zh, (slot * n,), ((slot + 1) * n,)))
                outs_l.append(
                    jax.lax.slice(zl, (slot * n,), ((slot + 1) * n,)))
                slot += 1
        return jnp.concatenate(outs_h), jnp.concatenate(outs_l)

    # -- device-array bundling (utils/devicestate.py pattern) --
    def device_state(self):
        return {"batched": self.batched.device_state(),
                "joint": (self.joint.device_state()
                          if self.joint is not None else None)}

    def install(self, st):
        old = self.device_state()
        self.batched.install(st["batched"])
        if self.joint is not None:
            self.joint.install(st["joint"])
        return old


class BlockDiagonalPreconditioner:
    def __init__(self, assembler, u0, mode: str = "dense", dtype=None,
                 df: bool = False, cache: bool = False,
                 amg_opts: dict | None = None):
        """df: also build the compensated double-f32 application path
        (`apply_df`) — the production-tolerance preconditioner on TPU, where
        a plain f32 apply is a noisy operator that stalls the df32 Krylov
        recurrence (solvers/df32.py).

        amg_opts: extra SmoothedAggregationAMG kwargs for the JOINT
        hierarchies (amg_phi's (phi_i, phi_e) pair, amg2's monolithic),
        e.g. {"smooth_iters": 3, "cycles": 2} — the measured-best joint
        configuration (scripts/pc_lab.py: warm 12.8 its vs 19.4 for the
        block form, exact-application floor 11.2).  Concentration blocks
        keep the default cheap cycle (they are not the bottleneck)."""
        dtype = dtype or assembler.dtype
        u0_np = np.asarray(u0, dtype=np.float64)
        self.mode = mode
        self.df = df
        self.amg_opts = dict(amg_opts or {})
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
                per_component_lam=True, **self.amg_opts)
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

        def jphi_of(bi, be):
            """Joint (phi_i, phi_e) SA-AMG: the 2x2 potential subsystem
            [[B_i, -aM], [-aM^T, B_e]] (a = C_M/F) KEEPS the membrane
            capacitive cross-coupling that block-diagonal P drops — the
            dominant coupling on dense-tissue meshes, and exactly the
            EMI-operator structure the EMI solver already conquers at 6-7
            its with compartment-split aggregates + 2x2 membrane-pair
            smoothing (problems/emi.py:432-463).  Unlike `amg2` (one
            hierarchy over all 8 fields, measured WORSE at the bench point)
            this keeps the well-conditioned concentration blocks on their
            own solvers and spends the joint hierarchy only where the
            coupling lives."""
            from knp_emi_cgx_tpu.solvers.amg import SmoothedAggregationAMG

            J, components, pairs, ni = build_joint_phi(
                assembler, bi, be, self.offsets[N], self.offsets[2 * N + 1])
            jopts = {"smooth_iters": 3, **self.amg_opts}
            amg = SmoothedAggregationAMG(
                J, dtype=dtype, df=df, cache=cache,
                components=components, block_pairs=pairs, **jopts)
            return ("jphi", {"amg": amg, "ni": ni, "e_idx": 2 * N + 1})

        self.phi_blocks = phi_blocks
        self.apply_blocks = []
        for i, b in enumerate(blocks):
            if mode == "dense" or (mode == "mixed" and i in phi_blocks):
                self.apply_blocks.append(dense_of(i, b))
            elif mode in ("amg_phi", "amg_gs") and i in phi_blocks:
                if i == N:
                    self.apply_blocks.append(jphi_of(b, blocks[2 * N + 1]))
                else:
                    self.apply_blocks.append(("skip", None))
            elif mode in ("amg", "amg_phi", "amg_gs"):
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
            elif kind == "jphi":
                out.append(data["amg"].device_state())
            elif kind == "skip":
                out.append(None)
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
            elif kind == "jphi":
                old.append(data["amg"].install(d))
                new_blocks.append((kind, data))
            elif kind == "skip":
                old.append(None)
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
        z_e = None
        for i, (kind, data) in enumerate(self.apply_blocks):
            seg = r[self.offsets[i]:self.offsets[i + 1]]
            if kind == "dense":
                outs.append(data @ seg)
            elif kind == "amg":
                outs.append(data(seg))
            elif kind == "jphi":
                e = data["e_idx"]
                r_e = r[self.offsets[e]:self.offsets[e + 1]]
                z = data["amg"](jnp.concatenate([seg, r_e]))
                outs.append(z[:data["ni"]])
                z_e = z[data["ni"]:]
            elif kind == "skip":
                outs.append(z_e)
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
        ze_h = ze_l = None
        for i, (kind, data) in enumerate(self.apply_blocks):
            sh = rh[self.offsets[i]:self.offsets[i + 1]]
            sl = rl[self.offsets[i]:self.offsets[i + 1]]
            if kind == "dense":
                yh, yl = dense_mv_df(data.astype(jnp.float32), sh, sl)
            elif kind == "amg":
                yh, yl = data.apply_df(sh, sl)
            elif kind == "jphi":
                e = data["e_idx"]
                eh = rh[self.offsets[e]:self.offsets[e + 1]]
                el = rl[self.offsets[e]:self.offsets[e + 1]]
                zh, zl = data["amg"].apply_df(
                    jnp.concatenate([sh, eh]), jnp.concatenate([sl, el]))
                ni = data["ni"]
                yh, yl = zh[:ni], zl[:ni]
                ze_h, ze_l = zh[ni:], zl[ni:]
            elif kind == "skip":
                yh, yl = ze_h, ze_l
            else:
                raise NotImplementedError(
                    "df32 apply supports dense/amg block modes")
            outs_h.append(yh)
            outs_l.append(yl)
        return jnp.concatenate(outs_h), jnp.concatenate(outs_l)

    # -- phi-first Gauss-Seidel halves (pc_mode "amg_gs") --------------
    # The solver composes z = z_phi + M_ion(r - A z_phi); this class only
    # provides the two masked half-applies (zeros outside the part), so
    # the per-apply cost of the triangular sweep is exactly one diagonal
    # apply + one operator matvec.

    def apply_part(self, r, part):
        if self.mode == "amg2":  # not an assert: must survive python -O
            raise ValueError("amg_gs parts need per-block structure "
                             "(any pc_mode except amg2)")
        want_phi = part == "phi"
        outs = []
        z_e = None
        for i, (kind, data) in enumerate(self.apply_blocks):
            seg = r[self.offsets[i]:self.offsets[i + 1]]
            if (i in self.phi_blocks) != want_phi:
                outs.append(jnp.zeros_like(seg))
            elif kind == "dense":
                outs.append(data @ seg)
            elif kind == "amg":
                outs.append(data(seg))
            elif kind == "jphi":
                e = data["e_idx"]
                r_e = r[self.offsets[e]:self.offsets[e + 1]]
                z = data["amg"](jnp.concatenate([seg, r_e]))
                outs.append(z[:data["ni"]])
                z_e = z[data["ni"]:]
            elif kind == "skip":
                outs.append(z_e)
            else:
                outs.append(_chebyshev(data, seg))
        return jnp.concatenate(outs)

    def apply_df_part(self, rh, rl, part):
        if self.mode == "amg2":  # not an assert: must survive python -O
            raise ValueError("amg_gs parts need per-block structure "
                             "(any pc_mode except amg2)")
        from knp_emi_cgx_tpu.solvers.df32 import dense_mv_df

        want_phi = part == "phi"
        outs_h, outs_l = [], []
        ze_h = ze_l = None
        for i, (kind, data) in enumerate(self.apply_blocks):
            sh = rh[self.offsets[i]:self.offsets[i + 1]]
            sl = rl[self.offsets[i]:self.offsets[i + 1]]
            if (i in self.phi_blocks) != want_phi:
                yh, yl = jnp.zeros_like(sh), jnp.zeros_like(sl)
            elif kind == "dense":
                yh, yl = dense_mv_df(data.astype(jnp.float32), sh, sl)
            elif kind == "amg":
                yh, yl = data.apply_df(sh, sl)
            elif kind == "jphi":
                e = data["e_idx"]
                eh = rh[self.offsets[e]:self.offsets[e + 1]]
                el = rl[self.offsets[e]:self.offsets[e + 1]]
                zh, zl = data["amg"].apply_df(
                    jnp.concatenate([sh, eh]), jnp.concatenate([sl, el]))
                ni = data["ni"]
                yh, yl = zh[:ni], zl[:ni]
                ze_h, ze_l = zh[ni:], zl[ni:]
            elif kind == "skip":
                yh, yl = ze_h, ze_l
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
