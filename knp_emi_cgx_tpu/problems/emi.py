"""EMI (Extracellular-Membrane-Intracellular) problem — the 2-field
(phi_i, phi_e) specialisation with constant conductivities.

Re-design of the reference's `EMI/EMIx_problem.py` + `EMIx_solver.py`:

  bilinear form (EMIx_problem.py:152-161, assembled ONCE — the operator is
  time-independent):
      a00 = dt sigma_i grad(ui).grad(vi) dxi + C_M ui vi dS
      a01 = -C_M ue vi dS        a10 = -C_M ui ve dS
      a11 = dt sigma_e grad(ue).grad(ve) dxe + C_M ue ve dS
  per-step RHS:
      fi = dt (src_i, vi) dxi + (C_M phi_M - dt I_ch, vi) dS
      fe = dt (src_e, ve) dxe - (C_M phi_M - dt I_ch, ve) dS

Note: the reference's `setup_linear_form` (EMIx_problem.py:216-217)
multiplies the membrane RHS by an extra dt — inconsistent with its own
self-contained verification (`EMI/tests/square_test.py:351-355`), whose form
we follow (the main EMI path there is one of the stale/broken pieces noted
in SURVEY §2.1).

The EMI operator being static makes the direct path especially cheap: the
(deflated) matrix is factorised once and each step is a single dense solve;
the iterative path uses GMRES with per-side (sigma K + M) AMG blocks
(EMIx_problem.py:240-241).
"""
from __future__ import annotations

import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from knp_emi_cgx_tpu.config import SimulationConfig, load_config
from knp_emi_cgx_tpu.fem.p1 import (cell_geometry, facet_geometry,
                                    facet_quadrature, reference_mass)
from knp_emi_cgx_tpu.mesh.generation import SimplexMesh
from knp_emi_cgx_tpu.mesh.topology import build_topology
from knp_emi_cgx_tpu.models.gating import rush_larsen_update
from knp_emi_cgx_tpu.ops.spmv import csr_mv, expand_row_ids
from knp_emi_cgx_tpu.solvers.krylov import gmres


class EMIIonicModel:
    """Base EMI membrane model (EMIx_ionic_model.py:27-45)."""

    def has_gating(self):
        return False

    def current(self, phi_m, gates, t, params):
        raise NotImplementedError


class EMIPassiveModel(EMIIonicModel):
    """I_ch = phi_M (EMIx_ionic_model.py:49-59)."""

    def current(self, phi_m, gates, t, params):
        return phi_m


class EMIHodgkinHuxley(EMIIonicModel):
    """HH with FIXED Nernst potentials (EMIx_ionic_model.py:62-137):
    E_Na = 54.8 mV, E_K = -88.98 mV, E_Cl = 0; optional time-dependent
    synaptic conductance g_syn(t) added to g_Na."""

    n_init = 0.27622914792
    m_init = 0.03791834627
    h_init = 0.68848921811
    g_Na_bar = 1200.0
    g_K_bar = 360.0
    g_Na_leak = 1.0
    g_K_leak = 4.0
    g_Cl_leak = 0.0
    V_rest = -0.065
    E_Na = 54.8e-3
    E_K = -88.98e-3
    E_Cl = 0.0
    time_steps_ode = 25

    def __init__(self, stim_fun=None):
        self.stim_fun = stim_fun

    def has_gating(self):
        return True

    def current(self, phi_m, gates, t, params):
        n, m, h = gates["n"], gates["m"], gates["h"]
        g_Na = self.g_Na_leak + self.g_Na_bar * m ** 3 * h
        g_K = self.g_K_leak + self.g_K_bar * n ** 4
        g_Cl = self.g_Cl_leak
        if self.stim_fun is not None:
            g_Na = g_Na + self.stim_fun(t)
        return (g_Na * (phi_m - self.E_Na) + g_K * (phi_m - self.E_K)
                + g_Cl * (phi_m - self.E_Cl))


def g_syn_default(t):
    """Reference stimulus (EMIx_ionic_model.py:15-23)."""
    return 40.0 * jnp.exp(-jnp.mod(t, 0.01) / 0.002)


class EMIState(NamedTuple):
    phi: jnp.ndarray     # [2, nV] (phi_i, phi_e)
    phi_m: jnp.ndarray   # [nV]
    n: jnp.ndarray
    m: jnp.ndarray
    h: jnp.ndarray
    t: jnp.ndarray
    x: jnp.ndarray       # [n_dofs] warm start


class ProblemEMI:
    """EMI problem: 2 restricted CG1 fields coupled on the membrane."""

    # reference defaults (EMIx_problem.py:312-320)
    DEFAULT_C_M = 0.1
    DEFAULT_PHI_M_INIT = -0.06774

    def __init__(self, config: str | SimulationConfig | dict,
                 mesh: SimplexMesh | None = None, dtype=jnp.float64,
                 source_i=None, source_e=None, phi_m_init_fn=None):
        """source_i/source_e: optional callables (pts[...,dim], t) -> values,
        integrated as P1 interpolants (matching square_test.py:337-344 which
        interpolates the forcing into P1 each step).  phi_m_init_fn: optional
        callable pts -> initial membrane potential (MMS)."""
        if isinstance(config, str):
            config = load_config(config)
        elif isinstance(config, dict):
            from knp_emi_cgx_tpu.config import parse_config
            config = parse_config(config)
        self.cfg = config
        self.dtype = dtype
        self.sigma_i = config.sigma_i
        self.sigma_e = config.sigma_e
        # reference default C_M = 0.1 for EMI (EMIx_problem.py:312) unless set
        self.C_M = (float(config.raw["C_M"]) if "C_M" in (config.raw or {})
                    else self.DEFAULT_C_M)
        self.dt = config.dt
        ic = config.initial_conditions or {}
        self.phi_m_init = float(ic.get("phi_m", self.DEFAULT_PHI_M_INIT))

        self.source_i = source_i
        self.source_e = source_e
        self.phi_m_init_fn = phi_m_init_fn
        if mesh is None:
            raise ValueError("Pass a tagged SimplexMesh (or use the XDMF reader)")
        facet_tagger = getattr(mesh, "_facet_tagger", None)
        self.topo = build_topology(
            mesh, facet_tagger=facet_tagger,
            intra_tags=config.intra_tags, extra_tag=config.extra_tag,
            gamma_tags=config.gamma_tags, boundary_tags=config.boundary_tags)
        if config.mesh_conversion_factor != 1.0:
            self.topo.mesh = self.topo.mesh.scaled(config.mesh_conversion_factor)

        self.ionic_models: list[EMIIonicModel] = []
        self._built = False

    # ------------------------------------------------------------------
    def init_ionic_models(self, models):
        self.ionic_models = list(models)
        self.gating = any(m.has_gating() for m in self.ionic_models)
        self._build()

    def _build(self):
        topo = self.topo
        mesh = topo.mesh
        dim = mesh.dim
        dtype = self.dtype
        self.order = order = int(getattr(self.cfg, "fem_order", 1))

        # dof space: P1 vertices, or the P2 node space (vertices + edge
        # midpoints — vertex-indexed I/O keeps working on the [:nV] prefix)
        if order == 2:
            from knp_emi_cgx_tpu.fem.p2 import (build_node_space,
                                                facet_shape_values,
                                                reference_tensors)
            ns2 = build_node_space(topo, boundary_tags=self.cfg.boundary_tags)
            self.node_space = ns2
            n_pts = ns2.n_nodes
            self.points = ns2.node_points
            intra, extra = ns2.intra_nodes, ns2.extra_nodes
            cell_tab = ns2.cell_nodes
            mtab = ns2.membrane_facet_nodes
            bset = ns2.boundary_nodes
            M2, E2, _ = reference_tensors(dim)
        else:
            n_pts = mesh.num_points
            self.points = mesh.points
            intra, extra = topo.intra_dofs, topo.extra_dofs
            cell_tab = mesh.cells
            mtab = topo.membrane_verts
            bset = topo.boundary_dofs
        self.n_pts = n_pts
        self.cell_tab = cell_tab
        self.mtab_np = mtab

        ni, ne = len(intra), len(extra)
        self.ni, self.ne = ni, ne
        self.n_dofs = ni + ne
        rank_i = np.full(n_pts, -1, dtype=np.int64)
        rank_i[intra] = np.arange(ni)
        rank_e = np.full(n_pts, -1, dtype=np.int64)
        rank_e[extra] = np.arange(ne)
        fd = np.full((2, n_pts), -1, dtype=np.int64)
        fd[0] = np.where(rank_i >= 0, rank_i, -1)
        fd[1] = np.where(rank_e >= 0, ni + rank_e, -1)
        self.field_dof = fd

        grads, vols = cell_geometry(mesh.points, mesh.cells)
        Mref = reference_mass(dim)

        rows, cols, vals = [], [], []
        self._side_geom = []
        for f, (cells_idx, sigma) in enumerate(
                ((topo.intra_cells, self.sigma_i),
                 (topo.extra_cells, self.sigma_e))):
            Vt = cell_tab[cells_idx]
            g = grads[cells_idx]
            v = vols[cells_idx]
            # per-cell P1 metric S_c = vol * (g.g); the P2 stiffness is its
            # contraction with the static reference tensor E (fem/p2.py)
            S = np.einsum("cai,cbi->cab", g, g) * v[:, None, None]
            if order == 2:
                K = np.einsum("cpr,apbr->cab", S, E2)
                M_e = v[:, None, None] * M2[None, :, :]
            else:
                K = S
                M_e = v[:, None, None] * Mref[None, :, :]
            blk = self.dt * sigma * K
            R = fd[f][Vt][:, :, None]
            C = fd[f][Vt][:, None, :]
            rows.append(np.broadcast_to(R, blk.shape).ravel())
            cols.append(np.broadcast_to(C, blk.shape).ravel())
            vals.append(blk.ravel())
            self._side_geom.append((Vt, M_e))

        # membrane facet mass blocks (measures from the vertex geometry,
        # shape tables of the chosen order at the same quadrature)
        mverts = topo.membrane_verts
        if order == 2:
            Nq, wq = facet_shape_values(dim, degree=10)
        else:
            Nq, wq = facet_quadrature(dim, degree=10)
        L_f = facet_geometry(mesh.points, mverts)
        NN = np.einsum("q,qa,qb->ab", wq, Nq, Nq)
        Mg = self.C_M * L_f[:, None, None] * NN[None, :, :]
        for (rf, cf, sgn) in ((0, 0, 1.0), (0, 1, -1.0), (1, 0, -1.0), (1, 1, 1.0)):
            R = fd[rf][mtab][:, :, None]
            C = fd[cf][mtab][:, None, :]
            rows.append(np.broadcast_to(R, Mg.shape).ravel())
            cols.append(np.broadcast_to(C, Mg.shape).ravel())
            vals.append((sgn * Mg).ravel())

        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        vals = np.concatenate(vals)
        A = sp.csr_matrix((vals, (rows, cols)), shape=(self.n_dofs, self.n_dofs))
        A.sum_duplicates()

        # Dirichlet BC on the extracellular potential at the outer boundary
        # (EMIx_problem.py:89-103): rows/cols zeroed, unit diagonal; the
        # (static) lifting vector handles nonzero constant values
        bc_flag = np.zeros(self.n_dofs, dtype=bool)
        self.bc_value = float((self.cfg.initial_conditions or {}).get(
            "phi_e", 0.0))
        if self.cfg.dirichlet_bcs:
            d = fd[1][bset]
            bc_flag[d[d >= 0]] = True
            A = A.tolil()
            g = np.zeros(self.n_dofs)
            g[bc_flag] = self.bc_value
            self.lift_host = np.asarray(A @ g).ravel()
            A[bc_flag, :] = 0.0
            A[:, bc_flag] = 0.0
            A[np.nonzero(bc_flag)[0], np.nonzero(bc_flag)[0]] = 1.0
            A = A.tocsr()
        else:
            self.lift_host = np.zeros(self.n_dofs)
        self.bc_flag_np = bc_flag
        self.bc_flag = jnp.asarray(bc_flag)
        self.lift = jnp.asarray(self.lift_host, dtype=dtype)
        self.has_bcs = bool(bc_flag.any())
        self.A_host = A
        self.indices = jnp.asarray(A.indices, dtype=jnp.int32)
        self.row_ids = expand_row_ids(A.indptr)
        self.A_vals = jnp.asarray(A.data, dtype=dtype)

        # facet RHS structure: C_M*phi_M - dt*I_ch integrated against the
        # facet shape functions; per-facet model masks
        self.mverts = jnp.asarray(mtab, dtype=jnp.int32)
        self.LwN = jnp.asarray(
            np.einsum("f,q,qa->fqa", L_f, wq, Nq), dtype=dtype)
        self.Nq = jnp.asarray(Nq, dtype=dtype)
        rhs_rows = np.concatenate([fd[0][mtab].ravel(),
                                   fd[1][mtab].ravel()])
        self.rhs_rows = jnp.asarray(rhs_rows, dtype=jnp.int32)

        # volume geometry for sources (device)
        self._vsrc = []
        for f in range(2):
            Vt, M_e = self._side_geom[f]
            self._vsrc.append({
                "rows": jnp.asarray(fd[f][Vt].ravel(), dtype=jnp.int32),
                "M_e": jnp.asarray(M_e, dtype=dtype),
                "pts": jnp.asarray(self.points[Vt], dtype=dtype),
            })

        # nullspace (all-ones over both potentials, EMIx_solver.py:194-216)
        ns = np.zeros(self.n_dofs)
        ns[:] = 1.0
        ns /= np.linalg.norm(ns)
        self.nullspace = jnp.asarray(ns, dtype=dtype)

        # deflated dense solve operator for the (static) direct path
        self._dense_inv = None
        self._built = True

    # ------------------------------------------------------------------
    def initial_state(self) -> EMIState:
        nV = self.n_pts
        dt = self.dtype
        phi = np.zeros((2, nV))
        if self.phi_m_init_fn is not None:
            phi_m = np.asarray(self.phi_m_init_fn(self.points))
            phi[0, :] = phi_m
        else:
            phi[0, :] = self.phi_m_init
            phi_m = np.full(nV, self.phi_m_init)
        hh = next((m for m in self.ionic_models
                   if isinstance(m, EMIHodgkinHuxley)), None)
        x = np.zeros(self.n_dofs)
        fd = self.field_dof
        for f in range(2):
            active = np.nonzero(fd[f] >= 0)[0]
            x[fd[f, active]] = phi[f, active]
        return EMIState(
            phi=jnp.asarray(phi, dtype=dt),
            phi_m=jnp.asarray(phi_m, dtype=dt),
            n=jnp.full(nV, hh.n_init if hh else 0.0, dtype=dt),
            m=jnp.full(nV, hh.m_init if hh else 0.0, dtype=dt),
            h=jnp.full(nV, hh.h_init if hh else 0.0, dtype=dt),
            t=jnp.asarray(0.0, dtype=dt),
            x=jnp.asarray(x, dtype=dt),
        )

    def rhs(self, phi_m, gates, t):
        """Per-step RHS (jittable)."""
        pm_q = jnp.einsum("fd,qd->fq", phi_m[self.mverts], self.Nq)
        gq = {k: jnp.einsum("fd,qd->fq", v[self.mverts], self.Nq)
              for k, v in gates.items()}
        I_ch = sum(m.current(pm_q, gq, t, None) for m in self.ionic_models)
        fg = self.C_M * pm_q - self.dt * I_ch
        contrib = jnp.einsum("fqa,fq->fa", self.LwN, fg)
        vals = jnp.concatenate([contrib.ravel(), -contrib.ravel()])
        b = jax.ops.segment_sum(vals, self.rhs_rows,
                                num_segments=self.n_dofs)
        for f, src in ((0, self.source_i), (1, self.source_e)):
            if src is None:
                continue
            d = self._vsrc[f]
            fv = src(d["pts"], t)                       # [nc, nv] P1 values
            contrib = self.dt * jnp.einsum("cab,cb->ca", d["M_e"], fv)
            b = b + jax.ops.segment_sum(contrib.ravel(), d["rows"],
                                        num_segments=self.n_dofs)
        if self.has_bcs:
            b = b - self.lift
            b = jnp.where(self.bc_flag, self.bc_value, b)
        return b

    def l2_norms(self, state: EMIState):
        out = {}
        for name, f, side in (("phi_i", 0, 0), ("phi_e", 1, 1)):
            Vt, M_e = self._side_geom[side]
            v = np.asarray(state.phi[f])[Vt]
            out[name] = float(np.sqrt(np.einsum("cab,ca,cb->", M_e, v, v)))
        return out


class SolverEMI:
    """Time-stepping driver for EMI.  The operator is factorised/analysed
    once; each step only rebuilds the RHS (EMIx_solver.py:218-346)."""

    def __init__(self, problem: ProblemEMI, solver_config: dict | None = None):
        self.problem = problem
        sc = dict(solver_config or problem.cfg.solver_config or {})
        self.direct = bool(sc.get("direct", True))
        ksp = sc.get("ksp_settings", {}) or {}
        self.rtol = float(ksp.get("ksp_rtol", 1e-8))
        # EMI iterative defaults (tuned on the square MMS at rtol 1e-10,
        # mesh-robust 6/7/7 its at N=16/32/64): two V-cycles per
        # application, 3 smoothing sweeps, compartment-split aggregates and
        # 2x2 membrane-pair block smoothing (see _build_step) — better than
        # the reference's per-field fieldsplit (EMIx_solver.py:131-170)
        self.amg_cycles = int(ksp.get("amg_cycles", 2))
        self.smooth_iters = int(ksp.get("smooth_iters", 3))
        self.time_steps = problem.cfg.time_steps
        self.iterations: list[int] = []
        self._step = None
        self._amg = None

    def _build_step(self):
        p = self.problem
        hh = next((m for m in p.ionic_models
                   if isinstance(m, EMIHodgkinHuxley)), None)
        fd = p.field_dof
        scat = []
        for f in range(2):
            active = np.nonzero(fd[f] >= 0)[0]
            scat.append((jnp.asarray(active, dtype=jnp.int32),
                         jnp.asarray(fd[f, active], dtype=jnp.int32)))

        if self.direct:
            # dense inverse computed once on host; deflated (bordered) when
            # the pure-Neumann system is singular
            n = p.n_dofs
            if p.has_bcs:
                inv = np.linalg.inv(p.A_host.toarray())
                inv = np.concatenate([inv, np.zeros((n, 1))], axis=1)
            else:
                M = np.zeros((n + 1, n + 1))
                M[:n, :n] = p.A_host.toarray()
                ns = np.asarray(p.nullspace, dtype=np.float64)
                M[:n, n] = ns
                M[n, :n] = ns
                inv = np.linalg.inv(M)[:n, :]
            dense_inv = jnp.asarray(inv, dtype=p.dtype)
            solve_arrays = {"dense_inv": dense_inv}
        else:
            from knp_emi_cgx_tpu.solvers.amg import SmoothedAggregationAMG

            # The EMI operator is SYMMETRIC (the membrane coupling blocks are
            # each other's transposes), so one AMG hierarchy on the WHOLE
            # matrix is both valid and much stronger than block-diagonal
            # preconditioning (which ignores the dominant membrane coupling
            # at small dt) — an improvement over the reference's per-block
            # preconditioner (EMIx_problem.py:240-245).  The near-kernel of
            # the EMI operator is (#compartments+1)-dimensional (constants
            # per biological cell + ECS constant, jump-penalised only at
            # C_M scale), so aggregates are forbidden from spanning
            # compartments — the tentative prolongation then reproduces all
            # jump modes exactly.
            topo, mesh = p.topo, p.topo.mesh
            comp_v = np.zeros(p.n_pts, dtype=np.int64)
            ic = topo.intra_cells
            comp_v[p.cell_tab[ic].ravel()] = np.repeat(
                np.asarray(mesh.cell_tags)[ic], p.cell_tab.shape[1])
            components = np.zeros(p.n_dofs, dtype=np.int64)
            fdn = p.field_dof
            act0 = np.nonzero(fdn[0] >= 0)[0]
            components[fdn[0, act0]] = comp_v[act0] + 1  # 0 is the ECS label
            # 2x2 smoothing blocks on (intra,extra) membrane dof partners —
            # pointwise Jacobi cannot damp their difference mode when the
            # membrane mass dominates (C_M >> dt*sigma/h)
            mv = np.unique(np.asarray(p.mtab_np).ravel())
            d0, d1 = fdn[0][mv], fdn[1][mv]
            ok = (d0 >= 0) & (d1 >= 0)
            block_pairs = np.stack([d0[ok], d1[ok]], axis=1)
            self._amg = SmoothedAggregationAMG(p.A_host.tocsr(), dtype=p.dtype,
                                               smooth_iters=self.smooth_iters,
                                               components=components,
                                               block_pairs=block_pairs)
            solve_arrays = {
                "A_vals": p.A_vals, "indices": p.indices,
                "row_ids": p.row_ids, "ns": p.nullspace,
                "amg": self._amg.device_state(),
            }

        bundle = {
            "solve": solve_arrays,
            "scat": scat,
            "rhs": {"mverts": p.mverts, "LwN": p.LwN, "Nq": p.Nq,
                    "rhs_rows": p.rhs_rows},
        }
        ni = p.ni
        gating = p.gating
        rtol = self.rtol
        direct = self.direct
        amg = self._amg
        cycles = self.amg_cycles

        def step(state: EMIState, bundle):
            old = {k: getattr(p, k) for k in bundle["rhs"]}
            for k, v in bundle["rhs"].items():
                setattr(p, k, v)
            try:
                t_new = state.t + p.dt
                n_, m_, h_ = state.n, state.m, state.h
                if gating:
                    n_, m_, h_ = rush_larsen_update(
                        n_, m_, h_, state.phi_m, hh.V_rest,
                        p.dt / hh.time_steps_ode, hh.time_steps_ode)
                gates = {"n": n_, "m": m_, "h": h_}
                b = p.rhs(state.phi_m, gates, t_new)
                if direct:
                    bb = jnp.concatenate([b, jnp.zeros(1, dtype=b.dtype)])
                    x = bundle["solve"]["dense_inv"] @ bb
                    its = jnp.array(0)
                else:
                    sa = bundle["solve"]
                    old_amg = amg.install(sa["amg"])

                    def matvec(v):
                        return csr_mv(sa["A_vals"], v, sa["indices"],
                                      sa["row_ids"], p.n_dofs)

                    def M(r):
                        x = amg(r)
                        for _ in range(cycles - 1):
                            x = x + amg(r - matvec(x))
                        return x

                    res = gmres(
                        matvec, b, state.x, M=M,
                        nullspace=None if p.has_bcs else sa["ns"],
                        rtol=rtol, project_nullspace=not p.has_bcs)
                    amg.install(old_amg)
                    x = res.x
                    its = res.iterations
                phi = state.phi
                for f in range(2):
                    verts, dofs = bundle["scat"][f]
                    phi = phi.at[f, verts].set(x[dofs])
                phi_m = phi[0] - phi[1]
                return EMIState(phi=phi, phi_m=phi_m, n=n_, m=m_, h=h_,
                                t=t_new, x=x), its
            finally:
                for k, v in old.items():
                    setattr(p, k, v)

        jitted = jax.jit(step)
        self._bundle = bundle
        return lambda state: jitted(state, self._bundle)

    def solve(self, state: EMIState | None = None, callback=None) -> EMIState:
        p = self.problem
        if state is None:
            state = p.initial_state()
        if self._step is None:
            self._step = self._build_step()
        for i in range(1, self.time_steps + 1):
            state, its = self._step(state)
            if not self.direct:
                self.iterations.append(int(its))
            if callback is not None:
                callback(i, state)
        return state
