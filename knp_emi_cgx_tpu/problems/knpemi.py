"""KNP-EMI problem and solver — the user-facing API.

Mirrors the reference's `ProblemKNPEMI` (KNPEMIx_problem.py) and
`SolverKNPEMI` (KNPEMIx_solver.py) workflow:

    problem = ProblemKNPEMI(config)          # mesh, spaces, constants, BCs
    problem.init_ionic_models([HH, ATP, NeuronalCT])
    solver  = SolverKNPEMI(problem, solver_config)
    solver.solve()

but the whole timestep — gating ODE sweep, operator/RHS re-assembly, linear
solve, field scatter — is ONE jitted function over an HBM-resident state
pytree.  I/O (point traces, checkpoints, norms) happens outside the jit on a
configurable cadence.
"""
from __future__ import annotations

import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.config import SimulationConfig, load_config
from knp_emi_cgx_tpu.mesh.generation import SimplexMesh
from knp_emi_cgx_tpu.mesh.topology import MeshTopology, build_topology
from knp_emi_cgx_tpu.models.gating import rush_larsen_update, forward_euler_update
from knp_emi_cgx_tpu.models.ionic import HodgkinHuxley
from knp_emi_cgx_tpu.models.params import KNPEMIParams, params_from_config
from knp_emi_cgx_tpu.ops.assembly import KNPEMIAssembler
from knp_emi_cgx_tpu.ops.spmv import csr_mv
from knp_emi_cgx_tpu.solvers.direct import dense_solve, dense_solve_deflated
from knp_emi_cgx_tpu.solvers.krylov import gmres
from knp_emi_cgx_tpu.solvers.precond import (BlockDiagonalPreconditioner,
                                              LatticeBlockPreconditioner)


class KNPEMIState(NamedTuple):
    """Simulation state pytree (device-resident)."""

    u: jnp.ndarray        # [nf, nV] field values (prev step)
    phi_m: jnp.ndarray    # [nV]
    n: jnp.ndarray        # [nV] gating
    m: jnp.ndarray
    h: jnp.ndarray
    t: jnp.ndarray        # scalar time
    x: jnp.ndarray        # [n_dofs] monolithic solver vector (warm start)


class ProblemKNPEMI:
    """Setup: mesh/topology, parameters, restrictions, assembler."""

    def __init__(self,
                 config: str | SimulationConfig,
                 mesh: SimplexMesh | None = None,
                 topology: MeshTopology | None = None,
                 dtype=jnp.float64):
        if isinstance(config, str):
            config = load_config(config)
        self.cfg = config
        self.params: KNPEMIParams = params_from_config(config)
        self.dtype = dtype

        self.mms = None
        if config.mms_test:
            # MMS runs on the generated unit square/cube with per-plane
            # membrane tags (mixed_dim_problem.py:683-695): gamma tags are
            # 1..4 (2D) / 1..6 (3D), exterior boundary 8.
            from knp_emi_cgx_tpu.mesh.generation import (
                generate_square_geometry, generate_cube_geometry)
            from knp_emi_cgx_tpu.verification.mms import KNPEMIMMS

            if mesh is None:
                gen = (generate_square_geometry if config.mms_dim == 2
                       else generate_cube_geometry)
                mesh, tagger = gen(config.mms_n_mesh, mms=True)
                mesh._facet_tagger = tagger
            config.gamma_tags = tuple(range(1, 2 * config.mms_dim + 1))
            config.boundary_tags = (8,)
            config.intra_tags = (1,)
            config.extra_tag = (2,)
            config.dirichlet_bcs = True
            self.mms = KNPEMIMMS(config.mms_dim)
            # MMS uses unit constants and unit-diffusivity ions with z = +-1
            # (setup_MMS_params, KNPEMIx_problem.py:750-805)
            assert np.allclose(
                [self.params.C_M, self.params.F, self.params.R,
                 self.params.psi], 1.0), \
                "MMS requires all physical constants equal to 1"
            for ion in self.params.ion_list:
                ion["Di"] = ion["De"] = 1.0
                ion["z"] = 1.0 if ion["name"] in ("Na", "K") else -1.0

        if topology is not None:
            self.topo = topology
        else:
            if mesh is None:
                mesh = self._load_or_generate_mesh()
            if mesh.cell_tags is None:
                raise ValueError("mesh must carry cell tags")
            facet_tagger = getattr(mesh, "_facet_tagger", None)
            facet_tags_raw = getattr(mesh, "_facet_tags_raw", None)
            self.topo = build_topology(
                mesh,
                facet_tagger=facet_tagger,
                facet_tags_raw=facet_tags_raw,
                intra_tags=config.intra_tags,
                extra_tag=config.extra_tag,
                gamma_tags=config.gamma_tags,
                boundary_tags=config.boundary_tags,
            )
        # scale coordinates AFTER tagging (mixed_dim_problem.py:681)
        if config.mesh_conversion_factor != 1.0:
            self.topo.mesh = self.topo.mesh.scaled(config.mesh_conversion_factor)

        self.ionic_models = []
        self.gating_variables = False
        self.assembler: KNPEMIAssembler | None = None

        # neuron/glia vertex dofs (KNPEMIx_problem.py:398-400)
        ct = self.topo.mesh.cell_tags
        cells = self.topo.mesh.cells
        self.neuron_dofs = np.unique(
            cells[np.isin(ct, config.neuron_tags)].ravel())
        if config.glia_flag:
            self.glia_dofs = np.unique(
                cells[np.isin(ct, config.glia_tags)].ravel())
        else:
            self.glia_dofs = np.array([], dtype=np.int64)

    # ------------------------------------------------------------------
    def _load_or_generate_mesh(self) -> SimplexMesh:
        from knp_emi_cgx_tpu.io.xdmf import read_mesh_xdmf

        cfg = self.cfg
        if cfg.mesh_file is None:
            raise ValueError("No mesh file configured and no mesh passed")
        return read_mesh_xdmf(cfg.mesh_file, cfg.facet_file)

    # ------------------------------------------------------------------
    def init_ionic_models(self, models):
        """Register membrane models and build the assembler
        (reference init_ionic_models, mixed_dim_problem.py:435-465)."""
        self.ionic_models = list(models)
        for m in self.ionic_models:
            if hasattr(m, "finalize"):
                m.finalize(self.params)
            if isinstance(m, HodgkinHuxley):
                self.gating_variables = True
        # tag coverage check (mixed_dim_problem.py:457-462)
        gamma = set(np.unique(self.topo.membrane_tags).tolist())
        covered = set()
        for m in self.ionic_models:
            covered |= set(m.resolve_tags(sorted(gamma)))
        if covered and not gamma.issubset(covered):
            raise RuntimeError(
                f"Mismatch between membrane tags {sorted(gamma)} and ionic "
                f"model tags {sorted(covered)}")

        # fem_order=2: the dof space becomes the P2 node space (vertices +
        # edge midpoints); vertex-indexed tables are swapped for node tables
        # (the reference parses fem_order but never exercises >1,
        # mixed_dim_problem.py:207-208 — our P2 path is real)
        self.node_space = None
        if int(getattr(self.cfg, "fem_order", 1)) == 2:
            from knp_emi_cgx_tpu.fem.p2 import build_node_space

            self.node_space = ns2 = build_node_space(
                self.topo, boundary_tags=self.cfg.boundary_tags)
            ct = self.topo.mesh.cell_tags
            self.neuron_dofs = ns2.node_set(
                np.isin(ct, self.cfg.neuron_tags))
            if self.cfg.glia_flag:
                self.glia_dofs = ns2.node_set(np.isin(ct, self.cfg.glia_tags))

        # pin_ecs_potential: ground phi_e at one non-membrane dof
        # (KNPEMIx_problem.py:163-196) — makes the system nonsingular
        pinned = None
        if self.cfg.pin_ecs_potential and not self.cfg.dirichlet_bcs:
            if self.node_space is not None:
                mtab = self.node_space.membrane_facet_nodes
                intra_tab = self.node_space.intra_nodes
                extra_tab = self.node_space.extra_nodes
            else:
                mtab = self.topo.membrane_verts
                intra_tab = self.topo.intra_dofs
                extra_tab = self.topo.extra_dofs
            mverts = set(np.unique(mtab).tolist())
            pin_vertex = next(int(v) for v in extra_tab
                              if int(v) not in mverts)
            nvar = self.params.N_ions + 1
            # field_dof not built yet; compute the monolithic index directly
            ni = len(intra_tab)
            ne = len(extra_tab)
            rank = int(np.searchsorted(extra_tab, pin_vertex))
            pinned = np.array([nvar * ni + self.params.N_ions * ne + rank])
            self._pinned_vertex = pin_vertex

        # ion injection source terms (mixed_dim_problem.py:496-540,
        # KNPEMIx_problem.py:200-218): 5 nA of K+/Cl- injected in a box of
        # half-width extent/10 around the mesh centre
        sources = None
        if self.cfg.source_terms == "ion_injection":
            sources = self._build_injection_sources()

        self.assembler = KNPEMIAssembler(
            self.topo, self.params, self.ionic_models,
            dtype=self.dtype,
            dirichlet_bcs=self.cfg.dirichlet_bcs,
            pinned_dofs=pinned,
            source_vertex_values=sources,
            mms=self.mms,
            node_space=self.node_space,
        )

    def _build_injection_sources(self):
        from knp_emi_cgx_tpu.fem.p1 import cell_geometry

        mesh = self.topo.mesh
        p = self.params
        lo = mesh.points.min(axis=0)
        hi = mesh.points.max(axis=0)
        center = 0.5 * (lo + hi)
        delta = (hi[0] - lo[0]) / 10.0
        inside_v = np.all(np.abs(mesh.points - center) <= delta + 1e-14,
                          axis=1)
        inj_cells = inside_v[mesh.cells].all(axis=1)
        _, vols = cell_geometry(mesh.points, mesh.cells)
        vol = vols[inj_cells].sum()
        if vol == 0:
            raise RuntimeError("Ion injection region contains no cells")
        I = 5e-9                      # 5 nA (KNPEMIx_problem.py:211)
        src = I / p.F / vol           # [mol/m^3/s]
        if self.node_space is not None:
            inj_verts = self.node_space.node_set(np.nonzero(inj_cells)[0])
            n_pts = self.node_space.n_nodes
        else:
            inj_verts = np.unique(mesh.cells[inj_cells].ravel())
            n_pts = mesh.num_points
        nvar = p.N_ions + 1
        out = {}
        for name in ("K", "Cl"):
            f = nvar + p.ion_index[name]   # extracellular fields
            vals = np.zeros(n_pts)
            vals[inj_verts] = src
            out[f] = vals
        self.injection_volume = float(vol)
        self.injection_cells = np.nonzero(inj_cells)[0]
        return out

    # ------------------------------------------------------------------
    def initial_state(self) -> KNPEMIState:
        """Initial conditions (KNPEMIx_problem.py:386-450)."""
        p = self.params
        a = self.assembler
        if a is None:
            raise RuntimeError("Call init_ionic_models first")
        nV = a.n_pts        # P1: mesh vertices; P2: vertices + edge midpoints
        nf = a.nf
        u = np.zeros((nf, nV))
        phi_m = np.zeros(nV)

        if self.mms is not None:
            # interpolate exact solutions at t=0 (KNPEMIx_problem.py:363-431);
            # phi fields get the "init" visualisation values and phi_m_prev
            # starts at phi_i_init - phi_e_init = 0, exactly as the reference
            pts = a.points_np
            for k, ion in enumerate(p.ion_list):
                u[k] = self.mms.exact_numpy(f"{ion['name']}_i", pts, 0.0)
                u[a.nvar + k] = self.mms.exact_numpy(f"{ion['name']}_e", pts, 0.0)
            u[a.PHI_I] = self.mms.exact_numpy("phi_e", pts, 0.0)  # = p(x)
            u[a.PHI_E] = self.mms.exact_numpy("phi_e", pts, 0.0)
            phi_m[:] = 0.0
            x = np.zeros(a.n_dofs)
            fd = a.field_dof
            for f in range(nf):
                active = np.nonzero(fd[f] >= 0)[0]
                x[fd[f, active]] = u[f, active]
            dt = self.dtype
            return KNPEMIState(
                u=jnp.asarray(u, dtype=dt),
                phi_m=jnp.asarray(phi_m, dtype=dt),
                n=jnp.full((nV,), p.n_init, dtype=dt),
                m=jnp.full((nV,), p.m_init, dtype=dt),
                h=jnp.full((nV,), p.h_init, dtype=dt),
                t=jnp.asarray(0.0, dtype=dt),
                x=jnp.asarray(x, dtype=dt),
            )

        glia = self.cfg.glia_flag
        for k, ion in enumerate(p.ion_list):
            if glia:
                u[k, self.neuron_dofs] = ion["ki_init"]
                u[k, self.glia_dofs] = ion["ki_init_g"]
            else:
                u[k, :] = ion["ki_init"]
            u[a.nvar + k, :] = ion["ke_init"]
        if glia:
            u[a.PHI_I, self.neuron_dofs] = p.phi_m_init
            u[a.PHI_I, self.glia_dofs] = p.phi_m_g_init
            phi_m[self.neuron_dofs] = p.phi_m_init
            phi_m[self.glia_dofs] = p.phi_m_g_init
        else:
            u[a.PHI_I, :] = p.phi_m_init
            phi_m[:] = p.phi_m_init
        u[a.PHI_E, :] = 0.0

        # monolithic warm-start vector from the ICs
        # (KNPEMIx_solver.py:177-209)
        x = np.zeros(a.n_dofs)
        fd = a.field_dof
        for f in range(nf):
            active = np.nonzero(fd[f] >= 0)[0]
            x[fd[f, active]] = u[f, active]

        # host copy kept for the preconditioner build: reading state.u back
        # from the device would flip the axon runtime into a synchronous
        # per-kernel mode (~3000x step slowdown) — never D2H on the hot path
        self._u0_np = u.copy()

        dt = self.dtype
        return KNPEMIState(
            u=jnp.asarray(u, dtype=dt),
            phi_m=jnp.asarray(phi_m, dtype=dt),
            n=jnp.full((nV,), p.n_init, dtype=dt),
            m=jnp.full((nV,), p.m_init, dtype=dt),
            h=jnp.full((nV,), p.h_init, dtype=dt),
            t=jnp.asarray(0.0, dtype=dt),
            x=jnp.asarray(x, dtype=dt),
        )

    # ------------------------------------------------------------------
    # diagnostics
    # ------------------------------------------------------------------
    def l2_norms(self, state: KNPEMIState):
        """L2 norms of phi_i over Omega_i and phi_e over Omega_e
        (reference main.py:66-87 / golden tests)."""
        a = self.assembler
        norms = {}
        for name, field, side in (("phi_i", a.PHI_I, 0), ("phi_e", a.PHI_E, 1)):
            s = a._sides[side]
            vals = state.u[field][s["Vt"]]
            sq = jnp.einsum("cab,ca,cb->", s["M_e"], vals, vals)
            norms[name] = jnp.sqrt(sq)
        return norms

    def phi_norm_decomposition(self, state: KNPEMIState, side: int = 1):
        """Split a potential's L2 norm into its spatial-mean component and
        the mean-free remainder: returns (norm, mean, deflated_norm) with
        norm^2 == area*mean^2 + deflated^2.

        Rationale (golden iterative parity): the (phi_i, phi_e) joint
        constant is a near-null mode of the semi-implicit operator, so an
        iterative solve leaves a preconditioner-dependent constant in phi
        that a direct solve fixes exactly.  The reference's iterative
        golden value (electric_potential_norms_iterative_solver.py:58-77)
        is sqrt(area)*|that constant| — deflating the mean isolates the
        solver-independent physics (see tests/test_golden_iterative.py)."""
        a = self.assembler
        field = (a.PHI_I, a.PHI_E)[side]
        s = a._sides[side]
        vals = state.u[field][s["Vt"]]
        area = s["M_e"].sum()
        mean = jnp.einsum("cab,ca->", s["M_e"], vals) / area
        sq = jnp.einsum("cab,ca,cb->", s["M_e"], vals, vals)
        deflated = jnp.sqrt(jnp.maximum(sq - area * mean ** 2, 0.0))
        return jnp.sqrt(sq), mean, deflated

    def field_l2_norm(self, state, field: int, side: int):
        a = self.assembler
        s = a._sides[side]
        vals = state.u[field][s["Vt"]]
        return jnp.sqrt(jnp.einsum("cab,ca,cb->", s["M_e"], vals, vals))

    def mms_errors(self, state: KNPEMIState):
        """L2 errors of all 8 fields vs the exact MMS solutions at the
        current time, integrated with the degree-10 cell rule
        (print_errors, KNPEMIx_problem.py:845-907)."""
        from knp_emi_cgx_tpu.fem.p1 import cell_quadrature

        a = self.assembler
        mesh = self.topo.mesh
        if a.order == 2:
            from knp_emi_cgx_tpu.fem.p2 import cell_shape_values

            Nc, wc = cell_shape_values(mesh.dim, degree=10)
        else:
            Nc, wc = cell_quadrature(mesh.dim, degree=10)
        t = float(state.t)
        u = np.asarray(state.u, dtype=np.float64)
        errors = {}
        for si, s in enumerate(a._sides):
            side = "i" if si == 0 else "e"
            Vt = s["Vt_np"]
            # node coords under the matching shape table reproduce the
            # affine map exactly (P2 interpolates linears)
            coords = a.points_np[Vt]                       # [nc, nv, dim]
            qp_x = np.einsum("cvd,qv->cqd", coords, Nc)
            vol = s["M_e_np"].sum(axis=(1, 2))
            names = ([(k, f"{ion['name']}_{side}")
                      for k, ion in enumerate(self.params.ion_list)]
                     + [(self.params.N_ions, f"phi_{side}")])
            off = 0 if si == 0 else a.nvar
            for k, name in names:
                uh = np.einsum("cv,qv->cq", u[off + k][Vt], Nc)
                ex = self.mms.exact_numpy(name, qp_x, t)
                err2 = np.einsum("c,cq,q->", vol, (uh - ex) ** 2, wc)
                errors[name] = float(np.sqrt(err2))
        return errors

    def conservation(self, state: KNPEMIState):
        """Total amount of each ion over both compartments
        (print_conservation, KNPEMIx_problem.py:807-843)."""
        a = self.assembler
        out = {}
        for k, ion in enumerate(self.params.ion_list):
            tot = 0.0
            for side_idx, field in ((0, k), (1, a.nvar + k)):
                s = a._sides[side_idx]
                vals = state.u[field][s["Vt"]]
                tot = tot + jnp.einsum("cab,cb->", s["M_e"], vals)
            out[ion["name"]] = tot
        return out


def make_extrapolator(df32_mode: bool, order: int = 1):
    """Jitted device-side warm-start predictor.

    order=1: `g = 2*x_k - x_{k-1}` (linear in time).
    order=2: `g = 3*x_k - 3*x_{k-1} + x_{k-2}` (quadratic) — the implicit-
    Euler trajectory is smooth in t, so on meshes that resolve it the
    quadratic predictor improves on the linear one (opt-in via
    `warm_start: extrapolated2`); on very coarse meshes it can cost a few
    iterations (the noise amplification is ||e||*7 vs *3), so linear stays
    the default.

    Elementwise, so it preserves any dof sharding of the inputs (used by
    both the unsharded SolverKNPEMI loop and the dof-sharded production
    harness).  For df32 [2, n] pairs the combination runs through an f64
    round-trip so the compensated pair's ~2^-48 guess quality survives;
    with x64 disabled it degrades gracefully to an f32 predictor."""
    use_f64 = jax.config.jax_enable_x64

    def _to64(x):
        from knp_emi_cgx_tpu.solvers.df32 import df_to_f64

        return df_to_f64(x[0], x[1])

    if order == 1:
        def extrap(x_cur, x_prev):
            if df32_mode and use_f64:
                from knp_emi_cgx_tpu.solvers.df32 import df_from_f64
                g = 2.0 * _to64(x_cur) - _to64(x_prev)
                gh, gl = df_from_f64(g)
                return jnp.stack([gh, gl])
            return 2.0 * x_cur - x_prev
    elif order == 2:
        def extrap(x_cur, x_prev, x_prev2):
            if df32_mode and use_f64:
                from knp_emi_cgx_tpu.solvers.df32 import df_from_f64
                g = (3.0 * _to64(x_cur) - 3.0 * _to64(x_prev)
                     + _to64(x_prev2))
                gh, gl = df_from_f64(g)
                return jnp.stack([gh, gl])
            return 3.0 * x_cur - 3.0 * x_prev + x_prev2
    else:
        raise ValueError(f"extrapolation order {order}")

    return jax.jit(extrap)


class WarmStartPredictor:
    """Host-side warm-start state machine around `make_extrapolator`:
    feeds the last 1-2 converged solutions, applies the convergence gate
    (NEVER extrapolate from an initial guess — see the solve() loop
    comment), and downgrades quadratic to linear until enough history
    exists.  Holds at most two extra device vectors; no device->host
    readbacks (axon-safe)."""

    def __init__(self, df32_mode: bool, order: int = 1):
        self.order = int(order)
        self._lin = make_extrapolator(df32_mode, 1)
        self._quad = (make_extrapolator(df32_mode, 2)
                      if self.order >= 2 else None)
        self._p1 = None
        self._p2 = None
        self._calls = 0

    def __call__(self, x_cur):
        """x_cur: the newest carry vector (the converged solution of the
        previous step; on the first call, the initial guess).  Returns the
        Krylov initial guess for the upcoming step."""
        self._calls += 1
        # x_cur is a converged solution from call 2 on; p1/p2 lag by 1/2
        if self._calls >= 4 and self._quad is not None:
            g = self._quad(x_cur, self._p1, self._p2)
        elif self._calls >= 3:
            g = self._lin(x_cur, self._p1)
        else:
            g = x_cur
        self._p2, self._p1 = self._p1, x_cur
        return g


class SolverKNPEMI:
    """Time-stepping driver.  solver_config mirrors the reference YAML
    `solver:` block (direct, ksp_settings{ksp_rtol, ...}, output{...})."""

    def __init__(self, problem: ProblemKNPEMI, solver_config: dict | None = None):
        self.problem = problem
        sc = dict(solver_config or problem.cfg.solver_config or {})
        self.direct = bool(sc.get("direct", True))
        ksp = sc.get("ksp_settings", {}) or {}
        self.rtol = float(ksp.get("ksp_rtol", 1e-8))
        self.restart = int(ksp.get("restart", 30))
        self.pc_mode = str(ksp.get("pc_mode", "dense"))
        # solve precision (production rtol 1e-9 needs more than f32 —
        # solvers/refine.py and solvers/df32.py):
        #   "f32"  — plain f32 Krylov (fast; certifies ~1e-7 real residual)
        #   "f64"  — selective f64 Krylov (reference-exact; TPU-emulated,
        #            large meshes hit runtime scatter limits)
        #   "df32" — double-f32 compensated Krylov (~2^-48 effective, pure
        #            f32 tensor ops — the TPU-native production path)
        # `mixed_precision: true` is an alias for "f64".
        self.mixed_precision = bool(ksp.get("mixed_precision", False))
        self.precision = str(ksp.get(
            "precision", "f64" if self.mixed_precision else "f32"))
        # warm_start: initial Krylov guess per step.
        #   "previous"     — last step's solution (reference semantics:
        #                    non_zero_init_guess, KNPEMIx_solver.py:177-209)
        #   "extrapolated" — 2*x_k - x_{k-1}, the linear-in-time predictor.
        #                    The solution drifts smoothly between steps, so
        #                    the predictor removes the O(dt) part of the
        #                    initial residual and cuts warm-step iterations
        #                    (~46 -> ~30 measured at 603k dofs, rtol 1e-9).
        #                    Certification is unchanged: the solve still
        #                    terminates on the real preconditioned residual.
        self.warm_start = str(ksp.get("warm_start", "previous"))
        if self.direct and self.precision == "df32":
            # the direct path is a dense f64 solve; the df32 pair layout
            # only exists for the iterative Krylov state (prepare_state and
            # the solve-path scatters already gate on `not direct`, 1005)
            self.precision = "f32"
        # matvec: operator storage for the df32 iterative path.
        #   "auto"    — lattice-stencil (ops/stencil.py) when the mesh is
        #               structured (constant-offset neighbor pattern), else
        #               ELL.  The stencil matvec replaces per-element
        #               gathers with contiguous shifted slices — ~28x per
        #               matvec on the v5e (scripts/tpu_stencil_probe.py).
        #   "stencil" — require the stencil (error on unstructured meshes)
        #   "ell"     — force the gather ELL path
        self.matvec_mode = str(ksp.get("matvec", "auto"))
        # df_dots: Gram-Schmidt reduction implementation for the df32
        # Krylov ("auto" | "tree" | "f64sum" | "radix", solvers/df32.py).
        # The f64 one-reduce variants replace the ~17-stage halving trees
        # that dominated the measured GMRES iteration cost on the axon
        # TPU (82.6 -> ~5 ms/iteration, 1.86 -> 0.22 s/step at 24^3 —
        # r5 bench A/B); "auto" picks f64sum below the emulated-f64
        # tensor-size limit and the radix lane-fold variant above it.
        self.df_dots = str(ksp.get("df_dots", "auto"))
        self.mixed_precision = self.precision == "f64"
        if self.pc_mode == "amg_gs" and self.mixed_precision:
            raise ValueError(
                "pc_mode amg_gs is not wired into the selective-f64 "
                "refine path; use precision f32/df32 (or pc_mode amg_phi)")
        # split_step: run assembly / Krylov solve / field scatter as THREE
        # jitted programs instead of one.  The axon TPU runtime faults when
        # the fused single-program step grows past ~5e5 dofs (assembly and
        # the df32 GMRES each run fine alone at 48^3 tissue scale, their
        # composition into one program dies at launch); three dispatches
        # cost ~0.5 ms/step and lift the size ceiling.
        self.split_step = bool(ksp.get("split_step", False))
        # launch_outer: additionally bound EACH solver launch to this many
        # restart cycles, re-invoking from the host until the iteration
        # budget is spent (restarted GMRES is memoryless across cycles, so
        # chunked launches are mathematically identical to one long run).
        # The axon runtime kills long-running single launches at tissue
        # scale (a cold rtol-1e-9 solve is hundreds of Arnoldi iterations
        # in one while_loop launch); a converged chunk costs one residual
        # check.  launch_count / launch_count_cold: launches per warm step
        # and for the first (cold-start) step.
        # setup_cache: disk-cache AMG hierarchies keyed by matrix content
        # (utils/setupcache.py) — repeated runs on the same mesh replay the
        # preconditioner build as device uploads
        self.setup_cache = bool(ksp.get("setup_cache", False))
        # amg_smooth_iters / amg_cycles: joint-hierarchy apply strength for
        # pc_mode amg_phi/amg2 (smoothing sweeps per half-cycle, V-cycles
        # per application).  pc_lab measured {3, 2} at warm 12.8 its vs
        # 19.4 for the block form (exact-application floor 11.2) — the
        # joint form is what beats the block-diagonal iteration floor.
        self.amg_opts = {}
        if ksp.get("amg_smooth_iters") is not None:
            self.amg_opts["smooth_iters"] = int(ksp["amg_smooth_iters"])
        if ksp.get("amg_cycles") is not None:
            self.amg_opts["cycles"] = int(ksp["amg_cycles"])
        if ksp.get("amg_cycle_damp") is not None:
            self.amg_opts["cycle_damp"] = float(ksp["amg_cycle_damp"])
        lo = ksp.get("launch_outer")
        self.launch_outer = int(lo) if lo is not None else None
        self.launch_count = int(ksp.get("launch_count", 6))
        self.launch_count_cold = int(ksp.get("launch_count_cold", 30))
        self.time_steps = problem.cfg.time_steps
        self.iterations: list[int] = []
        self.assembly_time: list[float] = []
        self.solve_time: list[float] = []

        self._pc = None
        self._step_fn = None
        self._bundle = None
        self._extrap_fn = None
        self._stencil = None
        self._inject_fn = None
        self._pc_lattice = False

    # ------------------------------------------------------------------
    def _df_precond(self, pc, pc_lattice, stencil, mv_df):
        """M closure for gmres_df32 (fused + split step builders share it).

        Diagonal modes return the block apply unchanged.  pc_mode
        "amg_gs" composes the phi-first block GAUSS-SEIDEL sweep

            z_phi = M_phi(r|phi);   z = z_phi + M_ion(r - A z_phi)

        using the step's own matvec for the ion<-phi drift-coupling
        correction — one extra operator matvec per apply buys the
        triangular form's iteration floor (tissue16x8c rtol 1e-9 warm:
        11.25 its vs 16.75 for the best diagonal form jphi s3c2 and
        ~19-24 for block "amg"; scripts/pc_lab.py, output/pc_lab_tri*).
        The half-applies have disjoint supports, so the final adds are
        exact in df arithmetic."""
        if pc is None:
            return None
        gs = self.pc_mode == "amg_gs"
        if pc_lattice or stencil is None:
            if not gs:
                return pc.apply_df
            phi_half = lambda rh, rl: pc.apply_df_part(rh, rl, "phi")
            ion_half = lambda rh, rl: pc.apply_df_part(rh, rl, "ion")
        else:
            if not gs:
                return stencil.wrap_precond_df(pc.apply_df)
            phi_half = stencil.wrap_precond_df(
                lambda rh, rl: pc.apply_df_part(rh, rl, "phi"))
            ion_half = stencil.wrap_precond_df(
                lambda rh, rl: pc.apply_df_part(rh, rl, "ion"))

        from knp_emi_cgx_tpu.solvers.df32 import df_add, df_neg

        def M(rh, rl):
            z1h, z1l = phi_half(rh, rl)
            ah, al = mv_df(z1h, z1l)
            r2h, r2l = df_add(rh, rl, *df_neg(ah, al))
            z2h, z2l = ion_half(r2h, r2l)
            return z1h + z2h, z1l + z2l
        return M

    def _build_step(self, state0: KNPEMIState):
        p = self.problem
        a = p.assembler
        params = p.params
        has_neumann = not (p.cfg.dirichlet_bcs or p.cfg.pin_ecs_potential)
        assert has_neumann == (not a.has_bcs)

        gating = p.gating_variables
        hh = next((m for m in p.ionic_models if isinstance(m, HodgkinHuxley)),
                  None)
        rtol, restart = self.rtol, self.restart
        direct = self.direct
        mixed_precision = self.mixed_precision
        df32_mode = self.precision == "df32"

        fd = a.field_dof
        ell = None
        stencil = None
        ns_df = None
        if df32_mode and not direct:
            from knp_emi_cgx_tpu.solvers.df32 import EllMatrix, df_from_f64

            # host copies only: a device readback here would flip the axon
            # runtime into its synchronous per-kernel mode (~3000x/step)
            if self.matvec_mode in ("auto", "stencil"):
                from knp_emi_cgx_tpu.ops.stencil import StencilMatrix

                try:
                    stencil = StencilMatrix(a)
                except ValueError:
                    if self.matvec_mode == "stencil":
                        raise
                    stencil = None
            if stencil is None:
                ell = EllMatrix(a.indptr_np, a.csr_cols_np)
            self._ell = ell
            self._stencil = stencil

        if not self.direct and self._pc is None:
            u0 = getattr(p, "_u0_np", None)
            if u0 is None:
                u0 = np.asarray(state0.u)   # fallback: costs the D2H switch
            lattice_dims = None
            if stencil is not None and self.pc_mode in ("amg", "amg_phi",
                                                        "amg_gs"):
                from knp_emi_cgx_tpu.ops.stencil import detect_lattice

                lattice_dims = detect_lattice(a.points_np)
            if lattice_dims is not None:
                # gather-free geometric V-cycles applied natively to the
                # stencil operator's lattice vectors (solvers/lattice_amg)
                self._pc = LatticeBlockPreconditioner(
                    a, u0, lattice_dims, mode=self.pc_mode,
                    amg_opts=self.amg_opts)
                self._pc_lattice = True
            else:
                # selective-f64 solves need the preconditioner STORED at
                # f64 so it applies as a fixed operator in f64 arithmetic
                # (an f32-cast wrapper is a noisy operator — solvers/refine)
                pc_dtype = jnp.float64 if self.mixed_precision else None
                self._pc = BlockDiagonalPreconditioner(
                    a, u0, mode=self.pc_mode, dtype=pc_dtype,
                    df=self.precision == "df32", cache=self.setup_cache,
                    amg_opts=self.amg_opts)
                self._pc_lattice = False

        # gather maps for scattering x back into field arrays
        scat = []
        for f in range(a.nf):
            active = np.nonzero(fd[f] >= 0)[0]
            scat.append((jnp.asarray(active), jnp.asarray(fd[f, active])))

        pc = self._pc
        pc_lattice = getattr(self, "_pc_lattice", False)

        if df32_mode and not direct:
            if has_neumann:
                mask = (a.nullspace_np != 0).astype(np.float64)
                if stencil is not None:
                    # nullspace in the lattice space (zeros inactive)
                    lat = np.zeros(stencil.n_lat)
                    lat[stencil.lat_of_dof_np] = mask
                    mask = lat
                ns_exact = jnp.asarray(mask / np.linalg.norm(mask))
                ns_df = df_from_f64(ns_exact)
            if stencil is not None:
                # field scatter reads the lattice solution directly:
                # lattice position of dof (f, v) is f*n_pts + v (host-built
                # — device index arithmetic here would compile eagerly)
                scat = []
                for f in range(a.nf):
                    active = np.nonzero(fd[f] >= 0)[0]
                    scat.append((jnp.asarray(active),
                                 jnp.asarray(f * stencil.n_pts + active)))

        # Every device array goes through the bundle ARGUMENT: closure
        # constants would be re-shipped to the device on each execution
        # (see utils/devicestate.py).
        bundle = {"a": a.device_state(), "scat": scat}
        if ell is not None:
            bundle["ell"] = ell.device_state()
        if stencil is not None:
            bundle["stencil"] = stencil.device_state()
        if ns_df is not None:
            bundle["ns_df"] = ns_df
        if pc is not None:
            bundle["pc"] = pc.device_state()
        self._bundle = bundle

        if df32_mode and not direct and self.split_step:
            return self._build_step_split_df32(ell, stencil)

        def step(state: KNPEMIState, bundle):
            old_a = a.install_device_state(bundle["a"])
            old_pc = pc.install(bundle["pc"]) if pc is not None else None
            old_ell = ell.install(bundle["ell"]) if ell is not None else None
            old_st = (stencil.install(bundle["stencil"])
                      if stencil is not None else None)
            try:
                t_new = state.t + params.dt
                n_, m_, h_ = state.n, state.m, state.h
                if gating:
                    dt_ode = params.dt / hh.time_steps_ode
                    if getattr(hh, "use_pallas", False):
                        from knp_emi_cgx_tpu.ops.pallas_gating import (
                            rush_larsen_pallas)

                        n_, m_, h_ = rush_larsen_pallas(
                            n_, m_, h_, state.phi_m, params.phi_rest,
                            dt_ode, hh.time_steps_ode)
                    else:
                        upd = (rush_larsen_update if hh.use_rush_larsen
                               else forward_euler_update)
                        n_, m_, h_ = upd(n_, m_, h_, state.phi_m,
                                         params.phi_rest, dt_ode,
                                         hh.time_steps_ode)
                gates = {"n": n_, "m": m_, "h": h_}
                bc_values = (a.mms_bc_values(t_new)
                             if (a.has_bcs and a.mms is not None) else None)
                vals, b = a.assemble(state.u, state.phi_m, gates, t_new,
                                     bc_values=bc_values)

                if direct:
                    if has_neumann:
                        x = dense_solve_deflated(a.indptr, a.indices, vals, b,
                                                 a.nullspace)
                    else:
                        x = dense_solve(a.indptr, a.indices, vals, b)
                    its = jnp.array(0)
                elif df32_mode:
                    from knp_emi_cgx_tpu.solvers.df32 import (
                        gmres_df32, repaired_ell_values)

                    if stencil is not None:
                        if has_neumann:
                            dgh, lo_rows = stencil.repaired_diag_values(vals)
                        else:
                            dgh, lo_rows = stencil.diag_values(vals), None

                        def mv_df(xh, xl):
                            return stencil.matvec_df(dgh, xh, xl, lo_rows)

                        M = self._df_precond(pc, pc_lattice, stencil, mv_df)
                        b_s = stencil.inject(b)
                    else:
                        if has_neumann:
                            ell_h, ell_l = repaired_ell_values(
                                ell, vals, a.phi_col_mask,
                                a.phi_repair_slots)
                        else:
                            ell_h, ell_l = ell.ell_values(vals), None

                        def mv_df(xh, xl):
                            if ell_l is None:
                                return ell.matvec_df(ell_h, xh, xl)
                            return ell.matvec_df2(ell_h, ell_l, xh, xl)

                        M = self._df_precond(pc, False, None, mv_df)
                        b_s = b

                    res = gmres_df32(
                        mv_df, b_s, state.x[0], state.x[1],
                        M=M,
                        nullspace_df=bundle.get("ns_df"),
                        rtol=rtol, restart=restart, dots=self.df_dots)
                    x = jnp.stack([res.xh, res.xl])
                    its = res.iterations
                elif mixed_precision:
                    from knp_emi_cgx_tpu.solvers.refine import solve_f64

                    res = solve_f64(
                        vals, b, state.x, a.indices, a.row_ids, a.n_dofs,
                        M=pc, nullspace=a.nullspace if has_neumann else None,
                        rtol=rtol, restart=restart,
                        project_nullspace=has_neumann,
                        repair=((a.phi_repair_slots, a.phi_col_mask)
                                if has_neumann else None))
                    x = res.x   # stays f64 across steps (exact warm start)
                    its = res.iterations
                else:
                    indices, row_ids = a.indices, a.row_ids
                    n_dofs = a.n_dofs

                    def mv(v):
                        return csr_mv(vals, v, indices, row_ids, n_dofs)

                    M_plain = pc
                    if pc is not None and self.pc_mode == "amg_gs":
                        # phi-first block Gauss-Seidel (see _df_precond)
                        def M_plain(r):
                            z1 = pc.apply_part(r, "phi")
                            z2 = pc.apply_part(r - mv(z1), "ion")
                            return z1 + z2
                    res = gmres(
                        mv, b, state.x, M=M_plain,
                        nullspace=a.nullspace if has_neumann else None,
                        rtol=rtol, restart=restart,
                        project_nullspace=has_neumann)
                    x = res.x
                    its = res.iterations

                u = state.u
                x_point = x[0] + x[1] if df32_mode else x
                for f in range(a.nf):
                    verts, dofs = bundle["scat"][f]
                    u = u.at[f, verts].set(x_point[dofs].astype(u.dtype))
                phi_m = u[a.PHI_I] - u[a.PHI_E]
                return KNPEMIState(u=u, phi_m=phi_m, n=n_, m=m_, h=h_,
                                   t=t_new, x=x), its
            finally:
                a.install_device_state(old_a)
                if pc is not None:
                    pc.install(old_pc)
                if ell is not None:
                    ell.install(old_ell)
                if stencil is not None:
                    stencil.install(old_st)

        jitted = jax.jit(step)

        def bound_step(state):
            state = self.prepare_state(state)
            return jitted(state, self._bundle)

        bound_step.jitted = jitted
        return bound_step

    # ------------------------------------------------------------------
    def _build_step_split_df32(self, ell, stencil=None):
        """Three-program df32 step (see `split_step` in __init__): gating +
        assembly + operator value refresh | compensated GMRES | field
        scatter.  Same math as the fused step; only the jit boundaries
        differ.  The operator is the lattice stencil when `stencil` is
        given (structured meshes), else the gather ELL."""
        from knp_emi_cgx_tpu.models.gating import (rush_larsen_update,
                                                   forward_euler_update)
        from knp_emi_cgx_tpu.models.ionic import HodgkinHuxley
        from knp_emi_cgx_tpu.solvers.df32 import (gmres_df32,
                                                  repaired_ell_values)

        p = self.problem
        a = p.assembler
        params = p.params
        pc = self._pc
        pc_lattice = getattr(self, "_pc_lattice", False)
        has_neumann = not a.has_bcs
        gating = p.gating_variables
        hh = next((m for m in p.ionic_models if isinstance(m, HodgkinHuxley)),
                  None)
        rtol, restart = self.rtol, self.restart

        def _install_op(bundle):
            if stencil is not None:
                return stencil.install(bundle["stencil"])
            return ell.install(bundle["ell"])

        def _uninstall_op(old):
            if stencil is not None:
                stencil.install(old)
            else:
                ell.install(old)

        def stage_assemble(state, bundle):
            old_a = a.install_device_state(bundle["a"])
            old_op = _install_op(bundle)
            try:
                t_new = state.t + params.dt
                n_, m_, h_ = state.n, state.m, state.h
                if gating:
                    dt_ode = params.dt / hh.time_steps_ode
                    upd = (rush_larsen_update if hh.use_rush_larsen
                           else forward_euler_update)
                    n_, m_, h_ = upd(n_, m_, h_, state.phi_m,
                                     params.phi_rest, dt_ode,
                                     hh.time_steps_ode)
                gates = {"n": n_, "m": m_, "h": h_}
                bc_values = (a.mms_bc_values(t_new)
                             if (a.has_bcs and a.mms is not None) else None)
                vals, b = a.assemble(state.u, state.phi_m, gates, t_new,
                                     bc_values=bc_values)
                if stencil is not None:
                    if has_neumann:
                        op_h, op_l = stencil.repaired_diag_values(vals)
                    else:
                        op_h = stencil.diag_values(vals)
                        op_l = jnp.zeros((0,), dtype=op_h.dtype)
                    b = stencil.inject(b)
                elif has_neumann:
                    op_h, op_l = repaired_ell_values(
                        ell, vals, a.phi_col_mask, a.phi_repair_slots)
                else:
                    op_h = ell.ell_values(vals)
                    op_l = jnp.zeros((0,), dtype=op_h.dtype)
                return n_, m_, h_, t_new, op_h, op_l, b
            finally:
                a.install_device_state(old_a)
                _uninstall_op(old_op)

        launch_outer = self.launch_outer

        def stage_solve(bundle, op_h, op_l, b, x):
            old_op = _install_op(bundle)
            old_pc = pc.install(bundle["pc"]) if pc is not None else None
            try:
                if stencil is not None:
                    lo = op_l if has_neumann else None

                    def mv_df(xh, xl):
                        return stencil.matvec_df(op_h, xh, xl, lo)

                    M = self._df_precond(pc, pc_lattice, stencil, mv_df)
                elif has_neumann:
                    def mv_df(xh, xl):
                        return ell.matvec_df2(op_h, op_l, xh, xl)

                    M = self._df_precond(pc, False, None, mv_df)
                else:
                    def mv_df(xh, xl):
                        return ell.matvec_df(op_h, xh, xl)

                    M = self._df_precond(pc, False, None, mv_df)
                kwargs = {}
                if launch_outer is not None:
                    kwargs["max_outer"] = launch_outer
                res = gmres_df32(
                    mv_df, b, x[0], x[1],
                    M=M,
                    nullspace_df=bundle.get("ns_df"),
                    rtol=rtol, restart=restart, dots=self.df_dots,
                    **kwargs)
                return jnp.stack([res.xh, res.xl]), res.iterations
            finally:
                _uninstall_op(old_op)
                if pc is not None:
                    pc.install(old_pc)

        def stage_scatter(state, bundle, n_, m_, h_, t_new, x):
            u = state.u
            x_point = x[0] + x[1]
            for f in range(a.nf):
                verts, dofs = bundle["scat"][f]
                u = u.at[f, verts].set(x_point[dofs].astype(u.dtype))
            phi_m = u[a.PHI_I] - u[a.PHI_E]
            return KNPEMIState(u=u, phi_m=phi_m, n=n_, m=m_, h=h_,
                               t=t_new, x=x)

        jA = jax.jit(stage_assemble)
        jS = jax.jit(stage_solve)
        jC = jax.jit(stage_scatter)
        launch_count = self.launch_count
        launch_count_cold = self.launch_count_cold

        def bound_step(state):
            state = self.prepare_state(state)
            n_, m_, h_, t_new, op_h, op_l, b = jA(state, self._bundle)
            if launch_outer is None:
                x, its = jS(self._bundle, op_h, op_l, b, state.x)
            else:
                # host-chunked launches (see launch_outer in __init__); a
                # chunk that enters already converged exits after one
                # residual check, so the fixed launch count needs no
                # device->host readback to terminate early
                L = (launch_count_cold if not bound_step.warm
                     else launch_count)
                x = state.x
                its = None
                for _ in range(L):
                    x, its_i = jS(self._bundle, op_h, op_l, b, x)
                    its = its_i if its is None else its + its_i
                bound_step.warm = True
            return jC(state, self._bundle, n_, m_, h_, t_new, x), its

        bound_step.warm = False
        bound_step.jitted = None
        # instrumentation handles (scripts/tpu_kernel_probe.py, bench.py):
        # the three jitted stage programs, so per-component timings can be
        # taken on the exact programs the step launches
        bound_step.stages = (jA, jS, jC)
        return bound_step

    # ------------------------------------------------------------------
    def extrapolator(self):
        """Jitted device-side warm-start predictor `g = 2*x_k - x_{k-1}`
        (None unless warm_start == "extrapolated").  For the df32 path the
        combination runs through an f64 round-trip (df_to_f64/df_from_f64)
        so the predictor keeps the compensated pair's ~2^-48 quality; with
        x64 disabled it degrades gracefully to an f32 predictor (still a
        strictly better guess than the previous solution).  No host
        readback — safe inside the axon hot loop."""
        if not self.warm_start.startswith("extrapolated"):
            return None
        if self._extrap_fn is not None:
            return self._extrap_fn
        df32_mode = self.precision == "df32" and not self.direct
        self._extrap_fn = make_extrapolator(df32_mode)
        return self._extrap_fn

    def warm_predictor(self):
        """A fresh `WarmStartPredictor` for this solver's warm_start mode
        ("extrapolated" = linear, "extrapolated2" = quadratic), or None.
        One instance per time loop — it carries solution history."""
        if not self.warm_start.startswith("extrapolated"):
            return None
        order = 2 if self.warm_start == "extrapolated2" else 1
        df32_mode = self.precision == "df32" and not self.direct
        return WarmStartPredictor(df32_mode, order)

    def solve(self, state: KNPEMIState | None = None,
              callback=None) -> KNPEMIState:
        """Run the configured number of timesteps.  `callback(i, state)` is
        invoked after each step outside the jit (I/O, diagnostics)."""
        p = self.problem
        if state is None:
            state = p.initial_state()
        if self._step_fn is None:
            self._step_fn = self._build_step(state)
        # x carry layout: f64 (mixed), [2, n] df32 pair, lattice (stencil)
        state = self.prepare_state(state)

        # warm-start predictor: extrapolates only from converged solutions
        # (at step 2 the older vector is the initial GUESS, and 2*x_1 - x_0
        # doubles the cold-start correction — a far worse guess than x_1
        # itself; the gate lives in WarmStartPredictor)
        predictor = self.warm_predictor()
        its_device = []
        for i in range(1, self.time_steps + 1):
            tic = time.perf_counter()
            if predictor is not None:
                state = state._replace(x=predictor(state.x))
            state, its = self._step_fn(state)
            if callback is None:
                # keep the loop free of device->host reads (axon switches to
                # a synchronous per-kernel mode after the first readback);
                # iteration counts are materialised after the loop
                its_device.append(its)
            else:
                jax.block_until_ready(state)
                if not self.direct:
                    self.iterations.append(int(its))
                callback(i, state)
            self.solve_time.append(time.perf_counter() - tic)
        if its_device and not self.direct:
            self.iterations.extend(int(v) for v in its_device)
        return state

    def prepare_state(self, state: KNPEMIState) -> KNPEMIState:
        """Normalize state.x to the solver's carry layout: f64 for
        mixed-precision, [2, n] df32 pairs for the compensated path, and
        the uncompacted lattice layout when the stencil operator is active
        (ops/stencil.py).  Idempotent and cheap — callers driving
        `_build_step` directly (bench, production harnesses) should pass
        every externally-constructed state through this once."""
        if self.mixed_precision:
            if state.x.dtype != jnp.float64:
                state = state._replace(x=state.x.astype(jnp.float64))
            return state
        if self.precision != "df32" or self.direct:
            return state
        x = state.x
        if x.ndim == 1:
            x = self._df32_init_pair(x)
        st = self._stencil
        if st is not None and x.shape[-1] == st.n_dofs:
            if self._inject_fn is None:
                # lat_of_dof is an ARGUMENT, not a closure constant: jitting
                # the bound st.inject bakes the device index array into the
                # HLO as an MLIR constant, and that lowering step READS THE
                # ARRAY BACK to the host — a D2H that blocks for minutes to
                # forever when the axon tunnel is in its degraded-transfer
                # state (measured 170-580+ s for a SCALAR D2H, r5 session 1)
                n_lat = st.n_lat

                def _inject(x, lat_idx):
                    out = jnp.zeros(x.shape[:-1] + (n_lat,), dtype=x.dtype)
                    return out.at[..., lat_idx].set(x)

                self._inject_fn = jax.jit(_inject)
            x = self._inject_fn(x, st.lat_of_dof)
        if x is not state.x:
            state = state._replace(x=x)
        return state

    def _df32_init_pair(self, x):
        """Normalize a 1-D initial x to the [2, n] f32 (hi, lo) pair the
        df32 step produces.  An f64 x is split (df_from_f64) instead of
        stacked as-is: the step returns f32 pairs, so an f64-typed carry
        would (a) force a second jit_step compile for the one-off first
        call and (b) break the lax.scan carry-dtype invariant."""
        if x.dtype == jnp.float64:
            from knp_emi_cgx_tpu.solvers.df32 import df_from_f64

            xh, xl = df_from_f64(x)
        else:
            xh = x.astype(jnp.float32)
            xl = jnp.zeros_like(xh)
        return jnp.stack([xh, xl])

    def dump_system(self, state: KNPEMIState, out_dir: str):
        """Assemble once and dump the system matrix/vector to npy in the
        reference's COO layout (misc.py:16-22 `dump`, save_mat flag —
        KNPEMIx_solver.py:424-431)."""
        import os

        p = self.problem
        a = p.assembler
        gates = {"n": state.n, "m": state.m, "h": state.h}
        vals, b = a.assemble(state.u, state.phi_m, gates,
                             state.t + p.params.dt)
        rows = a.csr_rows_np
        cols = a.csr_cols_np
        np.save(os.path.join(out_dir, "Amat.npy"),
                np.c_[rows, cols, np.asarray(vals)])
        np.save(os.path.join(out_dir, "bvec.npy"), np.asarray(b))

    def scan_solve(self, state: KNPEMIState, num_steps: int,
                   return_its: bool = False) -> KNPEMIState:
        """Pure on-device time loop (lax.scan) — no host round-trips; used
        for benchmarking and production runs without per-step I/O.
        return_its: also return the [num_steps] per-step GMRES iteration
        counts (device array — read it only AFTER any timing fence)."""
        if self.split_step:
            # split_step exists to BOUND single-program size on runtimes
            # that kill large launches; tracing the whole loop into one
            # scan would undo that
            raise RuntimeError("scan_solve is incompatible with split_step")
        step = self._step_fn or self._build_step(state)
        self._step_fn = step
        # carry layout must be fixed BEFORE the scan (the carry shape is a
        # scan invariant; the stencil path widens x to the lattice space)
        state = self.prepare_state(state)
        extrap = self.extrapolator()

        if extrap is None:
            def body(s, _):
                s2, its = step(s)
                return s2, its

            final, its = jax.lax.scan(body, state, None, length=num_steps)
            return (final, its) if return_its else final

        quad = (make_extrapolator(self.precision == "df32"
                                  and not self.direct, 2)
                if self.warm_start == "extrapolated2" else None)

        def body(carry, _):
            s, x_prev, x_prev2, k = carry
            x_cur = s.x
            # k = completed steps; predict only from converged solutions
            # (k >= 2 linear, k >= 3 quadratic) — see the solve() comment
            g = jnp.where(k >= 2, extrap(x_cur, x_prev), x_cur)
            if quad is not None:
                g = jnp.where(k >= 3, quad(x_cur, x_prev, x_prev2), g)
            s = s._replace(x=g)
            s2, its = step(s)
            return (s2, x_cur, x_prev, k + 1), its

        (final, _, _, _), its = jax.lax.scan(
            body, (state, state.x, state.x, jnp.int32(0)), None,
            length=num_steps)
        return (final, its) if return_its else final
