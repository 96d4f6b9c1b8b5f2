"""Dof-sharded KNP-EMI timestep: the full PETSc-distributed-solve equivalent.

The reference's parallel model is distributed vectors with ghost updates
(`KNPEMIx_solver.py:435-468`: PETSc MatMPIAIJ SpMV, VecMPI Krylov vectors,
ghostUpdate after solve).  The TPU-native mapping built here:

  * the MESH VERTICES are graph-partitioned (native BFS, the ParMETIS role)
    and every monolithic dof follows its vertex, so all 2*(N_ions+1) fields
    of a vertex live on one device and the membrane coupling stays local;
  * the monolithic dof space is RE-ORDERED so each device owns a contiguous
    padded block — the solution vector x, the RHS b and every Krylov basis
    vector are sharded over the device mesh (state vectors, not just element
    data);
  * assembly scatters DIRECTLY into the reordered CSR value layout
    (`KNPEMIAssembler.apply_dof_remap`) — the PETSc ADD_VALUES ghost
    accumulation with zero re-indexing on the hot path;
  * SpMV is the neighbour-halo `ppermute` exchange (parallel/halo_spmv.py),
    GMRES dot products psum over the mesh axis (XLA inserts the collectives
    from the shardings), and the block-diagonal preconditioner applies as
    per-dof Chebyshev sweeps on a SHARDED block-diagonal operator that
    shares the same vector layout.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from knp_emi_cgx_tpu.parallel.halo_spmv import HaloSpMV


def vertex_padding(vpart: np.ndarray, n_devices: int):
    """Padded device-contiguous vertex layout from a vertex partition:
    returns (newpos_v [nV] old-vertex -> padded position, n_vpad)."""
    nV = vpart.shape[0]
    order = np.argsort(vpart, kind="stable")
    counts = np.bincount(vpart, minlength=n_devices)
    verts_per = int(counts.max())
    offsets = np.concatenate([[0], np.cumsum(counts)])
    newpos_v = np.empty(nV, dtype=np.int64)
    for d in range(n_devices):
        sl = slice(offsets[d], offsets[d + 1])
        newpos_v[order[sl]] = d * verts_per + np.arange(counts[d])
    return newpos_v, verts_per * n_devices


def unpad_vertex_fields(problem, arr):
    """Map a padded vertex-sharded field array [..., n_vpad] back to the
    original vertex order [..., nV] (host-side, for I/O and tests)."""
    return np.asarray(arr)[..., problem._vperm_newpos]


def vertex_dof_partition(assembler, n_devices: int):
    """Partition mesh dof-carrier nodes (BFS region growing on the
    nodes-sharing-a-cell adjacency graph) and map every monolithic dof to
    its node's device.  Returns (vpart [n_nodes], dof_part [n_dofs]).

    For P1 the nodes ARE the mesh vertices; for fem_order=2 assemblers the
    node space is vertices + edge midpoints (`fem/p2.py`) and the same
    cell-adjacency growth applies unchanged.

    `assembler` is duck-typed: anything with .topo.mesh, .field_dof and
    .n_dofs works (KNPEMIAssembler, ProblemEMI); `cell_tab_np`/`n_pts`
    override the vertex tables when present."""
    import scipy.sparse as sp

    mesh = assembler.topo.mesh
    nV = getattr(assembler, "n_pts", mesh.num_points)
    cells = getattr(assembler, "cell_tab_np", mesh.cells)
    nvp = cells.shape[1]
    rows, cols = [], []
    for a in range(nvp):
        for b in range(a + 1, nvp):
            rows += [cells[:, a], cells[:, b]]
            cols += [cells[:, b], cells[:, a]]
    G = sp.csr_matrix(
        (np.ones(2 * nvp * (nvp - 1) // 2 * len(cells)),
         (np.concatenate(rows), np.concatenate(cols))), shape=(nV, nV))

    from knp_emi_cgx_tpu import native

    vpart = None
    if native.get_lib() is not None:
        vpart = native.partition(G.indptr, G.indices.astype(np.int32),
                                 n_devices)
    if vpart is None:
        vpart = (np.arange(nV) * n_devices // nV).astype(np.int32)

    fd = assembler.field_dof
    dof_part = np.empty(assembler.n_dofs, dtype=np.int32)
    for f in range(getattr(assembler, "nf", fd.shape[0])):
        active = np.nonzero(fd[f] >= 0)[0]
        dof_part[fd[f, active]] = vpart[active]
    return vpart, dof_part


class ShardedChebyshevPreconditioner:
    """Block-diagonal preconditioner applied as a SHARDED operator.

    The per-field SPD blocks of solvers/precond.py (`_build_blocks` — the
    Benedusi P form) are assembled into one monolithic block-diagonal CSR,
    reordered with the SAME dof partition as the system matrix (so Krylov
    vectors and preconditioned residuals share one layout), and applied with
    Chebyshev-Jacobi sweeps whose recurrence coefficients are PER-DOF arrays
    (constant within each block) — elementwise-identical to running
    `_chebyshev` per block, but one fused sharded computation.
    """

    def __init__(self, assembler, u0, dof_part, device_mesh: Mesh,
                 iters: int = 5, axis: str = "cells",
                 lam_min_frac: float = 0.06, df: bool = False):
        import scipy.sparse as sp

        from knp_emi_cgx_tpu.solvers.precond import _build_blocks

        dtype = assembler.dtype
        u0_np = np.asarray(u0, dtype=np.float64)
        blocks = _build_blocks(assembler, u0_np)
        sizes = [b.shape[0] for b in blocks]
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        n = assembler.n_dofs
        assert offsets[-1] == n

        rows, cols, data = [], [], []
        dinv = np.zeros(n)
        lam = np.zeros(n)
        for i, b in enumerate(blocks):
            coo = b.tocoo()
            rows.append(coo.row + offsets[i])
            cols.append(coo.col + offsets[i])
            data.append(coo.data)
            d = np.asarray(b.diagonal())
            dinv[offsets[i]:offsets[i + 1]] = 1.0 / d
            dinv_b = sp.diags(1.0 / d) @ b
            # Gershgorin bound on D^-1 B (SPD), as in precond.cheb_of
            lam[offsets[i]:offsets[i + 1]] = float(
                np.abs(dinv_b).sum(axis=1).max())
        Pm = sp.csr_matrix(
            (np.concatenate(data), (np.concatenate(rows), np.concatenate(cols))),
            shape=(n, n))
        Pm.sum_duplicates()
        Pm.sort_indices()

        halo = HaloSpMV(Pm.indptr, Pm.indices, n, device_mesh.devices.size,
                        axis=axis, part=dof_part)
        self.halo = halo
        self.iters = int(iters)
        self.lam_min_frac = float(lam_min_frac)
        self._matvec, mv_arrays = halo.make_matvec_fn(device_mesh)

        dinv_pad = np.zeros(halo.n_padded)
        dinv_pad[halo.newpos] = dinv
        lam_pad = np.ones(halo.n_padded)      # pad dofs: any positive value
        lam_pad[halo.newpos] = lam
        self._state = {
            "pvals": halo.shard_values(jnp.asarray(
                np.asarray(Pm.data, dtype=np.dtype(dtype)))),
            "dinv": jnp.asarray(np.asarray(dinv_pad, dtype=np.dtype(dtype))),
            "lam": jnp.asarray(np.asarray(lam_pad, dtype=np.dtype(dtype))),
            "mv": mv_arrays,
        }
        self.df = df
        if df:
            # compensated application path: same Chebyshev polynomial, df32
            # vector arithmetic + per-device ELL tree-reduction matvecs —
            # a FIXED linear operator to ~2^-48, as the df32 Krylov
            # recurrence requires (an f32-noisy preconditioner stalls it).
            # The operator is STATIC, so its ELL values are gathered ONCE
            # here; the hot-loop matvec skips the per-call gather.
            self._matvec_df, mv_df_arrays = halo.make_matvec_df_ell_fn(
                device_mesh, with_lo=False)
            self._state["mv_df"] = mv_df_arrays
            self._state["pvals_ell"] = jnp.asarray(
                halo.ell_values_np(np.asarray(Pm.data, dtype=np.float32)))

    def apply_df(self, rh, rl):
        from knp_emi_cgx_tpu.solvers.df32 import (df_add, df_scale_f32,
                                                  df_zeros_like)

        st = self._state
        f32 = jnp.float32
        dinv = st["dinv"].astype(f32)
        lam = st["lam"].astype(f32)
        pvals_ell = st["pvals_ell"]
        lmax = 1.1 * lam
        lmin = jnp.float32(self.lam_min_frac) * lam
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma
        xh, xl = df_zeros_like(rh)
        dh, dl = df_scale_f32(rh, rl, dinv / theta)
        for _ in range(self.iters):
            xh, xl = df_add(xh, xl, dh, dl)
            mh, ml = self._matvec_df(st["mv_df"], pvals_ell, xh, xl)
            rrh, rrl = df_add(rh, rl, -mh, -ml)
            rho_new = 1.0 / (2.0 * sigma - rho)
            t1h, t1l = df_scale_f32(dh, dl, rho_new * rho)
            t2h, t2l = df_scale_f32(rrh, rrl, (2.0 * rho_new / delta) * dinv)
            dh, dl = df_add(t1h, t1l, t2h, t2l)
            rho = rho_new
        return xh, xl

    # -- device-array bundling (utils/devicestate.py pattern) --
    def device_state(self):
        return self._state

    def install(self, st):
        old = self._state
        self._state = st
        return old

    def __call__(self, r):
        st = self._state
        dinv, lam = st["dinv"], st["lam"]
        lmax = 1.1 * lam
        lmin = self.lam_min_frac * lam
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        x = jnp.zeros_like(r)
        rr = r
        d = dinv * rr / theta
        sigma = theta / delta
        rho = 1.0 / sigma
        for _ in range(self.iters):
            x = x + d
            rr = r - self._matvec(st["mv"], st["pvals"], x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (dinv * rr)
            rho = rho_new
        return x


def build_dof_sharded_problem(n_devices: int, devices=None, n_mesh: int = 12,
                              dtype=None, rtol: float | None = None,
                              restart: int = 30, cheb_iters: int = 5,
                              config: str = "configs/tests/golden_parity.yaml",
                              precision: str = "auto",
                              pc_mode: str = "chebyshev",
                              mesh_spec: str | None = None,
                              cache: bool = False,
                              coarse_on_device0: bool = False,
                              amg_shard_levels: int = 1,
                              return_system: bool = False,
                              fem_order: int | None = None,
                              warm_start: str = "previous"):
    """Construct a KNP-EMI problem whose FULL timestep runs with dof-sharded
    state vectors over an `n_devices` mesh.  Returns
    (problem, state, step_fn, device_mesh, halo).

    precision="df32": the sharded PRODUCTION-tolerance path — f32 storage
    and assembly, compensated double-f32 Krylov (solvers/df32.py) with
    per-device ELL tree-reduction halo matvecs, block-local compensated
    dots, df32 preconditioning and the in-matvec exact-nullspace
    repair; certifies rtol 1e-9 with pure f32 tensor ops on every chip.

    pc_mode="amg": sharded SA-AMG V-cycle (parallel/sharded_amg.py — the
    parallel-BoomerAMG equivalent, mesh-robust iteration counts);
    "chebyshev": the per-dof Chebyshev block preconditioner.

    mesh_spec: a `generate:` spec ("tissue16x8c", "cube16", "square12") for
    the PRODUCTION problem class — 3D many-cell tissue with the full
    neuron+glia membrane stack selected from the config (main.build_models,
    reference main.py:27-45).  None keeps the 2D square + neuronal stack.

    fem_order: override the config's element order (2 = the P2 node space,
    fem/p2.py — dofs partition over nodes instead of vertices; the halo /
    AMG / df32 machinery is order-agnostic since it consumes only the
    monolithic CSR graph).

    warm_start: "previous" (PETSc non_zero_init_guess semantics,
    KNPEMIx_solver.py:177-209) or "extrapolated" — the 2*x_k - x_{k-1}
    predictor applied INSIDE the bound step (sharding-preserving
    elementwise combine, no host readback), matching the unsharded
    solver's warm_start option.  Measured ~3.7x warm-iteration cut at
    603k dofs on the unsharded path (PERF.md); the sharded step gets the
    identical iterates (tests/test_dof_sharded.py).
    """
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import (generate_square_geometry,
                                                 geometry_from_spec)
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.ops.assembly import KNPEMIAssembler
    from knp_emi_cgx_tpu.parallel.mesh_sharding import shard_assembler
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI

    df32 = precision == "df32"
    if df32:
        dtype = jnp.float32
        if rtol is None:
            rtol = 1e-9
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    if rtol is None:
        rtol = 1e-8 if dtype == jnp.float64 else 1e-6

    if devices is None:
        devices = jax.devices("cpu")
    if len(devices) < n_devices:
        raise RuntimeError(
            f"build_dof_sharded_problem: need {n_devices} devices, have "
            f"{len(devices)}; set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices}")
    axis = "cells"
    device_mesh = Mesh(np.array(devices[:n_devices]), (axis,))

    cfg = load_config(config)
    cfg.solver_config = {"direct": False,
                         "ksp_settings": {"ksp_rtol": rtol,
                                          "pc_mode": pc_mode}}
    if fem_order is not None:
        cfg.fem_order = int(fem_order)
    if mesh_spec is None:
        mesh, tagger = generate_square_geometry(n_mesh)
        mesh._facet_tagger = tagger
        problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=dtype)
        problem.init_ionic_models(
            [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    else:
        from knp_emi_cgx_tpu.main import build_models

        mesh, tagger = geometry_from_spec(mesh_spec)
        mesh._facet_tagger = tagger
        problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=dtype)
        problem.init_ionic_models(build_models(problem, config))
    problem.assembler = KNPEMIAssembler(
        problem.topo, problem.params, problem.ionic_models,
        dtype=dtype, dirichlet_bcs=cfg.dirichlet_bcs,
        pad_multiple=n_devices,
        node_space=getattr(problem, "node_space", None))
    a = problem.assembler
    state = problem.initial_state()

    vpart, dof_part = vertex_dof_partition(a, n_devices)
    halo = HaloSpMV(a.indptr_np, a.csr_cols_np, a.n_dofs,
                    n_devices, axis=axis, part=dof_part)
    if pc_mode == "amg":
        from knp_emi_cgx_tpu.parallel.sharded_amg import ShardedAMG

        pc = ShardedAMG(a, problem._u0_np, dof_part, device_mesh,
                        axis=axis, df=df32, cache=cache,
                        coarse_on_device0=coarse_on_device0,
                        shard_levels=amg_shard_levels)
    else:
        pc = ShardedChebyshevPreconditioner(a, problem._u0_np, dof_part,
                                            device_mesh, iters=cheb_iters,
                                            axis=axis, df=df32)
    problem._sharded_pc = pc
    a.apply_dof_remap(halo)
    # padded device-contiguous VERTEX layout: the state fields (u, phi_m,
    # gating) shard over the mesh alongside the solver vectors — the last
    # replicated piece of the PETSc distributed-vector model.  The remap
    # must precede shard_assembler: it reads assembler device arrays back
    # to the host, which is only possible while they are process-local
    # (multi-process global arrays are not host-fetchable).
    newpos_v, n_vpad = vertex_padding(vpart, n_devices)
    a.apply_vertex_remap(newpos_v, n_vpad)
    shard_assembler(a, device_mesh)
    problem._vperm_newpos = newpos_v
    problem._n_vpad = n_vpad
    ell_fn = None
    if df32:
        # system matvec over PRECOMPUTED repaired ELL values: the value
        # gather + nullspace-repair row sums run once per assembled
        # operator (make_ell_df_fn in the step), not per Krylov iteration
        matvec_A, mvA_arrays = halo.make_matvec_df_ell_fn(
            device_mesh, with_lo=True)
        ell_fn, ev_arrays = halo.make_ell_df_fn(
            device_mesh, repair=not a.has_bcs)
        if not a.has_bcs:
            onehot, phimask = halo.ell_repair_onehot(
                a.phi_repair_slots_np, a.phi_col_mask_np)
            ev_arrays = dict(ev_arrays,
                             repair_onehot=onehot, phi_mask_ell=phimask)
        mvA_arrays = dict(mvA_arrays, ev=ev_arrays)
    else:
        matvec_A, mvA_arrays = halo.make_matvec_fn(device_mesh)

    if return_system and not df32:
        raise ValueError("return_system requires precision='df32'")
    step_fn = _build_sharded_step(problem, pc, halo, device_mesh,
                                  matvec_A, mvA_arrays,
                                  rtol=rtol, restart=restart, axis=axis,
                                  df32=df32, ell_fn=ell_fn,
                                  return_system=return_system,
                                  warm_start=warm_start)

    # pad + shard EVERYTHING: the warm-start vector over the dof layout,
    # the state fields over the vertex layout.  shard_global_array is the
    # multi-process-safe device_put (parallel/distributed.py): in a
    # multi-process launch every process holds the full host array
    # (deterministic redundant setup) and contributes its addressable
    # shards only.
    from knp_emi_cgx_tpu.parallel.distributed import shard_global_array

    def padv(arr):
        arr = np.asarray(arr)
        out = np.zeros(arr.shape[:-1] + (n_vpad,), dtype=np.dtype(dtype))
        out[..., newpos_v] = arr
        return out

    vec_sh = NamedSharding(device_mesh, P(axis))
    state = state._replace(
        u=shard_global_array(padv(state.u),
                             NamedSharding(device_mesh, P(None, axis))),
        phi_m=shard_global_array(padv(state.phi_m), vec_sh),
        n=shard_global_array(padv(state.n), vec_sh),
        m=shard_global_array(padv(state.m), vec_sh),
        h=shard_global_array(padv(state.h), vec_sh),
        t=shard_global_array(np.asarray(state.t),
                             NamedSharding(device_mesh, P())),
    )
    x_pad = np.zeros(halo.n_padded)
    x_pad[halo.newpos] = np.asarray(state.x)
    xs = x_pad.astype(np.dtype(dtype))
    if df32:
        xs = np.stack([xs, np.zeros_like(xs)])
        x_sharding = NamedSharding(device_mesh, P(None, axis))
    else:
        x_sharding = NamedSharding(device_mesh, P(axis))
    state = state._replace(x=shard_global_array(xs, x_sharding))
    return problem, state, step_fn, device_mesh, halo


def _build_sharded_step(problem, pc, halo, device_mesh, matvec_A, mvA_arrays,
                        rtol: float, restart: int, axis: str,
                        df32: bool = False, ell_fn=None,
                        return_system: bool = False,
                        warm_start: str = "previous"):
    from knp_emi_cgx_tpu.models.gating import (rush_larsen_update,
                                               forward_euler_update)
    from knp_emi_cgx_tpu.models.ionic import HodgkinHuxley
    from knp_emi_cgx_tpu.problems.knpemi import KNPEMIState
    from knp_emi_cgx_tpu.solvers.krylov import gmres

    a = problem.assembler
    params = problem.params
    has_neumann = not a.has_bcs
    n_dev = halo.n_devices

    ns_df = None
    if df32 and has_neumann:
        from knp_emi_cgx_tpu.solvers.df32 import df_from_f64

        # exact padded nullspace indicator (the f32-assembled operator is
        # repaired in-matvec to annihilate exactly this vector)
        mask = (a.nullspace_np != 0).astype(np.float64)
        ns_df = df_from_f64(jnp.asarray(mask / np.linalg.norm(mask)))

    # scatter maps from the PADDED solver vector back into the PADDED
    # (vertex-sharded) field arrays
    fd = a.field_dof
    newpos = np.asarray(halo.newpos)
    newpos_v = getattr(problem, "_vperm_newpos", None)
    scat = []
    for f in range(a.nf):
        active = np.nonzero(fd[f] >= 0)[0]
        vpos = newpos_v[active] if newpos_v is not None else active
        scat.append((jnp.asarray(vpos),
                     jnp.asarray(newpos[fd[f, active]])))

    gating = problem.gating_variables
    hh = next((m for m in problem.ionic_models
               if isinstance(m, HodgkinHuxley)), None)
    shard_vec = NamedSharding(device_mesh, P(axis))
    shard_vals = NamedSharding(device_mesh, P(axis, None))

    bundle = {"a": a.device_state(), "pc": pc.device_state(),
              "mv": mvA_arrays, "scat": scat}
    if ns_df is not None:
        bundle["ns_df"] = ns_df

    def step(state: KNPEMIState, bundle):
        old_a = a.install_device_state(bundle["a"])
        old_pc = pc.install(bundle["pc"])
        try:
            t_new = state.t + params.dt
            n_, m_, h_ = state.n, state.m, state.h
            if gating:
                dt_ode = params.dt / hh.time_steps_ode
                upd = (rush_larsen_update if hh.use_rush_larsen
                       else forward_euler_update)
                n_, m_, h_ = upd(n_, m_, h_, state.phi_m, params.phi_rest,
                                 dt_ode, hh.time_steps_ode)
            gates = {"n": n_, "m": m_, "h": h_}
            bc_values = (a.mms_bc_values(t_new)
                         if (a.has_bcs and a.mms is not None) else None)
            vals, b = a.assemble(state.u, state.phi_m, gates, t_new,
                                 bc_values=bc_values)
            vals_sh = jax.lax.with_sharding_constraint(
                vals.reshape(n_dev, -1), shard_vals)
            b = jax.lax.with_sharding_constraint(b, shard_vec)

            mv = bundle["mv"]
            sys_out = None
            if df32:
                from knp_emi_cgx_tpu.solvers.df32 import gmres_df32

                eh, el = ell_fn(mv["ev"], vals_sh)
                res = gmres_df32(
                    lambda xh, xl: matvec_A(mv, eh, el, xh, xl),
                    b, state.x[0], state.x[1],
                    M=pc.apply_df,
                    nullspace_df=bundle.get("ns_df"),
                    rtol=rtol, restart=restart, n_blocks=n_dev)
                xh = jax.lax.with_sharding_constraint(res.xh, shard_vec)
                xl = jax.lax.with_sharding_constraint(res.xl, shard_vec)
                x = jnp.stack([xh, xl])
                x_point = xh + xl
                its = res.iterations
                if return_system:
                    # the EXACT operator/RHS the solve certified against —
                    # for an honest external residual recompute.  An eager
                    # re-assembly differs from the in-jit (GSPMD) one by
                    # ~1 ulp of f32, which the b - A x cancellation
                    # amplifies to a few x at the 1e-9 residual level.
                    sys_out = (eh, el, b)
            else:
                res = gmres(lambda v: matvec_A(mv, vals_sh, v),
                            b, state.x, M=pc,
                            nullspace=a.nullspace if has_neumann else None,
                            rtol=rtol, restart=restart,
                            project_nullspace=has_neumann)
                x = jax.lax.with_sharding_constraint(res.x, shard_vec)
                x_point = x
                its = res.iterations

            u = state.u
            for f in range(a.nf):
                verts, dofs = bundle["scat"][f]
                u = u.at[f, verts].set(x_point[dofs])
            phi_m = u[a.PHI_I] - u[a.PHI_E]
            new_state = KNPEMIState(u=u, phi_m=phi_m, n=n_, m=m_, h=h_,
                                    t=t_new, x=x)
            if return_system:
                return new_state, its, sys_out
            return new_state, its
        finally:
            a.install_device_state(old_a)
            pc.install(old_pc)

    jitted = jax.jit(step)

    # in-step warm-start predictor (VERDICT r4 #5): g = 2*x_k - x_{k-1}
    # from the last TWO CONVERGED solutions, computed on-device on the
    # sharded [2, n] pair (elementwise combine — GSPMD preserves the dof
    # sharding, no collective, no host readback).  Reuses the unsharded
    # solver's WarmStartPredictor state machine (problems/knpemi.py),
    # including its never-extrapolate-from-an-initial-guess gate; the step
    # function itself is untouched, so "previous" runs are bit-identical
    # to before.
    predictor = None
    if warm_start.startswith("extrapolated"):
        from knp_emi_cgx_tpu.problems.knpemi import WarmStartPredictor

        order = 2 if warm_start == "extrapolated2" else 1
        predictor = WarmStartPredictor(df32_mode=df32, order=order)

    def bound_step(state):
        if predictor is not None:
            state = state._replace(x=predictor(state.x))
        return jitted(state, bundle)

    bound_step.predictor = predictor
    bound_step.jitted = jitted
    bound_step.bundle = bundle
    bound_step.matvec_A = matvec_A
    return bound_step
