"""Dof-sharded EMI timestep: the distributed solve for the 2-field family.

The reference runs EMI under MPI exactly like KNP-EMI — DOLFINx-partitioned
mesh, PETSc MatMPIAIJ operator, distributed Krylov vectors, fieldsplit/AMG
preconditioning (`EMI/EMIx_solver.py:19-346`, same `GhostMode.shared_facet`
machinery as `mixed_dim_problem.py:649`).  This module gives the EMI family
the same dof-sharded capability the KNP-EMI production path has
(parallel/dof_sharded.py), with two EMI-specific simplifications:

  * the EMI operator is TIME-INDEPENDENT (`EMIx_solver.py:222` assembles the
    matrix once) — its halo-ELL values are sharded once at build, and only
    the RHS rebuilds each step;
  * the preconditioner is the whole-matrix SA-AMG with compartment-split
    aggregates and exact 2x2 membrane-pair block smoothing (the 6/7/7
    iteration recipe of solvers/amg.py) — sharded via ShardedAMG's
    matrix-B0 path: the 2x2 pairs couple the intra/extra dofs of one
    vertex, so under the vertex-derived partition the block-inverse SpMV
    is device-local.

State fields (phi, phi_m, gating) stay replicated — they are 2 scalar
fields; the distributed-solve demonstration (sharded x/b/Krylov vectors,
halo SpMV, psum dots, sharded AMG) is the capability the reference's MPI
story maps to.  KNP-EMI's path shards the state fields too.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from knp_emi_cgx_tpu.parallel.dof_sharded import vertex_dof_partition
from knp_emi_cgx_tpu.parallel.halo_spmv import HaloSpMV
from knp_emi_cgx_tpu.parallel.sharded_amg import ShardedAMG


def emi_amg_labels(problem):
    """Compartment labels + membrane (intra, extra) dof pairs for the EMI
    whole-matrix hierarchy — the same construction as the unsharded
    iterative path (problems/emi.py::SolverEMI._build_step)."""
    topo, mesh = problem.topo, problem.topo.mesh
    comp_v = np.zeros(mesh.num_points, dtype=np.int64)
    ic = topo.intra_cells
    comp_v[mesh.cells[ic].ravel()] = np.repeat(
        np.asarray(mesh.cell_tags)[ic], mesh.cells.shape[1])
    components = np.zeros(problem.n_dofs, dtype=np.int64)
    fd = problem.field_dof
    act0 = np.nonzero(fd[0] >= 0)[0]
    components[fd[0, act0]] = comp_v[act0] + 1      # 0 is the ECS label
    mv = np.unique(np.asarray(topo.membrane_verts).ravel())
    d0, d1 = fd[0][mv], fd[1][mv]
    ok = (d0 >= 0) & (d1 >= 0)
    block_pairs = np.stack([d0[ok], d1[ok]], axis=1)
    return components, block_pairs


def build_sharded_emi_step(problem, n_devices: int, devices=None,
                           rtol: float = 1e-10, restart: int = 30,
                           amg_cycles: int = 2, smooth_iters: int = 3,
                           axis: str = "cells"):
    """Build a dof-sharded EMI timestep for an already-constructed
    ProblemEMI (ionic models initialised).  Returns
    (state, step_fn, device_mesh, halo, pc) — state.x is the PADDED sharded
    solver vector; phi/phi_m/gating stay in the problem's vertex layout.
    """
    from knp_emi_cgx_tpu.models.gating import rush_larsen_update
    from knp_emi_cgx_tpu.problems.emi import EMIHodgkinHuxley, EMIState
    from knp_emi_cgx_tpu.solvers.krylov import gmres

    p = problem
    if devices is None:
        devices = jax.devices("cpu")
    if len(devices) < n_devices:
        raise RuntimeError(
            f"build_sharded_emi_step: need {n_devices} devices, have "
            f"{len(devices)}")
    device_mesh = Mesh(np.array(devices[:n_devices]), (axis,))

    _, dof_part = vertex_dof_partition(p, n_devices)
    A = p.A_host.tocsr()
    halo = HaloSpMV(A.indptr, A.indices, p.n_dofs, n_devices,
                    axis=axis, part=dof_part)
    matvec, mv_arrays = halo.make_matvec_fn(device_mesh)
    npdt = np.dtype(p.dtype)
    # static operator: values sharded once (EMIx_solver.py:222 role)
    A_vals_sh = jnp.asarray(halo.shard_values_np(
        np.asarray(A.data, dtype=npdt)))

    components, block_pairs = emi_amg_labels(p)
    pc = ShardedAMG(None, None, dof_part, device_mesh, axis=axis, df=False,
                    matrix=A, components=components, block_pairs=block_pairs,
                    smooth_iters=smooth_iters, dtype=p.dtype)

    newpos = halo.newpos
    ns_pad = np.zeros(halo.n_padded)
    ns_pad[newpos] = np.asarray(p.nullspace, dtype=np.float64)
    nrm = np.linalg.norm(ns_pad)
    ns_pad = jnp.asarray((ns_pad / (nrm if nrm else 1.0)).astype(npdt))

    fd = p.field_dof
    scat = []
    for f in range(2):
        active = np.nonzero(fd[f] >= 0)[0]
        scat.append((jnp.asarray(active, dtype=jnp.int32),
                     jnp.asarray(newpos[fd[f, active]], dtype=jnp.int32)))

    hh = next((m for m in p.ionic_models
               if isinstance(m, EMIHodgkinHuxley)), None)
    gating = p.gating
    shard_vec = NamedSharding(device_mesh, P(axis))
    newpos_dev = jnp.asarray(newpos)
    bundle = {
        "pc": pc.device_state(),
        "mv": mv_arrays,
        "Avals": A_vals_sh,
        "ns": ns_pad,
        "scat": scat,
        "rhs": {"mverts": p.mverts, "LwN": p.LwN, "Nq": p.Nq,
                "rhs_rows": p.rhs_rows},
    }
    cycles = int(amg_cycles)
    has_bcs = p.has_bcs
    n_pad = halo.n_padded

    def step(state: EMIState, bundle):
        old_rhs = {k: getattr(p, k) for k in bundle["rhs"]}
        for k, v in bundle["rhs"].items():
            setattr(p, k, v)
        old_pc = pc.install(bundle["pc"])
        try:
            t_new = state.t + p.dt
            n_, m_, h_ = state.n, state.m, state.h
            if gating:
                n_, m_, h_ = rush_larsen_update(
                    n_, m_, h_, state.phi_m, hh.V_rest,
                    p.dt / hh.time_steps_ode, hh.time_steps_ode)
            gates = {"n": n_, "m": m_, "h": h_}
            b = p.rhs(state.phi_m, gates, t_new)             # [n_dofs]
            b_pad = jnp.zeros(n_pad, dtype=b.dtype).at[newpos_dev].set(b)
            b_pad = jax.lax.with_sharding_constraint(b_pad, shard_vec)

            def mv(v):
                # BC rows were zeroed with unit diagonal at assembly, so
                # the sharded matvec acts as identity on them already
                return matvec(bundle["mv"], bundle["Avals"], v)

            def M(r):
                # amg_cycles V-cycles per application — the unsharded EMI
                # iterative default (problems/emi.py::SolverEMI)
                z = pc(r)
                for _ in range(cycles - 1):
                    z = z + pc(r - mv(z))
                return z

            res = gmres(mv, b_pad, state.x, M=M,
                        nullspace=None if has_bcs else bundle["ns"],
                        rtol=rtol, restart=restart,
                        project_nullspace=not has_bcs)
            x = jax.lax.with_sharding_constraint(res.x, shard_vec)
            phi = state.phi
            for f in range(2):
                verts, dofs = bundle["scat"][f]
                phi = phi.at[f, verts].set(x[dofs])
            phi_m = phi[0] - phi[1]
            return EMIState(phi=phi, phi_m=phi_m, n=n_, m=m_, h=h_,
                            t=t_new, x=x), res.iterations
        finally:
            for k, v in old_rhs.items():
                setattr(p, k, v)
            pc.install(old_pc)

    jitted = jax.jit(step)

    def bound_step(state):
        return jitted(state, bundle)

    bound_step.jitted = jitted
    bound_step.bundle = bundle

    state = p.initial_state()
    x_pad = np.zeros(halo.n_padded, dtype=npdt)
    x_pad[newpos] = np.asarray(state.x, dtype=npdt)
    state = state._replace(
        x=jax.device_put(x_pad, shard_vec))
    return state, bound_step, device_mesh, halo, pc
