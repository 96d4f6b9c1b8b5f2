"""Explicit shard_map SPMD kernels on the 8-virtual-device CPU mesh:
row-partitioned SpMV and psum dot products must match the single-device
results exactly, and GMRES driven by the sharded matvec must solve the real
KNP-EMI system."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.ops.spmv import csr_mv
from knp_emi_cgx_tpu.parallel.shard_map_spmv import (ShardedCSR,
                                                     make_sharded_matvec,
                                                     sharded_dot)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI


N_DEV = 8


@pytest.fixture(scope="module")
def device_mesh():
    devs = [d for d in jax.devices() if d.platform == "cpu"][:N_DEV]
    if len(devs) < N_DEV:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(np.array(devs), ("cells",))


@pytest.fixture(scope="module")
def system():
    cfg = load_config("configs/tests/golden_parity.yaml")
    mesh, tagger = generate_square_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    a = problem.assembler
    state = problem.initial_state()
    gates = {"n": state.n, "m": state.m, "h": state.h}
    vals, b = a.assemble(state.u, state.phi_m, gates, state.t + a.params.dt)
    return problem, vals, b


def test_sharded_spmv_matches_serial(system, device_mesh):
    problem, vals, b = system
    a = problem.assembler
    op = ShardedCSR(np.asarray(a.indptr), np.asarray(a.indices), a.n_dofs,
                    N_DEV)
    matvec = make_sharded_matvec(op, device_mesh)
    y_sharded = op.unpad_vector(
        matvec(op.shard_values(vals), op.pad_vector(b)))
    y_serial = csr_mv(vals, b, a.indices, a.row_ids, a.n_dofs)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_serial),
                               rtol=1e-12, atol=1e-20)


def test_sharded_dot_matches_serial(system, device_mesh):
    problem, vals, b = system
    a = problem.assembler
    op = ShardedCSR(np.asarray(a.indptr), np.asarray(a.indices), a.n_dofs,
                    N_DEV)
    dot = sharded_dot(device_mesh, "cells")
    x = op.pad_vector(b)
    got = float(dot(x, 2.0 * x))
    np.testing.assert_allclose(got, 2.0 * float(jnp.dot(x, x)), rtol=1e-13)


def test_gmres_with_sharded_matvec(system, device_mesh):
    """End-to-end: solve the real system with GMRES whose matvec runs under
    shard_map across 8 devices; compare to the deflated direct solution."""
    from knp_emi_cgx_tpu.solvers.direct import dense_solve_deflated
    from knp_emi_cgx_tpu.solvers.krylov import gmres
    from knp_emi_cgx_tpu.solvers.precond import BlockDiagonalPreconditioner

    problem, vals, b = system
    a = problem.assembler
    op = ShardedCSR(np.asarray(a.indptr), np.asarray(a.indices), a.n_dofs,
                    N_DEV)
    matvec = make_sharded_matvec(op, device_mesh)
    vals_sh = op.shard_values(vals)

    pc = BlockDiagonalPreconditioner(a, problem._u0_np, mode="amg")

    def mv(x):
        return op.unpad_vector(matvec(vals_sh, op.pad_vector(x)))

    x0 = jnp.zeros(a.n_dofs, dtype=b.dtype)
    res = gmres(mv, b, x0, M=pc, nullspace=a.nullspace, rtol=1e-10,
                project_nullspace=True)
    x_direct = dense_solve_deflated(a.indptr, a.indices, vals, b, a.nullspace)
    # compare up to the nullspace constant
    d = np.asarray(res.x) - np.asarray(x_direct)
    ns = np.asarray(a.nullspace)
    d = d - (d @ ns) * ns
    assert np.linalg.norm(d) / np.linalg.norm(np.asarray(x_direct)) < 1e-6
    assert int(res.iterations) <= 150   # cold start at rtol 1e-10
