"""Dof-sharded full-step tests: state vectors (x, b, Krylov basis) sharded
across 8 virtual devices with ppermute-halo SpMV, psum dots and a sharded
block preconditioner (VERDICT r1 #2; reference KNPEMIx_solver.py:435-468
PETSc distributed solve + ghost updates)."""
import numpy as np
import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.parallel.dof_sharded import (
    build_dof_sharded_problem, vertex_dof_partition,
    ShardedChebyshevPreconditioner)


def test_sharded_pc_matches_block_chebyshev():
    """The sharded per-dof Chebyshev preconditioner is elementwise-identical
    to BlockDiagonalPreconditioner(mode='chebyshev') applied per block."""
    from jax.sharding import Mesh
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI
    from knp_emi_cgx_tpu.solvers.precond import BlockDiagonalPreconditioner

    cfg = load_config("configs/tests/golden_parity.yaml")
    mesh, tagger = generate_square_geometry(8)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    a = problem.assembler
    problem.initial_state()
    u0 = problem._u0_np

    n_dev = 4
    device_mesh = Mesh(np.array(jax.devices("cpu")[:n_dev]), ("cells",))
    _, dof_part = vertex_dof_partition(a, n_dev)
    pc_sharded = ShardedChebyshevPreconditioner(a, u0, dof_part, device_mesh)
    pc_ref = BlockDiagonalPreconditioner(a, u0, mode="chebyshev")

    rng = np.random.default_rng(0)
    r = rng.standard_normal(a.n_dofs)
    y_ref = np.asarray(pc_ref(jnp.asarray(r)))

    halo = pc_sharded.halo
    r_pad = halo.pad_vector(jnp.asarray(r))
    y_sharded = np.asarray(halo.unpad_vector(pc_sharded(r_pad)))
    np.testing.assert_allclose(y_sharded, y_ref, rtol=1e-12, atol=1e-14)


def test_dof_sharded_8_matches_1_device():
    """Same step, 8 sharded devices vs 1: roundoff-exact."""
    cpu = jax.devices("cpu")
    p8, s8, step8, mesh8, halo8 = build_dof_sharded_problem(
        8, devices=cpu, n_mesh=12)
    out8, its8 = step8(s8)

    p1, s1, step1, mesh1, halo1 = build_dof_sharded_problem(
        1, devices=cpu[:1], n_mesh=12)
    out1, its1 = step1(s1)

    # identical partition-independent result: compare the field arrays
    u8 = np.asarray(out8.u)
    u1 = np.asarray(out1.u)
    assert np.all(np.isfinite(u8))
    np.testing.assert_allclose(u8, u1, rtol=1e-9, atol=1e-13)
    assert int(its8) == int(its1)


def test_dof_sharded_matches_standard_step():
    """The dof-sharded solve converges to the standard (unsharded) step's
    solution within solver tolerance; both use the same physics."""
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    cpu = jax.devices("cpu")
    p_sh, s_sh, step_sh, _, halo = build_dof_sharded_problem(
        8, devices=cpu, n_mesh=12, rtol=1e-10)

    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.solver_config = {"direct": False,
                         "ksp_settings": {"ksp_rtol": 1e-10,
                                          "pc_mode": "chebyshev"}}
    mesh, tagger = generate_square_geometry(12)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    step = solver._build_step(state)

    for _ in range(3):
        s_sh, its_sh = step_sh(s_sh)
        state, its = step(state)

    u_sh = np.asarray(s_sh.u)
    u_ref = np.asarray(state.u)
    np.testing.assert_allclose(u_sh, u_ref, rtol=1e-7, atol=1e-11)


def test_vertex_partition_covers_all_dofs():
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI

    cfg = load_config("configs/tests/golden_parity.yaml")
    mesh, tagger = generate_square_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    a = problem.assembler
    vpart, dof_part = vertex_dof_partition(a, 8)
    assert dof_part.shape == (a.n_dofs,)
    assert set(np.unique(vpart)) <= set(range(8))
    # all 8 fields of a vertex land on the vertex's device
    fd = a.field_dof
    for f in range(a.nf):
        active = np.nonzero(fd[f] >= 0)[0]
        assert np.array_equal(dof_part[fd[f, active]], vpart[active])
    # reasonable balance from the BFS partitioner
    counts = np.bincount(vpart, minlength=8)
    assert counts.min() > 0
