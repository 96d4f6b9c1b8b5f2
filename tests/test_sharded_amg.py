"""Sharded SA-AMG preconditioner tests (VERDICT r2 #2: the parallel
BoomerAMG equivalent — reference KNPEMIx_solver.py:269-273 runs hypre
inside the PETSc-distributed solve).

The sharded V-cycle (parallel/sharded_amg.py) must (a) reproduce the plain
single-device hierarchy apply to roundoff, (b) give partition-independent
full steps (8 devices == 1), and (c) match the UNSHARDED per-block AMG
solver's iteration counts on the production problem class (3D many-cell
tissue + glia stack)."""
import numpy as np
import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.parallel.dof_sharded import (build_dof_sharded_problem,
                                                  unpad_vertex_fields)


def test_sharded_amg_apply_matches_plain_hierarchy():
    """__call__ on the padded sharded layout == the plain SA-AMG V-cycle
    of solvers/amg.py on the same monolithic hierarchy (to roundoff)."""
    cpu = jax.devices("cpu")
    p8, _, _, _, _ = build_dof_sharded_problem(8, devices=cpu, n_mesh=12,
                                               pc_mode="amg")
    pc = p8._sharded_pc
    rng = np.random.default_rng(0)
    r = rng.standard_normal(p8.assembler.n_dofs)
    y_plain = np.asarray(pc.amg(jnp.asarray(r)))
    r_pad = pc.halo.pad_vector(jnp.asarray(r))
    y_sh = np.asarray(pc.halo.unpad_vector(pc(r_pad)))
    np.testing.assert_allclose(y_sh, y_plain, rtol=1e-12, atol=1e-15)


def test_tissue_dof_sharded_amg_8_matches_1_and_unsharded_iterations():
    """The PRODUCTION problem class through the dof-sharded path (VERDICT
    r2 #3): 3D tissue (16^3, 8 cells, 2 glial — configs/tissue/test_8c.yaml
    tag convention) with the full neuron+glia membrane stack, sharded
    SA-AMG preconditioner.  8 devices == 1 device to roundoff with EQUAL
    iteration counts, and the sharded iteration count equals the unsharded
    per-block-AMG solver's on the same problem (preconditioner parity)."""
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.main import build_models
    from knp_emi_cgx_tpu.mesh.generation import geometry_from_spec
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    cfg_file = "configs/tissue/test_8c.yaml"
    cpu = jax.devices("cpu")
    p8, s8, step8, _, _ = build_dof_sharded_problem(
        8, devices=cpu, config=cfg_file, mesh_spec="tissue16x8c",
        pc_mode="amg", rtol=1e-9)
    out8, its8 = step8(s8)
    p1, s1, step1, _, _ = build_dof_sharded_problem(
        1, devices=cpu[:1], config=cfg_file, mesh_spec="tissue16x8c",
        pc_mode="amg", rtol=1e-9)
    out1, its1 = step1(s1)

    assert int(its8) == int(its1)
    u8 = unpad_vertex_fields(p8, out8.u)
    u1 = unpad_vertex_fields(p1, out1.u)
    assert np.all(np.isfinite(u8))
    np.testing.assert_allclose(u8, u1, rtol=1e-8, atol=1e-11)

    # unsharded solver, same mesh/models/tolerance, per-block AMG
    cfg = load_config(cfg_file)
    cfg.solver_config = {"direct": False,
                         "ksp_settings": {"ksp_rtol": 1e-9,
                                          "pc_mode": "amg"}}
    mesh, tagger = geometry_from_spec("tissue16x8c")
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(build_models(problem, cfg_file))
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = problem.initial_state()
    step = solver._build_step(state)
    _, its_ref = step(state)
    assert abs(int(its8) - int(its_ref)) <= 2, \
        f"sharded AMG {int(its8)} its vs unsharded {int(its_ref)}"


def test_sharded_amg_level1_sharded_matches_replicated():
    """shard_levels=2 (level 1 sharded over its own coarse-dof halo plan,
    agglomeration only from level 2 — the pod-scalable hierarchy) applies
    the SAME V-cycle as the replicated-tail form: identical smoothing ops,
    only the level-1<->2 transfer reductions regroup, so plain-f64 applies
    agree to roundoff and df32 applies stay within the operator's ~2^-48
    accuracy."""
    from knp_emi_cgx_tpu.solvers.df32 import df_from_f64, df_to_f64

    cpu = jax.devices("cpu")
    p_rep, _, _, _, _ = build_dof_sharded_problem(
        8, devices=cpu, n_mesh=16, pc_mode="amg")
    p_sh2, _, _, _, _ = build_dof_sharded_problem(
        8, devices=cpu, n_mesh=16, pc_mode="amg", amg_shard_levels=2)
    pc_rep, pc_sh2 = p_rep._sharded_pc, p_sh2._sharded_pc
    assert pc_sh2.shard_levels == 2, \
        "hierarchy too shallow for the level-1 sharding test"
    rng = np.random.default_rng(1)
    r = rng.standard_normal(p_rep.assembler.n_dofs)
    y_rep = np.asarray(pc_rep.halo.unpad_vector(
        pc_rep(pc_rep.halo.pad_vector(jnp.asarray(r)))))
    y_sh2 = np.asarray(pc_sh2.halo.unpad_vector(
        pc_sh2(pc_sh2.halo.pad_vector(jnp.asarray(r)))))
    np.testing.assert_allclose(y_sh2, y_rep, rtol=1e-11, atol=1e-14)

    # df32 leg on a fresh df problem (and a full step through gmres_df32)
    p_df, s0, step, dmesh, halo = build_dof_sharded_problem(
        4, devices=cpu, n_mesh=16, precision="df32", rtol=1e-8, restart=16,
        pc_mode="amg", amg_shard_levels=2)
    pc = p_df._sharded_pc
    assert pc.shard_levels == 2
    r = rng.standard_normal(p_df.assembler.n_dofs)
    y64 = np.asarray(pc.amg(jnp.asarray(r)))
    r_pad = np.zeros(halo.n_padded)
    r_pad[halo.newpos] = r
    rh, rl = df_from_f64(jnp.asarray(r_pad))
    yh, yl = pc.apply_df(rh, rl)
    ydf = np.asarray(df_to_f64(yh, yl))[halo.newpos]
    rel = np.linalg.norm(ydf - y64) / np.linalg.norm(y64)
    assert rel < 1e-7, f"df32 level-1-sharded apply deviates by {rel:.2e}"

    s1, its = step(s0)
    assert int(its) > 1
    assert np.all(np.isfinite(np.asarray(s1.u)))


def test_sharded_amg_df32_apply_and_step():
    """The df32 production-tolerance application: compensated V-cycle on
    (hi, lo) pairs — must act as the same operator as the f64 apply of the
    f32-stored hierarchy (well below f32 noise, so the df32 Krylov
    recurrence doesn't stall) and drive a full df32 step."""
    from knp_emi_cgx_tpu.solvers.df32 import df_from_f64, df_to_f64

    cpu = jax.devices("cpu")
    p, s0, step, dmesh, halo = build_dof_sharded_problem(
        4, devices=cpu, n_mesh=8, precision="df32", rtol=1e-9, restart=16,
        pc_mode="amg")
    pc = p._sharded_pc
    rng = np.random.default_rng(0)
    r = rng.standard_normal(p.assembler.n_dofs)
    y64 = np.asarray(pc.amg(jnp.asarray(r)))
    r_pad = np.zeros(halo.n_padded)
    r_pad[halo.newpos] = r
    rh, rl = df_from_f64(jnp.asarray(r_pad))
    yh, yl = pc.apply_df(rh, rl)
    ydf = np.asarray(df_to_f64(yh, yl))[halo.newpos]
    rel = np.linalg.norm(ydf - y64) / np.linalg.norm(y64)
    assert rel < 1e-7, f"df32 apply deviates from f64 by {rel:.2e}"

    s1, its = step(s0)
    assert int(its) > 1
    assert np.all(np.isfinite(np.asarray(s1.u)))
