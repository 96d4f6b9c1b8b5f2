"""Selective-f64 production-tolerance solves (solvers/refine.py): rtol 1e-9
in the reference's preconditioned-norm criterion with f32 physics storage
(VERDICT r1 #4; reference rtol anchor KNPEMIx_solver.py:27,39)."""
import numpy as np
import jax
import jax.numpy as jnp

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.ops.spmv import csr_mv
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI
from knp_emi_cgx_tpu.solvers.refine import solve_f64, repaired_vals64

RTOL = 1e-9


def _build(n=16, dtype=jnp.float32, ksp=None):
    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.solver_config = {"direct": False,
                         "ksp_settings": ksp or {"ksp_rtol": RTOL,
                                                 "pc_mode": "dense",
                                                 "mixed_precision": True}}
    mesh, tagger = generate_square_geometry(n)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh, dtype=dtype)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    return problem, SolverKNPEMI(problem, cfg.solver_config)


def _assemble(problem, state, state_new):
    a = problem.assembler
    gates = {"n": state_new.n, "m": state_new.m, "h": state_new.h}
    vals, b = a.assemble(state.u, state.phi_m, gates, state_new.t)
    # the operator the f64 path solves (exact-nullspace repair applied)
    vals64 = repaired_vals64(vals, a.row_ids, a.n_dofs,
                             (a.phi_repair_slots, a.phi_col_mask))
    return vals, vals64, b


def _precond_residual(a, pc, vals64, b, x):
    """f64 preconditioned relative residual ||P M r|| / ||P M b|| (P = the
    nullspace projector) — the reference KSP criterion: preconditioned norm
    with PETSc's KSP_PCApply nullspace removal."""
    mask = (a.nullspace != 0).astype(jnp.float64)
    ns = mask / jnp.linalg.norm(mask)

    def proj(v):
        return v - jnp.dot(ns, v) * ns

    b64 = proj(b.astype(jnp.float64))
    r = b64 - csr_mv(vals64, x.astype(jnp.float64),
                     a.indices, a.row_ids, a.n_dofs)
    r = proj(r)
    num = jnp.linalg.norm(proj(pc(r).astype(jnp.float64)))
    den = jnp.linalg.norm(proj(pc(b64).astype(jnp.float64)))
    return float(num / den)


def test_selective_f64_reaches_production_rtol():
    problem, solver = _build()
    state0 = problem.initial_state()
    state = state0._replace(x=(state0.x * 0.5).astype(jnp.float64))
    step = solver._build_step(state)     # builds the f64 preconditioner
    new_state, its = step(state)
    assert int(its) > 1
    assert new_state.x.dtype == jnp.float64  # solver vector carries f64
    assert new_state.u.dtype == jnp.float32  # physics storage stays f32

    # criterion check on a solve of the SAME (eagerly assembled) system —
    # re-assembling under jit rounds f32 values differently, so the step's
    # internal system cannot be reproduced bit-exactly outside it
    a = problem.assembler
    vals, vals64, b = _assemble(problem, state, new_state)
    res = solve_f64(vals, b, state.x, a.indices, a.row_ids, a.n_dofs,
                    M=solver._pc, nullspace=a.nullspace, rtol=RTOL,
                    project_nullspace=True,
                    repair=(a.phi_repair_slots, a.phi_col_mask))
    assert bool(res.converged)
    rel = _precond_residual(a, solver._pc, vals64, b, res.x)
    assert rel <= 2 * RTOL, f"preconditioned residual {rel:.3e}"


def test_plain_f32_cannot_certify_production_rtol():
    """Sanity: a pure-f32 GMRES at the same rtol reports convergence but its
    REAL preconditioned residual stays orders of magnitude above 1e-9."""
    problem, solver = _build(ksp={"ksp_rtol": RTOL, "pc_mode": "dense"})
    state0 = problem.initial_state()
    state = state0._replace(x=state0.x * 0.5)
    step = solver._build_step(state)
    new_state, its = step(state)
    from knp_emi_cgx_tpu.solvers.precond import BlockDiagonalPreconditioner

    pc64 = BlockDiagonalPreconditioner(problem.assembler, problem._u0_np,
                                       mode="dense", dtype=jnp.float64)
    a = problem.assembler
    _vals, vals64, b = _assemble(problem, state, new_state)
    rel = _precond_residual(a, pc64, vals64, b, new_state.x)
    assert rel > 20 * RTOL, f"f32 unexpectedly certified {rel:.3e}"


def test_selective_f64_multistep_warm_start():
    """Across timesteps the f64 warm start keeps per-step iteration counts
    at the golden-test level."""
    problem, solver = _build()
    state = solver.solve()
    # per-step count at the FULL production criterion (1e-9 relative to
    # ||proj M b||) from f32-rounded field states; stays bounded and flat
    assert max(solver.iterations) <= 20, solver.iterations
    assert np.all(np.isfinite(np.asarray(state.u)))


def test_df32_primitives_are_f64_grade():
    """Error-free transformations and compensated reductions hit ~2^-48."""
    from knp_emi_cgx_tpu.solvers import df32 as D

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(4096), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(4096), dtype=jnp.float32)
    s, e = D.two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    assert float(jnp.max(jnp.abs(D.df_to_f64(s, e) - exact))) == 0.0
    p, pe = D.two_prod(a, b)
    exactp = a.astype(jnp.float64) * b.astype(jnp.float64)
    assert float(jnp.max(jnp.abs(D.df_to_f64(p, pe) - exactp))) == 0.0

    n = 50000
    x = rng.standard_normal(n)
    y = rng.standard_normal(n)
    d = D.df_dot(*D.df_from_f64(jnp.asarray(x)), *D.df_from_f64(jnp.asarray(y)))
    assert abs(float(d) - np.dot(x, y)) / abs(np.dot(x, y)) < 1e-13

    import scipy.sparse as sp

    A = sp.random(3000, 3000, density=0.01, format="csr", random_state=1) \
        + sp.eye(3000)
    ell = D.EllMatrix(A.indptr, A.indices)
    vals = jnp.asarray(A.data, dtype=jnp.float32)
    xh, xl = D.df_from_f64(jnp.asarray(x[:3000]))
    yh, yl = ell.matvec_df(ell.ell_values(vals), xh, xl)
    got = np.asarray(D.df_to_f64(yh, yl))
    ref = sp.csr_matrix((np.asarray(vals, np.float64), A.indices, A.indptr),
                        shape=A.shape) @ x[:3000]
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-13


def test_df32_certifies_production_rtol():
    """The compensated double-f32 GMRES (pure f32 tensor ops — the
    TPU-native production path) certifies rtol 1e-9 against the REAL f64
    preconditioned residual, with the AMG preconditioner applied in df32."""
    from knp_emi_cgx_tpu.solvers.precond import BlockDiagonalPreconditioner

    problem, solver = _build(ksp={"ksp_rtol": RTOL, "pc_mode": "amg",
                                  "precision": "df32"})
    state0 = problem.initial_state()
    state = state0._replace(
        x=jnp.stack([state0.x * 0.5, jnp.zeros_like(state0.x)]))
    step = solver._build_step(state)
    new_state, its = step(state)
    assert int(its) > 1
    assert new_state.x.dtype == jnp.float32      # pure f32 storage
    assert new_state.x.shape[0] == 2             # (hi, lo) pair

    a = problem.assembler
    vals, vals64, b = _assemble(problem, state._replace(x=state.x[0]),
                                new_state)
    x64 = (new_state.x[0].astype(jnp.float64)
           + new_state.x[1].astype(jnp.float64))
    if solver._stencil is not None:
        # the square mesh is a lattice, so the r4 stencil operator keeps
        # the Krylov carry in the UNCOMPACTED lattice layout [nf * n_pts]
        # (ops/stencil.py); compact it back to dof order before scoring
        # against the CSR operator
        x64 = x64[solver._stencil.lat_of_dof_np]
    pc64 = BlockDiagonalPreconditioner(a, problem._u0_np, mode="amg",
                                       dtype=jnp.float64)
    rel = _precond_residual(a, pc64, vals64, b, x64)
    assert rel <= 2 * RTOL, f"real preconditioned residual {rel:.3e}"


def test_df32_multistep_warm_start():
    problem, solver = _build(ksp={"ksp_rtol": RTOL, "pc_mode": "amg",
                                  "precision": "df32"})
    state = solver.solve()
    assert max(solver.iterations) <= 25, solver.iterations
    assert np.all(np.isfinite(np.asarray(state.u)))


def test_selective_f64_matches_f64_dense_solve():
    """One selective-f64 solve matches the deflated dense f64 solve of the
    same (repaired) system."""
    problem, solver = _build()
    state0 = problem.initial_state()
    state = state0._replace(x=(state0.x * 0.5).astype(jnp.float64))
    step = solver._build_step(state)
    new_state, _ = step(state)

    a = problem.assembler
    vals, vals64, b = _assemble(problem, state, new_state)
    res = solve_f64(vals, b, state.x, a.indices, a.row_ids, a.n_dofs,
                    M=solver._pc, nullspace=a.nullspace, rtol=RTOL,
                    project_nullspace=True,
                    repair=(a.phi_repair_slots, a.phi_col_mask))

    from knp_emi_cgx_tpu.ops.spmv import csr_to_dense

    A = np.array(csr_to_dense(a.indptr, a.indices, vals64))
    b64 = np.array(b, dtype=np.float64)
    mask = (np.array(a.nullspace) != 0).astype(np.float64)
    ns = mask / np.linalg.norm(mask)
    A_d = A + np.outer(ns, ns)
    x_ref = np.linalg.solve(A_d, b64 - ns * (ns @ b64))
    x_got = np.array(res.x, dtype=np.float64)
    x_ref = x_ref - ns * (ns @ x_ref)
    x_got = x_got - ns * (ns @ x_got)
    err = np.linalg.norm(x_got - x_ref) / np.linalg.norm(x_ref)
    # the preconditioned-norm criterion leaves a true-residual (and hence
    # solution) gap of ~kappa x rtol — same semantics as the reference KSP
    assert err < 5e-5, f"solution error {err:.3e}"


def test_df32_split_step_matches_fused():
    """The three-program split step (split_step + launch_outer chunked
    launches — the axon-runtime-safe production configuration, see
    SolverKNPEMI.__init__) is bit-identical to the fused single-jit df32
    step: same assembly, same Krylov math, only jit boundaries differ."""
    def run(ksp):
        problem, solver = _build(n=12, ksp=ksp)
        state = problem.initial_state()
        state = state._replace(
            x=jnp.stack([state.x, jnp.zeros_like(state.x)]))
        step = solver._build_step(state)
        for _ in range(2):
            state, its = step(state)
        return np.asarray(state.u, np.float64), int(its)

    base = {"ksp_rtol": RTOL, "pc_mode": "amg", "precision": "df32"}
    u_fused, its_f = run(base)
    u_split, its_s = run({**base, "split_step": True,
                          "launch_outer": 2, "launch_count": 20,
                          "launch_count_cold": 30})
    assert its_s == its_f
    np.testing.assert_array_equal(u_split, u_fused)
