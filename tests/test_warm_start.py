"""Extrapolated warm start (`warm_start: extrapolated`): the linear-in-time
predictor 2*x_k - x_{k-1} must (a) leave the converged solution unchanged
within the solve tolerance, (b) not increase total Krylov iterations, and
(c) behave identically through solve() and scan_solve().

Reference anchor: the reference warm-starts from the previous solution
(non_zero_init_guess insertion, KNPEMIx_solver.py:177-209); the predictor
is our refinement of that — the termination criterion (real preconditioned
residual at rtol) is unchanged, so correctness is guaranteed by the solver,
not the guess.
"""
import numpy as np
import pytest

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

N_STEPS = 6
RTOL = 1e-9


def _run(warm_start, precision="df32"):
    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.time_steps = N_STEPS
    mesh, tagger = generate_square_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, {
        "direct": False,
        "ksp_settings": {"ksp_rtol": RTOL, "pc_mode": "amg",
                         "precision": precision,
                         "warm_start": warm_start}})
    solver.time_steps = N_STEPS
    state = solver.solve(problem.initial_state())
    return solver, state


@pytest.mark.slow   # 3 full df32 solve compiles; sharding-preservation test stays fast
def test_extrapolated_matches_previous_and_cuts_iterations():
    s_prev, st_prev = _run("previous")
    s_ext, st_ext = _run("extrapolated")
    # same converged physics (both certified at rtol on the same criterion)
    ref = np.asarray(st_prev.u, np.float64)
    new = np.asarray(st_ext.u, np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(new, ref, rtol=0, atol=1e-6 * scale)
    # the predictor must not make the solver work harder overall
    assert sum(s_ext.iterations) <= sum(s_prev.iterations), (
        s_ext.iterations, s_prev.iterations)
    # first step has no history: identical guess, identical count
    assert s_ext.iterations[0] == s_prev.iterations[0]

    # quadratic predictor (warm_start: extrapolated2): same physics, and
    # no more total work than the reference's previous-solution warm start
    # (vs LINEAR it wins on tissue meshes but can lose a few iterations on
    # this tiny square where the trajectory is barely resolved — the gate
    # guarantees only that it never extrapolates from a guess)
    s_q, st_q = _run("extrapolated2")
    np.testing.assert_allclose(np.asarray(st_q.u, np.float64), ref,
                               rtol=0, atol=1e-6 * scale)
    assert sum(s_q.iterations) <= sum(s_prev.iterations), (
        s_q.iterations, s_prev.iterations)
    # no history yet at steps 1-2: the gate must keep the guess identical
    assert s_q.iterations[:2] == s_ext.iterations[:2]


def test_extrapolator_preserves_sharding():
    """make_extrapolator is elementwise, so a dof-sharded [2, n] df32 pair
    keeps its sharding through the predictor — the property the sharded
    production harness (scripts/run_production.py) relies on."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from knp_emi_cgx_tpu.problems.knpemi import make_extrapolator

    devs = jax.devices("cpu")[:4]
    mesh = Mesh(np.array(devs), ("cells",))
    sh = NamedSharding(mesh, P(None, "cells"))
    rng = np.random.default_rng(0)
    x64_cur = rng.standard_normal(64)
    x64_prev = rng.standard_normal(64)

    def pair(v):
        hi = v.astype(np.float32)
        lo = (v - hi.astype(np.float64)).astype(np.float32)
        return jax.device_put(np.stack([hi, lo]), sh)

    extrap = make_extrapolator(df32_mode=True)
    g = extrap(pair(x64_cur), pair(x64_prev))
    assert g.sharding.spec == P(None, "cells")
    g64 = np.asarray(g[0], np.float64) + np.asarray(g[1], np.float64)
    np.testing.assert_allclose(g64, 2.0 * x64_cur - x64_prev,
                               rtol=1e-14, atol=1e-15)


@pytest.mark.slow   # two more df32 compiles (solve + scan)
def test_extrapolated_scan_matches_python_loop():
    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.time_steps = N_STEPS
    mesh, tagger = generate_square_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, {
        "direct": False,
        "ksp_settings": {"ksp_rtol": RTOL, "pc_mode": "amg",
                         "precision": "df32",
                         "warm_start": "extrapolated"}})
    solver.time_steps = N_STEPS
    s0 = problem.initial_state()
    s_loop = solver.solve(s0)
    s_scan = solver.scan_solve(s0, N_STEPS)
    # both paths run the SAME iterative solve, but the predictor compiles
    # separately (solve) vs fused into the scan body: a last-bit guess
    # difference changes the Krylov path, so agreement is to solver
    # accuracy (rtol on the preconditioned residual), not bitwise
    ref = np.asarray(s_loop.u, np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(s_scan.u), ref,
                               rtol=0, atol=1e-6 * scale)
    np.testing.assert_allclose(float(s_scan.t), float(s_loop.t), rtol=1e-12)
