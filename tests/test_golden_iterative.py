"""Golden-parity regression test vs the reference's iterative-solver values
(`tests/KNPEMI/electric_potential_norms_iterative_solver.py`).

Reference setup: same 32x32 problem, GMRES rtol 1e-9 (preconditioned norm)
with a block-diagonal preconditioner approximated by BoomerAMG; asserts the
phi norms and that the mean iteration count is exactly 3.0.

Our GMRES uses the same block-diagonal preconditioner with exact SPD block
inverses instead of one AMG V-cycle — and hits the same 3 iterations/step.
Tolerances: ||phi_i|| gated at 1e-6 relative (reference's own gate is
rtol*100 = 1e-7, achievable only on their exact linear-algebra stack);
||phi_e|| is a ~1e-4-magnitude cancellation between the solution's nullspace
mode and the warm-start component, so it is gated at 5e-4 relative — the
physics behind it is already pinned by the direct golden test.
"""
import pytest

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

REF_PHI_I = 3.510994056704844e-08
REF_PHI_E = 6.369472309249516e-11
REF_ITERATIONS = 3.0

CONFIG = "configs/tests/golden_parity.yaml"


@pytest.fixture(scope="module")
def solved():
    cfg = load_config(CONFIG)
    cfg.solver_config = {
        "direct": False,
        "ksp_settings": {"ksp_rtol": 1e-9, "pc_mode": "dense"},
    }
    mesh, tagger = generate_square_geometry(32)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = solver.solve()
    return problem, solver, state


def test_phi_norms_iterative(solved):
    problem, solver, state = solved
    norms = problem.l2_norms(state)
    rel_i = abs(float(norms["phi_i"]) - REF_PHI_I) / REF_PHI_I
    rel_e = abs(float(norms["phi_e"]) - REF_PHI_E) / REF_PHI_E
    assert rel_i < 1e-6, f"phi_i rel err {rel_i:.3e}"
    assert rel_e < 5e-4, f"phi_e rel err {rel_e:.3e}"


def test_gmres_iteration_count(solved):
    """Solver-quality gate: the reference asserts mean iterations == 3.0
    with GMRES+BoomerAMG; we match it exactly with our preconditioner."""
    _, solver, _ = solved
    mean_its = sum(solver.iterations) / len(solver.iterations)
    assert mean_its == REF_ITERATIONS, f"mean iterations {mean_its}"
