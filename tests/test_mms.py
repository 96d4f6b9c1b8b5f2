"""MMS (manufactured solutions) convergence verification.

Replicates the reference's verification layer (setup_mms.py, errors.py):
with the exact sin/cos/exp fields and symbolically-derived sources, the P1
discretisation must converge at O(h^2) in L2 for all 8 fields — the same
second-order rates the reference records (errors.py:41-43)."""
import numpy as np
import pytest

from knp_emi_cgx_tpu.config import parse_config
from knp_emi_cgx_tpu.models.ionic import PassiveModel
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI


def _run(N, dim, dt=1e-5, steps=1, order=1, direct=True):
    cfg = parse_config({
        "problem_type": "KNP-EMI",
        "dt": dt, "time_steps": steps,
        "fem_order": order,
        "physical_constants": {"T": 1.0, "F": 1.0, "R": 1.0},
        "C_M": 1.0,
        "ics_tags": [1], "ecs_tags": [2], "boundary_tags": [8],
        "membrane_tags": list(range(1, 2 * dim + 1)),
        "MMS_test": {"N_mesh": N, "dim": dim},
        "solver": {"direct": direct, "output": {},
                   "ksp_settings": {"ksp_rtol": 1e-10, "pc_mode": "dense"}},
    })
    problem = ProblemKNPEMI(cfg)
    problem.init_ionic_models([PassiveModel()])
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = solver.solve()
    return problem.mms_errors(state), solver


FIELDS = ["Na_i", "K_i", "Cl_i", "phi_i", "Na_e", "K_e", "Cl_e", "phi_e"]


def test_mms_2d_second_order():
    e1, _ = _run(8, 2)
    e2, _ = _run(16, 2)
    e3, _ = _run(32, 2)
    for f in FIELDS:
        r12 = np.log2(e1[f] / e2[f])
        r23 = np.log2(e2[f] / e3[f])
        assert r23 > 1.85, f"{f}: rates {r12:.2f}, {r23:.2f}"


@pytest.mark.slow
def test_mms_3d_second_order():
    # N=4 is pre-asymptotic in 3D (rate ~1.4-1.6); by N=8->16 all fields are
    # ~1.8-1.9 and still climbing towards 2 (matching the reference's
    # recorded 3D behaviour, errors.py:19-28)
    e1, _ = _run(8, 3)
    e2, _ = _run(16, 3)
    for f in FIELDS:
        rate = np.log2(e1[f] / e2[f])
        assert rate > 1.7, f"{f}: rate {rate:.2f} ({e1[f]:.3e} -> {e2[f]:.3e})"


def test_mms_2d_p2_third_order():
    """fem_order 2 (the knob the reference parses but never exercises,
    mixed_dim_problem.py:207-208): the P2 node-space discretisation must
    converge at O(h^3) in L2 for all 8 fields."""
    e1, _ = _run(4, 2, order=2)
    e2, _ = _run(8, 2, order=2)
    e3, _ = _run(16, 2, order=2)
    for f in FIELDS:
        r = 0.5 * np.log2(e1[f] / e3[f])
        assert r > 2.5, f"{f}: {e1[f]:.3e} {e2[f]:.3e} {e3[f]:.3e}, rate {r:.2f}"
    # accuracy dominance: P2 at N=8 beats P1 at N=16 on every field
    p1, _ = _run(16, 2)
    for f in FIELDS:
        assert e2[f] < 0.5 * p1[f], f"{f}: P2 {e2[f]:.3e} vs P1 {p1[f]:.3e}"


def test_mms_2d_iterative_matches_direct():
    """GMRES + the BC-aware block-diagonal preconditioner reproduces the
    direct solve on the Dirichlet MMS problem for both element orders.
    (Without the preconditioner's Dirichlet row/col elimination the BC unit
    diagonal sits ~1e4 above the physical scale and GMRES stagnates at the
    1500-iteration cap.)"""
    for order, it_bound in ((1, 60), (2, 250)):
        ed, _ = _run(8, 2, order=order)
        ei, solver = _run(8, 2, order=order, direct=False)
        for f in FIELDS:
            # the L2 errors are discretisation-dominated (~1e-3); the two
            # solves must agree far below that level
            assert abs(ei[f] - ed[f]) <= 2e-4 * max(ed[f], 1e-12), \
                f"P{order} {f}: direct {ed[f]:.6e} vs iterative {ei[f]:.6e}"
        assert np.mean(solver.iterations) < it_bound


@pytest.mark.slow
def test_mms_3d_p2_accuracy_dominance():
    """3D P2 sanity at CI-affordable sizes (the N=8 P2 cube is a ~38k-dof
    dense direct solve — too heavy for a rate pair here; the O(h^3) rate is
    asserted in 2D above).  P2 at N=4 must beat P1 at N=4 on every field
    and approach P1 at N=8 (same node count) despite 8x fewer cells."""
    ep2, _ = _run(4, 3, order=2)
    ep1, _ = _run(4, 3, order=1)
    ep1f, _ = _run(8, 3, order=1)
    for f in FIELDS:
        assert ep2[f] < 0.35 * ep1[f], \
            f"{f}: P2@4 {ep2[f]:.3e} vs P1@4 {ep1[f]:.3e}"
        assert ep2[f] < 1.5 * ep1f[f], \
            f"{f}: P2@4 {ep2[f]:.3e} vs P1@8 {ep1f[f]:.3e}"
