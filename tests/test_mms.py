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


def _run(N, dim, dt=1e-5, steps=1):
    cfg = parse_config({
        "problem_type": "KNP-EMI",
        "dt": dt, "time_steps": steps,
        "physical_constants": {"T": 1.0, "F": 1.0, "R": 1.0},
        "C_M": 1.0,
        "ics_tags": [1], "ecs_tags": [2], "boundary_tags": [8],
        "membrane_tags": list(range(1, 2 * dim + 1)),
        "MMS_test": {"N_mesh": N, "dim": dim},
        "solver": {"direct": True, "output": {}},
    })
    problem = ProblemKNPEMI(cfg)
    problem.init_ionic_models([PassiveModel()])
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = solver.solve()
    return problem.mms_errors(state)


FIELDS = ["Na_i", "K_i", "Cl_i", "phi_i", "Na_e", "K_e", "Cl_e", "phi_e"]


def test_mms_2d_second_order():
    e1 = _run(8, 2)
    e2 = _run(16, 2)
    e3 = _run(32, 2)
    for f in FIELDS:
        r12 = np.log2(e1[f] / e2[f])
        r23 = np.log2(e2[f] / e3[f])
        assert r23 > 1.85, f"{f}: rates {r12:.2f}, {r23:.2f}"


@pytest.mark.slow
def test_mms_3d_second_order():
    # N=4 is pre-asymptotic in 3D (rate ~1.4-1.6); by N=8->16 all fields are
    # ~1.8-1.9 and still climbing towards 2 (matching the reference's
    # recorded 3D behaviour, errors.py:19-28)
    e1 = _run(8, 3)
    e2 = _run(16, 3)
    for f in FIELDS:
        rate = np.log2(e1[f] / e2[f])
        assert rate > 1.7, f"{f}: rate {rate:.2f} ({e1[f]:.3e} -> {e2[f]:.3e})"
