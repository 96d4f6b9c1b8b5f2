"""The pure on-device lax.scan time loop must reproduce the per-step Python
loop exactly (production path used by long benchmark/serving runs)."""
import numpy as np

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI


def test_scan_solve_matches_python_loop():
    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.time_steps = 5
    mesh, tagger = generate_square_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, {"direct": True})
    solver.time_steps = 5
    s0 = problem.initial_state()
    s_loop = solver.solve(s0)
    s_scan = solver.scan_solve(s0, 5)
    np.testing.assert_allclose(np.asarray(s_scan.u), np.asarray(s_loop.u),
                               rtol=0, atol=1e-14)
    np.testing.assert_allclose(float(s_scan.t), float(s_loop.t), rtol=1e-12)
