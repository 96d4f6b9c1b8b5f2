"""Solver-quality robustness: the AMG-preconditioned GMRES iteration count
must stay flat under mesh refinement (the property hypre gives the reference;
its CI gates 3.0 iterations only on the single 32x32 case)."""
import numpy as np
import pytest

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import (generate_square_geometry,
                                             generate_cube_geometry)
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI


def _iterations(gen, n, steps=3, scale_stim=None):
    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.time_steps = steps
    if scale_stim is not None:
        cfg.scale_stimulus = scale_stim
    cfg.solver_config = {"direct": False,
                         "ksp_settings": {"ksp_rtol": 1e-9, "pc_mode": "amg"}}
    mesh, tagger = gen(n)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, cfg.solver_config)
    solver.solve()
    return solver.iterations


@pytest.mark.slow
def test_iterations_mesh_robust_2d():
    its = {n: _iterations(generate_square_geometry, n) for n in (16, 32, 64)}
    for n, seq in its.items():
        assert max(seq) <= 4, (n, seq)


@pytest.mark.slow
def test_iterations_mesh_robust_3d():
    its = {n: _iterations(generate_cube_geometry, n, scale_stim=False)
           for n in (8, 12, 16)}
    for n, seq in its.items():
        assert max(seq) <= 4, (n, seq)
