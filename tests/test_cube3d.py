"""3D (tetrahedral) KNP-EMI smoke + physics sanity: the assembly path is
dimension-generic; this exercises tet geometry, triangle-facet quadrature and
the 3D membrane orientation."""
import numpy as np
import pytest

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import generate_cube_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

CONFIG = "configs/tests/golden_parity.yaml"


@pytest.fixture(scope="module")
def solved_cube():
    cfg = load_config(CONFIG)
    cfg.time_steps = 3
    # The 2D test config scales the stimulus by 1/membrane-area; on the 3D
    # cube that area is 1.5e-12 m^2, turning g_syn_bar=1e-9 into an ~88 A/m^2
    # depolarising current (the reference would do the same).  Disable the
    # scaling so the 3D smoke test stays at rest.
    cfg.scale_stimulus = False
    cfg.solver_config = {"direct": False,
                         "ksp_settings": {"ksp_rtol": 1e-9, "pc_mode": "dense"}}
    mesh, tagger = generate_cube_geometry(8)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = solver.solve()
    return problem, solver, state


def test_cube_runs_and_is_sane(solved_cube):
    problem, solver, state = solved_cube
    u = np.asarray(state.u)
    assert np.all(np.isfinite(u))
    phi_m = np.asarray(state.phi_m)[problem.topo.membrane_verts].ravel()
    assert np.all(phi_m < -0.060) and np.all(phi_m > -0.080)
    # iteration count stays small and mesh-robust in 3D too
    assert max(solver.iterations) <= 6, solver.iterations


def test_cube_conservation(solved_cube):
    """Total ion content drift stays at the semi-implicit scheme's
    O(dt * membrane-flux) level (print_conservation analog as an assert)."""
    problem, solver, state = solved_cube
    cons = problem.conservation(state)
    p = problem.params
    vol_i = 0.5 ** 3 * (1e-6) ** 3
    vol_e = (1.0 - 0.5 ** 3) * (1e-6) ** 3
    for k, ion in enumerate(p.ion_list):
        expected = ion["ki_init"] * vol_i + ion["ke_init"] * vol_e
        drift = abs(float(cons[ion["name"]]) - expected) / expected
        # The semi-implicit scheme is conservative only up to the alpha_i vs
        # alpha_e splitting of the capacitive current (O(dt * I_ch) per step)
        # — the reference merely prints this drift (print_conservation).
        assert drift < 1e-5, f"{ion['name']} drift {drift:.2e}"
