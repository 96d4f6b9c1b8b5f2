"""Circle-in-circle geometry (reference dfx_mesh_creation.py gmsh-circle
equivalent) + a KNP-EMI run on it."""
import numpy as np
import pytest

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.fem.p1 import cell_geometry, facet_geometry
from knp_emi_cgx_tpu.mesh.generation import generate_circle_geometry
from knp_emi_cgx_tpu.mesh.topology import build_topology
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI


def test_circle_geometry():
    n_rings, n_theta = 16, 48
    mesh, tagger = generate_circle_geometry(n_rings, n_theta)
    topo = build_topology(mesh, facet_tagger=tagger)
    _, vols = cell_geometry(mesh.points, mesh.cells)
    assert vols.min() > 0
    # disk area ~ pi (polygonal approximation)
    np.testing.assert_allclose(vols.sum(), np.pi, rtol=5e-3)
    # membrane circumference ~ 2 pi r_m with r_m = 0.5
    L = facet_geometry(mesh.points, topo.membrane_verts).sum()
    np.testing.assert_allclose(L, 2 * np.pi * 0.5, rtol=5e-3)
    # inner disk area ~ pi r_m^2
    inner = vols[mesh.cell_tags == 1].sum()
    np.testing.assert_allclose(inner, np.pi * 0.25, rtol=5e-3)
    assert np.all(mesh.cell_tags[topo.membrane_cell_intra] == 1)


def test_knpemi_on_circle():
    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.time_steps = 3
    cfg.scale_stimulus = False
    mesh, tagger = generate_circle_geometry(12, 36)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    solver = SolverKNPEMI(problem, {"direct": True})
    solver.time_steps = 3
    state = solver.solve()
    phi_m = np.asarray(state.phi_m)[problem.topo.membrane_verts].ravel()
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert np.all(np.abs(phi_m + 0.070) < 0.005)
