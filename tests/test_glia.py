"""Three-compartment (neuron + glia + ECS) pathway: per-cell membrane tags,
glial Kir-Na/K pump and KCC1/NKCC1 cotransporters, per-compartment initial
conditions — the reference's tissue-config workflow (main.py:32-39,
configs/5m/100c.yaml tag layout)."""
import numpy as np
import pytest

from knp_emi_cgx_tpu.config import parse_config
from knp_emi_cgx_tpu.mesh.generation import generate_two_cell_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters,
                                          GlialCotransporters,
                                          KirNaKPumpModel)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI


@pytest.fixture(scope="module")
def glia_run():
    cfg = parse_config({
        "problem_type": "KNP-EMI",
        "dt": 2.5e-5, "time_steps": 3,
        "physical_constants": {"T": 300, "F": 96485, "R": 8.314},
        "C_M": 0.02,
        "ics_tags": [2, 3], "ecs_tags": [1], "boundary_tags": [4],
        "membrane_tags": [2, 3], "glia_tags": [3],
        "mesh_conversion_factor": 1e-6,
        "initial_conditions": {
            "phi_m_n": -0.070, "phi_m_g": -0.085,
            "Na_i_n": 12, "Na_i_g": 15, "Na_e": 140,
            "K_i_n": 130, "K_i_g": 100, "K_e": 4,
            "Cl_i_n": 5, "Cl_i_g": 5, "Cl_e": 125,
            "n": 0.276, "m": 0.0379, "h": 0.688,
        },
        # without a stimulus block the reference defaults to a 40 S/m^2
        # synaptic drive (mixed_dim_problem.py:319-324) that depolarises the
        # neuron immediately — use a negligible one to test the resting state
        "stimulus": {"conductance": {"g_syn_bar": 1e-12}, "a_syn": 5e-4,
                     "T_stim": 1.0, "scale": False},
        "solver": {"direct": False,
                   "ksp_settings": {"ksp_rtol": 1e-9, "pc_mode": "amg"},
                   "output": {}},
    })
    mesh, tagger = generate_two_cell_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    models = [
        HodgkinHuxley(tags=cfg.neuron_tags),
        ATPPump(tags=cfg.neuron_tags),
        NeuronalCotransporters(tags=cfg.neuron_tags),
        GlialCotransporters(tags=cfg.glia_tags),
        KirNaKPumpModel(tags=cfg.glia_tags),
    ]
    problem.init_ionic_models(models)
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = solver.solve()
    return cfg, problem, solver, state


def test_glia_tags_and_restrictions(glia_run):
    cfg, problem, _, _ = glia_run
    topo = problem.topo
    assert cfg.glia_flag
    assert cfg.neuron_tags == (2,)
    # both membranes present, each facet tagged by its cell
    assert set(np.unique(topo.membrane_tags)) == {2, 3}
    assert np.all(
        problem.topo.mesh.cell_tags[topo.membrane_cell_intra]
        == topo.membrane_tags)


def test_glia_initial_and_evolution(glia_run):
    cfg, problem, solver, state = glia_run
    u = np.asarray(state.u)
    assert np.all(np.isfinite(u))
    phi_m = np.asarray(state.phi_m)
    topo = problem.topo
    neuron_mverts = np.unique(topo.membrane_verts[topo.membrane_tags == 2])
    glia_mverts = np.unique(topo.membrane_verts[topo.membrane_tags == 3])
    # neuron rests near -70 mV, glia near -85 mV
    assert np.all(np.abs(phi_m[neuron_mverts] + 0.070) < 0.005)
    assert np.all(np.abs(phi_m[glia_mverts] + 0.085) < 0.005)
    # per-compartment concentrations kept distinct
    a = problem.assembler
    K_i = u[problem.params.ion_index["K"]]
    assert abs(np.mean(K_i[neuron_mverts]) - 130) < 5
    assert abs(np.mean(K_i[glia_mverts]) - 100) < 5
    # solver stays well-conditioned with two membranes (5 iterations at
    # rest; strongly-stimulated transients may need ~20-25)
    assert max(solver.iterations) <= 10, solver.iterations
