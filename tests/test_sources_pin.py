"""pin_ecs_potential and ion-injection source terms (reference
KNPEMIx_problem.py:163-218, mixed_dim_problem.py:496-540)."""
import numpy as np
import pytest

from knp_emi_cgx_tpu.config import load_config, parse_config
from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI


def test_pin_ecs_potential():
    """Grounding phi_e at one vertex removes the nullspace; the membrane
    dynamics are unchanged and phi_e sits near zero."""
    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.time_steps = 3
    cfg.pin_ecs_potential = True
    mesh, tagger = generate_square_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    assert problem.assembler.has_bcs
    solver = SolverKNPEMI(problem, {"direct": True})
    solver.time_steps = 3
    state = solver.solve()
    u = np.asarray(state.u)
    a = problem.assembler
    # pinned vertex exactly zero
    pv = problem._pinned_vertex
    assert abs(u[a.PHI_E, pv]) < 1e-14
    phi_m = np.asarray(state.phi_m)[problem.topo.membrane_verts].ravel()
    assert np.all(np.abs(phi_m + 0.070) < 0.003)


def _injection_cfg(with_injection):
    d = {
        "problem_type": "KNP-EMI",
        "dt": 5e-5, "time_steps": 4,
        "physical_constants": {"T": 300, "F": 96485, "R": 8.314},
        "C_M": 0.02,
        # two-cell geometry: the mesh centre (injection site) lies in ECS
        "ics_tags": [2, 3], "ecs_tags": [1], "boundary_tags": [4],
        "membrane_tags": [2, 3],
        "mesh_conversion_factor": 1e-6,
        "initial_conditions": {"phi_m": -0.070, "Na_i": 12, "Na_e": 140,
                               "K_i": 130, "K_e": 4, "Cl_i": 5, "Cl_e": 125,
                               "n": 0.276, "m": 0.0379, "h": 0.688},
        "stimulus": {"conductance": {"g_syn_bar": 1e-12}, "a_syn": 5e-4,
                     "T_stim": 1.0, "scale": False},
        "solver": {"direct": True, "output": {}},
    }
    if with_injection:
        d["source_terms"] = "ion_injection"
    return parse_config(d)


def _run_injection(with_injection):
    from knp_emi_cgx_tpu.mesh.generation import generate_two_cell_geometry

    cfg = _injection_cfg(with_injection)
    mesh, tagger = generate_two_cell_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    state0 = problem.initial_state()
    c0 = problem.conservation(state0)
    solver = SolverKNPEMI(problem, cfg.solver_config)
    state = solver.solve(state0)
    c1 = problem.conservation(state)
    return problem, {k: float(c1[k]) - float(c0[k]) for k in c0}


def test_ion_injection_mass_rate():
    """K+/Cl- injected at 5 nA into a central ECS box: the injection-run vs
    baseline-run difference in total content grows at exactly I/F per unit
    time (setup_source_terms, KNPEMIx_problem.py:200-218; the membrane drift
    cancels in the difference)."""
    problem, gain_inj = _run_injection(True)
    _, gain_base = _run_injection(False)
    assert problem.injection_volume > 0
    T = 4 * 5e-5
    # The reference injects via a P1 interpolant whose hat functions spill
    # one cell ring beyond the box (KNPEMIx_problem.py:214-215), so the
    # delivered rate is src * integral(P1 indicator), not exactly I/F.
    # Assert exact discrete consistency against that integral.
    a = problem.assembler
    f = a.nvar + problem.params.ion_index["K"]
    src_vertex = np.asarray(a.src[f])
    s = a._sides[1]
    integral = float(np.einsum("cab,cb->", np.asarray(s["M_e"]),
                               src_vertex[np.asarray(s["Vt"])]))
    expected = integral * T
    assert expected > 0.5 * (5e-9 / 96485.0 * T)   # sane magnitude
    for name in ("K", "Cl"):
        net = gain_inj[name] - gain_base[name]
        np.testing.assert_allclose(net, expected, rtol=1e-4, err_msg=name)
    assert abs(gain_inj["Na"] - gain_base["Na"]) < 1e-3 * expected
