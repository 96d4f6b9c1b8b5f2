"""End-to-end CLI, I/O, checkpoint/resume and point-evaluation tests."""
import os

import numpy as np
import pytest

from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry


def test_point_evaluator_linear_exact():
    from knp_emi_cgx_tpu.io.pointeval import PointEvaluator

    mesh, tagger = generate_square_geometry(8)
    f = 2.0 * mesh.points[:, 0] + 3.0 * mesh.points[:, 1] + 1.0
    pts = np.array([[0.33, 0.41], [0.5, 0.5], [0.99, 0.01]])
    pe = PointEvaluator(mesh, pts)
    vals = pe(f)
    expect = 2.0 * pts[:, 0] + 3.0 * pts[:, 1] + 1.0
    np.testing.assert_allclose(vals, expect, rtol=1e-12)


def test_xdmf_roundtrip(tmp_path):
    from knp_emi_cgx_tpu.io.xdmf import read_mesh_xdmf
    from knp_emi_cgx_tpu.io.xdmf_impl import write_mesh_xdmf
    from knp_emi_cgx_tpu.mesh.topology import build_topology

    mesh, tagger = generate_square_geometry(16)
    topo = build_topology(mesh, facet_tagger=tagger)
    mesh_file = str(tmp_path / "square16.xdmf")
    ft_file = str(tmp_path / "square16_facets.xdmf")
    write_mesh_xdmf(mesh_file, ft_file, mesh, topo.facets, topo.facet_tags)

    mesh2 = read_mesh_xdmf(mesh_file, ft_file)
    np.testing.assert_allclose(mesh2.points, mesh.points)
    np.testing.assert_array_equal(mesh2.cells, mesh.cells)
    np.testing.assert_array_equal(mesh2.cell_tags, mesh.cell_tags)
    topo2 = build_topology(mesh2, facet_tagger=mesh2._facet_tagger)
    np.testing.assert_array_equal(topo2.facet_tags, topo.facet_tags)
    assert len(topo2.membrane_facets) == len(topo.membrane_facets)


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_out")
    import yaml

    with open("configs/tests/golden_parity.yaml") as fh:
        raw = yaml.load(fh, Loader=yaml.FullLoader)
    raw["output_dir"] = str(out)
    raw["solver"]["output"] = {"save_xdmf": True, "save_pngs": True,
                               "save_cpoints": True, "save_dat": True,
                               "save_interval": 5}
    raw["point_evaluation"] = {
        "ics_points": [[0.5, 0.5]], "ecs_points": [[0.1, 0.1]],
        "gamma_points": [[0.25, 0.5]]}
    cfg_file = str(out / "config.yaml")
    with open(cfg_file, "w") as fh:
        yaml.dump(raw, fh)

    from knp_emi_cgx_tpu.main import main_yaml

    problem, solver, state = main_yaml(cfg_file)
    return out, problem, solver, state


def test_cli_golden_parity(cli_run):
    _, problem, _, state = cli_run
    norms = problem.l2_norms(state)
    assert abs(float(norms["phi_i"]) - 2.6337161145147203e-08) \
        / 2.6337161145147203e-08 < 5e-9


def test_cli_artifacts(cli_run):
    out, *_ = cli_run
    for name in ("solution.xdmf", "solution.h5", "v.png", "gating.png",
                 "timings.png", "phi_m.npy", "n.npy", "solve_time.npy",
                 "ics_point_values.npy", "gamma_point_values.npy",
                 "checkpoint_000005.npz", "checkpoint_000010.npz"):
        assert (out / name).exists(), name


def test_checkpoint_resume(cli_run):
    """Resuming from the midpoint checkpoint reproduces the 10-step state."""
    out, problem, solver, state10 = cli_run
    from knp_emi_cgx_tpu.io.checkpoint import load_state
    from knp_emi_cgx_tpu.problems.knpemi import KNPEMIState, SolverKNPEMI

    state5, meta = load_state(str(out / "checkpoint_000005.npz"),
                              KNPEMIState, mesh=problem.topo.mesh)
    assert meta["step"] == 5
    solver2 = SolverKNPEMI(problem, {"direct": True})
    solver2.time_steps = 5
    state_resumed = solver2.solve(state5)
    np.testing.assert_allclose(np.asarray(state_resumed.u),
                               np.asarray(state10.u), rtol=0, atol=1e-14)
    np.testing.assert_allclose(float(state_resumed.t), float(state10.t),
                               rtol=1e-12)


def test_checkpoint_wrong_mesh_rejected(cli_run):
    out, *_ = cli_run
    from knp_emi_cgx_tpu.io.checkpoint import load_state
    from knp_emi_cgx_tpu.problems.knpemi import KNPEMIState

    other_mesh, _ = generate_square_geometry(8)
    with pytest.raises(ValueError, match="different mesh"):
        load_state(str(out / "checkpoint_000005.npz"), KNPEMIState,
                   mesh=other_mesh)


def test_checkpoint_wrong_config_rejected(cli_run):
    """Resuming under a changed dt/model config must hard-fail."""
    out, problem, *_ = cli_run
    import copy

    from knp_emi_cgx_tpu.io.checkpoint import load_state
    from knp_emi_cgx_tpu.problems.knpemi import KNPEMIState

    # same config resumes fine
    state, meta = load_state(str(out / "checkpoint_000005.npz"), KNPEMIState,
                             config=problem.cfg)
    assert meta["step"] == 5

    other_cfg = copy.deepcopy(problem.cfg)
    other_cfg.raw["dt"] = 999.0
    with pytest.raises(ValueError, match="different config"):
        load_state(str(out / "checkpoint_000005.npz"), KNPEMIState,
                   config=other_cfg)


def test_ode_initializer_two_compartment():
    """The 0-D steady-state search moves towards a physiological resting
    state and stays finite (membrane_ODE_systems.py equivalent)."""
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.models.params import params_from_config
    from knp_emi_cgx_tpu.models.ode_init import two_compartment_steady_state

    cfg = load_config("configs/tests/golden_parity.yaml")
    params = params_from_config(cfg)
    vol_i, vol_e = 2.5e-13, 7.5e-13
    area = 2e-6
    sol, converged = two_compartment_steady_state(
        params, vol_i, vol_e, area, timestep=1e-3, max_time=0.2)
    phi_m = sol[0]
    assert np.all(np.isfinite(sol))
    assert -0.10 < phi_m < -0.05
    assert all(c > 0 for c in sol[1:7])
    assert all(0 < g < 1 for g in sol[7:])


def test_emi_cli_outputs(tmp_path):
    """EMI CLI writes XDMF snapshots, phi_m trace png and npy exports
    (reference EMI solver output paths, EMIx_solver.py:313-420)."""
    import yaml

    cfg = {
        "problem_type": "EMI",
        "mesh_file": "generate:square16",
        "dt": 2e-5, "time_steps": 4,
        "C_M": 0.02, "sigma_i": 1.0, "sigma_e": 1.0,
        "ics_tags": [1], "ecs_tags": [2], "boundary_tags": [3],
        "membrane_tags": [4],
        "dirichlet_bcs": False,
        "ionic_model": "HH",
        "initial_conditions": {"phi_m": -0.06774},
        "output_dir": str(tmp_path / "out"),
        "solver": {"direct": True,
                   "output": {"save_xdmf": True, "save_pngs": True,
                              "save_dat": True, "save_interval": 2}},
    }
    cfg_file = tmp_path / "emi.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))

    from knp_emi_cgx_tpu.main import main_yaml

    problem, solver, state = main_yaml(str(cfg_file))
    out = tmp_path / "out"
    assert (out / "solution.xdmf").exists()
    assert (out / "phi_m.png").exists()
    trace = np.load(out / "phi_m.npy")
    assert trace.shape[0] == 5            # initial + 4 steps
    assert np.all(np.isfinite(trace))
