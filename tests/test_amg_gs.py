"""pc_mode "amg_gs" (phi-first block Gauss-Seidel) regression coverage.

The triangular sweep z = M_phi(r|phi); z += M_ion(r - A z) was measured at
11.25 warm its vs 22.25 for the block-diagonal floor offline
(scripts/pc_lab.py, output/pc_lab_tri*.json), but the production form
drops the ion-to-ion lower-triangle coupling the lab's exact LU kept —
this test pins the production composition on the real solve paths
(ADVICE r4): plain-f32 (BlockDiagonalPreconditioner.apply_part), fused
df32 (LatticeBlockPreconditioner.apply_df_part on the square lattice),
and split-step df32.  Gates: same converged solution as pc_mode amg_phi
(same blocks, diagonal composition) and no more total Krylov iterations.

Reference anchor: the preconditioner-robustness role of the BoomerAMG
block preconditioner, tests/KNPEMI/electric_potential_norms_iterative_solver.py.
"""
import numpy as np
import pytest

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import generate_square_geometry
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

N_STEPS = 4


def _run(pc_mode, precision, rtol, split=False):
    cfg = load_config("configs/tests/golden_parity.yaml")
    cfg.time_steps = N_STEPS
    mesh, tagger = generate_square_geometry(16)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    ksp = {"ksp_rtol": rtol, "pc_mode": pc_mode, "precision": precision,
           "warm_start": "previous"}
    if split:
        ksp.update(split_step=True, launch_outer=2)
    solver = SolverKNPEMI(problem, {"direct": False, "ksp_settings": ksp})
    solver.time_steps = N_STEPS
    state = solver.solve(problem.initial_state())
    return solver, state


def _check(pc_ref, precision, rtol, atol_rel, split=False):
    s_ref, st_ref = _run(pc_ref, precision, rtol, split)
    s_gs, st_gs = _run("amg_gs", precision, rtol, split)
    ref = np.asarray(st_ref.u, np.float64)
    new = np.asarray(st_gs.u, np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(new, ref, rtol=0, atol=atol_rel * scale)
    # the triangular form must not work harder than the diagonal form it
    # refines (pc_lab floor: 11.25 vs 22.25 warm its on tissue; on this
    # tiny square the margin is smaller but the direction must hold)
    assert sum(s_gs.iterations) <= sum(s_ref.iterations), (
        s_gs.iterations, s_ref.iterations)
    return s_gs, s_ref


def test_amg_gs_plain_f32_matches_amg_phi():
    # plain-f32 Krylov path: BlockDiagonalPreconditioner.apply_part halves
    # composed with the step's CSR matvec (knpemi.py M_plain)
    _check("amg_phi", "f32", 1e-5, atol_rel=3e-5)


@pytest.mark.slow   # 177 s: two df32 rtol-1e-9 solves; plain-f32 test covers the halves fast
def test_amg_gs_df32_lattice_matches_amg_phi():
    # fused df32 path on the square LATTICE: stencil matvec engaged, so
    # the halves are LatticeBlockPreconditioner.apply_df_part — the
    # production masked-half-apply form (solver._pc_lattice asserted)
    s_gs, _ = _check("amg_phi", "df32", 1e-9, atol_rel=1e-6)
    assert s_gs._pc_lattice, "square mesh must engage the lattice pc"


@pytest.mark.slow   # two more df32 solve compiles; fused-vs-split parity
def test_amg_gs_split_step_df32_matches_fused():
    # split-step df32 (three-program) amg_gs == fused amg_gs solutions
    s_f, st_f = _run("amg_gs", "df32", 1e-9, split=False)
    s_s, st_s = _run("amg_gs", "df32", 1e-9, split=True)
    ref = np.asarray(st_f.u, np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(st_s.u, np.float64), ref,
                               rtol=0, atol=1e-6 * scale)
    # chunked launches re-enter converged chunks (one residual check,
    # counted 0 extra its) — totals must agree
    assert sum(s_s.iterations) == sum(s_f.iterations), (
        s_s.iterations, s_f.iterations)
