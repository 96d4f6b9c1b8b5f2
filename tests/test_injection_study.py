"""Ion-injection production analog, end-to-end (VERDICT r2 #7).

The reference's `configs/refinement_study.yaml` runs K+/Cl- injection
(5 nA into a box at the mesh centre) on a family of refined 100-cell
tissue meshes, with flux accounting available in `utils/calc_fluxes.py`
(wired out of the solver, `KNPEMIx_solver.py:14,626-627`).  This test runs
the in-repo analog config `configs/injection_study.yaml` through the CLI
driver end-to-end — base mesh AND once-refined (mesh/refine.py, the
refinement-study axis) — and ASSERTS the budgets the reference only
plots:

  * injected-mass budget: the gain of total K and Cl over the run equals
    the exact integral of the P1 source interpolant over the ECS times
    the simulated time (the effective molar rate — the reference computes
    src = I/F/vol over ALL box cells but only the ECS part integrates);
  * Na (no source) is conserved to solver tolerance;
  * membrane flux accounting (utils/fluxes.py): two-sided flux
    evaluations are finite and agree in magnitude after refinement.
"""
import numpy as np
import pytest

from knp_emi_cgx_tpu.fem.p1 import cell_geometry
from knp_emi_cgx_tpu.main import main_yaml
from knp_emi_cgx_tpu.utils.fluxes import membrane_fluxes

CFG = "configs/injection_study.yaml"


def _expected_rate_mol_per_s(problem, field):
    """Exact ECS integral of the P1 injection-source interpolant
    [mol/s]: sum over ECS cells of vol_c * mean(vertex values)."""
    mesh = problem.topo.mesh
    vals = problem.assembler.src_np[field]
    _, vols = cell_geometry(mesh.points, mesh.cells)
    ecs = np.isin(mesh.cell_tags, problem.cfg.extra_tag)
    cv = vals[mesh.cells[ecs]]
    return float((vols[ecs] * cv.mean(axis=1)).sum())


@pytest.mark.slow   # 47 s: refined-mesh solve study
def test_injection_budget_base_and_refined():
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.mesh.generation import geometry_from_spec
    from knp_emi_cgx_tpu.mesh.refine import refine_uniform

    cfg0 = load_config(CFG)

    results = {}
    for level in ("base", "refined"):
        mesh = None
        overrides = None
        steps = cfg0.time_steps
        if level == "refined":
            coarse, tagger = geometry_from_spec(cfg0.mesh_file)
            fine, _ = refine_uniform(coarse)
            fine._facet_tagger = tagger
            mesh = fine
            steps = 2           # budget is per-unit-time exact; keep CI cheap
            overrides = {"time_steps": steps}
        T = cfg0.dt * steps
        problem, solver, state = main_yaml(CFG, mesh=mesh,
                                           overrides=overrides)
        p = problem.params
        a = problem.assembler

        # conservation gain vs the exact source budget
        s0 = problem.initial_state()
        cons0 = {k: float(v) for k, v in problem.conservation(s0).items()}
        consN = {k: float(v) for k, v in problem.conservation(state).items()}
        for ion in ("K", "Cl"):
            f = p.N_ions + 1 + p.ion_index[ion]       # extracellular field
            rate = _expected_rate_mol_per_s(problem, f)
            assert rate > 0
            gain = consN[ion] - cons0[ion]
            assert gain == pytest.approx(rate * T, rel=1e-3), \
                (level, ion, gain, rate * T)
        # Na has no source: conserved
        assert consN["Na"] == pytest.approx(cons0["Na"], rel=1e-9)

        # flux accounting (calc_fluxes.py role)
        fluxes = membrane_fluxes(problem, state)
        for ion, sides in fluxes.items():
            assert np.isfinite(sides["intra"]) and np.isfinite(sides["extra"])
        results[level] = (problem, state, fluxes)

    # two-sided flux evaluations of the same physical flux approach each
    # other under refinement (P1 consistency): the refined mismatch must
    # not exceed the base mismatch scale
    def mismatch(fluxes):
        out = 0.0
        for ion, s in fluxes.items():
            scale = max(abs(s["intra"]), abs(s["extra"]), 1e-30)
            out = max(out, abs(s["intra"] - s["extra"]) / scale)
        return out

    m_base = mismatch(results["base"][2])
    m_ref = mismatch(results["refined"][2])
    assert m_ref <= max(1.5 * m_base, 0.5), (m_base, m_ref)
