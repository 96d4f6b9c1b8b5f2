"""Lattice-stencil operator (ops/stencil.py): the structured-mesh SpMV that
replaces per-element gathers with constant-offset slices.

Checks, on the 2D golden square and a small 3D tissue mesh:
  * the diagonal stack reproduces the assembled CSR matrix exactly
  * the df32 stencil matvec matches the ELL matvec to roundoff
  * the nullspace-repaired operator matches repaired_ell_values
  * an end-to-end iterative solve through `matvec: stencil` matches the
    `matvec: ell` solve to solver tolerance (same physics, same gates)
"""
import numpy as np
import jax.numpy as jnp
import pytest

from knp_emi_cgx_tpu.config import load_config
from knp_emi_cgx_tpu.mesh.generation import (generate_square_geometry,
                                             generate_tissue_geometry)
from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                          NeuronalCotransporters)
from knp_emi_cgx_tpu.ops.stencil import StencilMatrix
from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI
from knp_emi_cgx_tpu.solvers.df32 import (EllMatrix, df_from_f64,
                                          repaired_ell_values)


def _square_problem(n=16):
    cfg = load_config("configs/tests/golden_parity.yaml")
    mesh, tagger = generate_square_geometry(n)
    mesh._facet_tagger = tagger
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(
        [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
    return cfg, problem


def _assembled(problem):
    a = problem.assembler
    st0 = problem.initial_state()
    gates = {"n": st0.n, "m": st0.m, "h": st0.h}
    vals, b = a.assemble(st0.u, st0.phi_m, gates, problem.params.dt)
    return a, np.asarray(vals, np.float64), np.asarray(b, np.float64)


def test_diag_stack_reproduces_csr():
    _, problem = _square_problem()
    a, vals, _ = _assembled(problem)
    st = StencilMatrix(a)
    dg = np.asarray(st.diag_values(jnp.asarray(vals, jnp.float32)))
    # scatter the diagonal stack back into a dense lattice matrix and
    # compare against the CSR entries
    import scipy.sparse as sp
    rows = a.csr_rows_np
    A = sp.csr_matrix((vals.astype(np.float32), a.csr_cols_np, a.indptr_np),
                      shape=(a.n_dofs, a.n_dofs))
    lat = st.lat_of_dof_np
    n_pts = st.n_pts
    # for every nnz, the diag slot must hold exactly the CSR value
    got = dg.reshape(-1)[st.diag_slot_np]
    np.testing.assert_array_equal(got, vals.astype(np.float32))
    # and the total number of nonzeros must match (no duplicates/leaks)
    assert np.count_nonzero(dg) <= len(vals)
    assert rows.shape[0] == len(vals)
    assert A.nnz == len(vals)


def test_stencil_matvec_matches_ell():
    _, problem = _square_problem()
    a, vals, _ = _assembled(problem)
    st = StencilMatrix(a)
    ell = EllMatrix(a.indptr_np, a.csr_cols_np)

    rng = np.random.default_rng(0)
    x64 = rng.standard_normal(a.n_dofs)
    xh = jnp.asarray(x64, jnp.float32)
    xl = jnp.asarray(x64 - np.asarray(xh, np.float64), jnp.float32)

    vals32 = jnp.asarray(vals, jnp.float32)
    yh_e, yl_e = ell.matvec_df(ell.ell_values(vals32), xh, xl)
    y_ell = np.asarray(yh_e, np.float64) + np.asarray(yl_e, np.float64)

    lat_h = st.inject(xh)
    lat_l = st.inject(xl)
    dgh = st.diag_values(vals32)
    yh_s, yl_s = st.matvec_df(dgh, lat_h, lat_l)
    y_st = (np.asarray(yh_s, np.float64)
            + np.asarray(yl_s, np.float64))[st.lat_of_dof_np]

    scale = np.abs(y_ell).max()
    np.testing.assert_allclose(y_st, y_ell, rtol=0, atol=1e-12 * scale)
    # inactive lattice slots stay exactly zero
    mask = np.ones(st.n_lat, dtype=bool)
    mask[st.lat_of_dof_np] = False
    assert np.all(np.asarray(yh_s)[mask] == 0.0)
    assert np.all(np.asarray(yl_s)[mask] == 0.0)


def test_repaired_stencil_matches_repaired_ell():
    _, problem = _square_problem()
    a, vals, _ = _assembled(problem)
    st = StencilMatrix(a)
    ell = EllMatrix(a.indptr_np, a.csr_cols_np)
    vals32 = jnp.asarray(vals, jnp.float32)

    rng = np.random.default_rng(1)
    x64 = rng.standard_normal(a.n_dofs)
    xh = jnp.asarray(x64, jnp.float32)
    xl = jnp.asarray(x64 - np.asarray(xh, np.float64), jnp.float32)

    eh, el = repaired_ell_values(ell, vals32, a.phi_col_mask,
                                 a.phi_repair_slots)
    yh_e, yl_e = ell.matvec_df2(eh, el, xh, xl)
    y_ell = np.asarray(yh_e, np.float64) + np.asarray(yl_e, np.float64)

    dgh, lo = st.repaired_diag_values(vals32)
    yh_s, yl_s = st.matvec_df(dgh, st.inject(xh), st.inject(xl), lo)
    y_st = (np.asarray(yh_s, np.float64)
            + np.asarray(yl_s, np.float64))[st.lat_of_dof_np]

    scale = np.abs(y_ell).max()
    np.testing.assert_allclose(y_st, y_ell, rtol=0, atol=1e-11 * scale)

    # the repaired operator must annihilate the joint-constant mode to df
    # accuracy: rows sum to ~0 over phi columns
    ns = (a.nullspace_np != 0).astype(np.float64)
    nsh = jnp.asarray(st.inject(jnp.asarray(ns, jnp.float32)))
    zh, zl = st.matvec_df(dgh, nsh, jnp.zeros_like(nsh), lo)
    z = (np.asarray(zh, np.float64) + np.asarray(zl, np.float64))
    assert np.abs(z).max() < 1e-10 * np.abs(vals).max()


def test_tissue_mesh_is_stencil_structured():
    cfg = load_config("configs/tissue/5m_100c.yaml")
    n_cells = 4
    cfg.intra_tags = tuple(range(2, n_cells + 2))
    cfg.gamma_tags = cfg.intra_tags
    cfg.glia_tags = (n_cells + 1,)
    cfg.neuron_tags = tuple(t for t in cfg.intra_tags
                            if t not in cfg.glia_tags)
    cfg.stimulus_tags = (2,)
    cfg.membrane_data_tag = 2
    mesh, tagger = generate_tissue_geometry(10, n_cells)
    mesh._facet_tagger = tagger
    from knp_emi_cgx_tpu.main import build_models
    problem = ProblemKNPEMI(cfg, mesh=mesh)
    problem.init_ionic_models(build_models(problem))
    st = StencilMatrix(problem.assembler)
    # structured 3D tissue: the diagonal count is mesh-size independent
    assert st.n_diags < 600, st.n_diags


def _solve(warm, matvec, steps=3):
    cfg, problem = _square_problem()
    solver = SolverKNPEMI(problem, {
        "direct": False,
        "ksp_settings": {"ksp_rtol": 1e-9, "pc_mode": "amg",
                         "precision": "df32", "warm_start": warm,
                         "matvec": matvec}})
    solver.time_steps = steps
    state = solver.solve(problem.initial_state())
    return solver, state


@pytest.mark.slow   # 135 s on the 1-core host; fast-lane coverage of the
# stencil operator lives in test_stencil_matvec_matches_ell (4 s)
@pytest.mark.parametrize("split", [False])
def test_end_to_end_stencil_matches_ell(split):
    s_ell, st_ell = _solve("previous", "ell")
    s_st, st_st = _solve("previous", "stencil")
    ref = np.asarray(st_ell.u, np.float64)
    new = np.asarray(st_st.u, np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(new, ref, rtol=0, atol=1e-6 * scale)
    # solver quality must not regress through the lattice formulation
    assert sum(s_st.iterations) <= sum(s_ell.iterations) + 2, (
        s_st.iterations, s_ell.iterations)


@pytest.mark.slow   # 182 s on the 1-core host; the fast lane covers
# split==fused on the square lattice via tests/test_amg_gs.py
def test_split_step_stencil_matches_fused():
    cfg, problem = _square_problem()
    ksp = {"ksp_rtol": 1e-9, "pc_mode": "amg", "precision": "df32",
           "warm_start": "previous", "matvec": "stencil",
           "split_step": True, "launch_outer": 2}
    solver = SolverKNPEMI(problem, {"direct": False, "ksp_settings": ksp})
    solver.time_steps = 3
    st_split = solver.solve(problem.initial_state())
    s_f, st_fused = _solve("previous", "stencil")
    ref = np.asarray(st_fused.u, np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(st_split.u, np.float64), ref,
                               rtol=0, atol=1e-7 * scale)
