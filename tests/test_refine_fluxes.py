"""Mesh refinement with tag transfer + membrane flux diagnostics."""
import numpy as np

from knp_emi_cgx_tpu.fem.p1 import cell_geometry, facet_geometry
from knp_emi_cgx_tpu.mesh.generation import (generate_square_geometry,
                                             generate_cube_geometry)
from knp_emi_cgx_tpu.mesh.refine import refine_uniform, transfer_facet_tags
from knp_emi_cgx_tpu.mesh.topology import build_topology


def test_refine_square_preserves_geometry_and_tags():
    mesh, tagger = generate_square_geometry(8)
    fine, parent = refine_uniform(mesh)
    assert fine.num_cells == 4 * mesh.num_cells
    _, vols = cell_geometry(fine.points, fine.cells)
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-13)
    # tags inherited: inner box area preserved exactly
    inner = vols[fine.cell_tags == 1].sum()
    np.testing.assert_allclose(inner, 0.25, rtol=1e-13)
    # geometric tagger re-applies on the fine mesh
    topo = build_topology(fine, facet_tagger=tagger)
    L = facet_geometry(fine.points, topo.membrane_verts).sum()
    np.testing.assert_allclose(L, 2.0, rtol=1e-13)


def test_refine_cube_volume_and_shape():
    mesh, tagger = generate_cube_geometry(4)
    fine, _ = refine_uniform(mesh)
    assert fine.num_cells == 8 * mesh.num_cells
    _, vols = cell_geometry(fine.points, fine.cells)
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-12)
    assert vols.min() > 0
    topo = build_topology(fine, facet_tagger=tagger)
    A = facet_geometry(fine.points, topo.membrane_verts).sum()
    np.testing.assert_allclose(A, 1.5, rtol=1e-12)


def test_facet_tag_transfer():
    mesh, tagger = generate_square_geometry(8)
    topo = build_topology(mesh, facet_tagger=tagger)
    fine, _ = refine_uniform(mesh)
    ftopo = build_topology(fine, facet_tagger=tagger)
    transferred = transfer_facet_tags(mesh, topo.facets, topo.facet_tags,
                                      fine, ftopo.facets, default=5)
    # transfer must agree with geometric re-tagging on membrane + boundary
    geo = ftopo.facet_tags
    for tag in (3, 4):
        np.testing.assert_array_equal(transferred == tag, geo == tag,
                                      err_msg=f"tag {tag}")


def test_membrane_flux_exact_on_linear_field():
    """A linear concentration field has a constant exact flux; the P1 flux
    diagnostic must reproduce it to machine precision on a single membrane
    plane (calc_fluxes.py equivalent, validated analytically)."""
    import jax.numpy as jnp

    from knp_emi_cgx_tpu.config import parse_config
    from knp_emi_cgx_tpu.models.ionic import PassiveModel
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI
    from knp_emi_cgx_tpu.utils.fluxes import membrane_fluxes

    cfg = parse_config({
        "problem_type": "KNP-EMI",
        "dt": 1e-5, "time_steps": 1,
        "physical_constants": {"T": 1.0, "F": 1.0, "R": 1.0},
        "C_M": 1.0,
        "ics_tags": [1], "ecs_tags": [2], "boundary_tags": [8],
        "membrane_tags": [1, 2, 3, 4],
        "MMS_test": {"N_mesh": 16, "dim": 2},  # per-plane membrane tags
        "solver": {"direct": True, "output": {}},
    })
    problem = ProblemKNPEMI(cfg)
    problem.init_ionic_models([PassiveModel()])
    state = problem.initial_state()
    # overwrite fields: Na linear in x (slope g), potentials constant
    pts = problem.topo.mesh.points
    g = 0.7
    u = np.asarray(state.u).copy()
    u[0] = 2.0 + g * pts[:, 0]                 # Na_i
    u[problem.assembler.nvar] = 2.0 + g * pts[:, 0]   # Na_e
    u[problem.assembler.PHI_I] = 0.0
    u[problem.assembler.PHI_E] = 0.0
    state = state._replace(u=jnp.asarray(u))
    fluxes = membrane_fluxes(problem, state, tag=2)  # right plane x=0.75
    # J = -D dNa/dx = -g (D=1); outward normal +x; plane length 0.5
    expected = -g * 0.5
    np.testing.assert_allclose(fluxes["Na"]["intra"], expected, rtol=1e-12)
    np.testing.assert_allclose(fluxes["Na"]["extra"], expected, rtol=1e-12)
    # left plane (tag 1): outward normal -x => +g*0.5
    fluxes_l = membrane_fluxes(problem, state, tag=1)
    np.testing.assert_allclose(fluxes_l["Na"]["intra"], g * 0.5, rtol=1e-12)
