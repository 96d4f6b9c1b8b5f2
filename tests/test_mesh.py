"""Mesh generation and topology tests (tags replicate CGx utils/misc.py)."""
import numpy as np

from knp_emi_cgx_tpu.mesh.generation import (
    generate_square_geometry, generate_cube_geometry, unit_square_mesh)
from knp_emi_cgx_tpu.mesh.topology import build_topology
from knp_emi_cgx_tpu.fem.p1 import cell_geometry, facet_geometry


def test_unit_square_counts():
    for diag in ("right", "left"):
        mesh = unit_square_mesh(8, 8, diagonal=diag)
        assert mesh.num_points == 81
        assert mesh.num_cells == 128
        _, vols = cell_geometry(mesh.points, mesh.cells)
        np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-14)


def test_square_geometry_tags():
    mesh, tagger = generate_square_geometry(32)
    topo = build_topology(mesh, facet_tagger=tagger)
    # inner box area = 0.25, outer = 0.75
    _, vols = cell_geometry(mesh.points, mesh.cells)
    inner = vols[mesh.cell_tags == 1].sum()
    outer = vols[mesh.cell_tags == 2].sum()
    np.testing.assert_allclose(inner, 0.25, rtol=1e-13)
    np.testing.assert_allclose(outer, 0.75, rtol=1e-13)
    # membrane length = perimeter of [0.25,0.75]^2 = 2.0
    L = facet_geometry(mesh.points, topo.membrane_verts).sum()
    np.testing.assert_allclose(L, 2.0, rtol=1e-13)
    # membrane orientation: intra cell tagged 1, extra cell tagged 2
    assert np.all(mesh.cell_tags[topo.membrane_cell_intra] == 1)
    assert np.all(mesh.cell_tags[topo.membrane_cell_extra] == 2)
    # boundary facets on the outer square boundary: 4*32 facets
    assert (topo.facet_tags == 3).sum() == 128
    # restrictions: intra closure has 17^2 vertices for N=32
    assert len(topo.intra_dofs) == 17 ** 2
    assert len(topo.extra_dofs) == mesh.num_points - 15 ** 2


def test_cube_geometry_tags():
    mesh, tagger = generate_cube_geometry(8)
    topo = build_topology(mesh, facet_tagger=tagger)
    _, vols = cell_geometry(mesh.points, mesh.cells)
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-13)
    np.testing.assert_allclose(vols[mesh.cell_tags == 1].sum(), 0.125, rtol=1e-13)
    # membrane area = 6 * 0.5^2 = 1.5
    A = facet_geometry(mesh.points, topo.membrane_verts).sum()
    np.testing.assert_allclose(A, 1.5, rtol=1e-13)
    assert np.all(mesh.cell_tags[topo.membrane_cell_intra] == 1)
    assert np.all(mesh.cell_tags[topo.membrane_cell_extra] == 2)
