"""Many-cell tissue geometry + end-to-end tissue run (the reference's
dense-tissue envelope, configs/5m/100c.yaml analog)."""
import numpy as np
import pytest

from knp_emi_cgx_tpu.mesh.generation import generate_tissue_geometry
from knp_emi_cgx_tpu.mesh.topology import build_topology


def test_tissue_geometry_tags_and_membranes():
    n_cells = 8
    mesh, tagger = generate_tissue_geometry(16, n_cells, seed=1)
    tags = np.unique(mesh.cell_tags)
    assert np.array_equal(tags, np.arange(1, n_cells + 2))
    topo = build_topology(
        mesh, facet_tagger=tagger,
        intra_tags=tuple(range(2, n_cells + 2)), extra_tag=(1,),
        gamma_tags=tuple(range(2, n_cells + 2)), boundary_tags=(1001,))
    # every cell has a closed membrane: its facet tags appear, and each
    # membrane facet separates that cell from the ECS
    mtags = np.unique(topo.membrane_tags)
    assert np.array_equal(mtags, np.arange(2, n_cells + 2))
    ct = mesh.cell_tags
    assert np.all(ct[topo.membrane_cell_intra] >= 2)
    assert np.all(ct[topo.membrane_cell_extra] == 1)
    assert np.array_equal(ct[topo.membrane_cell_intra], topo.membrane_tags)
    # ECS percolates: extracellular cells form one connected component
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    interior = ~topo.exterior_facet_mask
    c0, c1 = topo.facet_cells[interior, 0], topo.facet_cells[interior, 1]
    both_ecs = (ct[c0] == 1) & (ct[c1] == 1)
    nc = mesh.num_cells
    G = sp.coo_matrix((np.ones(both_ecs.sum()),
                       (c0[both_ecs], c1[both_ecs])), shape=(nc, nc))
    ncomp, labels = csgraph.connected_components(G + G.T, directed=False)
    ecs_labels = np.unique(labels[ct == 1])
    assert len(ecs_labels) == 1


def test_tissue_cells_do_not_touch():
    n_cells = 8
    mesh, tagger = generate_tissue_geometry(16, n_cells, seed=3)
    topo = build_topology(
        mesh, facet_tagger=tagger,
        intra_tags=tuple(range(2, n_cells + 2)), extra_tag=(1,),
        gamma_tags=tuple(range(2, n_cells + 2)), boundary_tags=(1001,))
    ct = mesh.cell_tags
    interior = ~topo.exterior_facet_mask
    c0, c1 = topo.facet_cells[interior, 0], topo.facet_cells[interior, 1]
    t0, t1 = ct[c0], ct[c1]
    # no facet separates two DIFFERENT biological cells
    assert not np.any((t0 >= 2) & (t1 >= 2) & (t0 != t1))


def test_tissue_capacity_error():
    with pytest.raises(ValueError, match="fits only"):
        generate_tissue_geometry(8, 1000)


@pytest.fixture(scope="module")
def tissue_run():
    from knp_emi_cgx_tpu.main import main_yaml

    return main_yaml("configs/tissue/test_8c.yaml")


def test_tissue_end_to_end(tissue_run):
    problem, solver, state = tissue_run
    u = np.asarray(state.u)
    assert np.all(np.isfinite(u))
    assert solver.iterations and max(solver.iterations) < 60
    # glia got distinct initial conditions from neurons
    assert problem.cfg.glia_flag
    assert len(problem.glia_dofs) > 0


def test_tissue_conservation(tissue_run):
    """Total ion drift stays at the semi-implicit scheme's O(dt * I_ch)
    level — print_conservation-as-assert (KNPEMIx_problem.py:807-843; the
    alpha_i/alpha_e splitting makes the scheme conservative only up to the
    capacitive-current split, like the reference)."""
    problem, solver, state = tissue_run
    state0 = problem.initial_state()
    for ion in problem.params.ion_list:
        tot0 = float(problem.conservation(state0)[ion["name"]])
        tot = float(problem.conservation(state)[ion["name"]])
        assert abs(tot - tot0) / abs(tot0) < 2e-4, ion["name"]


@pytest.mark.slow
def test_tissue_1000_cells_smoke():
    """Reference-envelope cell count (configs/30m/1000c.yaml): 1000 seeded
    cells, full setup + 1 implicit step on the smallest mesh that fits the
    lattice (20^3).  Guards the vectorized owner-grid tagging and the
    !range-tagged 30m_1000c.yaml config plumbing at the 1000-cell count."""
    import time

    from knp_emi_cgx_tpu.main import main_yaml

    tic = time.perf_counter()
    problem, solver, state = main_yaml(
        "configs/tissue/30m_1000c.yaml",
        overrides={
            "mesh_file": "generate:tissue20x1000c",
            "cell_tag_file": "generate:tissue20x1000c",
            "facet_tag_file": "generate:tissue20x1000c",
            "time_steps": 1,
            "solver_config": {
                "direct": False,
                "ksp_settings": {"ksp_rtol": 1e-9, "pc_mode": "amg",
                                 "precision": "df32"},
                "output": {"save_xdmf": False, "save_pngs": False,
                           "save_cpoints": False, "save_dat": False},
            },
        })
    wall = time.perf_counter() - tic
    assert len(problem.cfg.intra_tags) == 1000
    u = np.asarray(state.u)
    assert np.all(np.isfinite(u))
    assert solver.iterations and solver.iterations[-1] < 100
    print(f"[1000c smoke] total wall {wall:.1f} s, "
          f"n_dofs={problem.assembler.n_dofs}")
