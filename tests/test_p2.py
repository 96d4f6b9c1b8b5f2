"""P2 Lagrange element tests: reference tables (exactness, Kronecker
property, closed-form vs direct-quadrature element tensors) and the global
node space over tagged meshes.

The reference parses `fem_order` but every config uses 1
(`mixed_dim_problem.py:207-208`); this suite covers the order-2 path our
framework actually implements.
"""
import math

import numpy as np
import pytest

from knp_emi_cgx_tpu.fem import p2
from knp_emi_cgx_tpu.fem.p1 import cell_geometry, cell_quadrature
from knp_emi_cgx_tpu.mesh.generation import (generate_cube_geometry,
                                             generate_square_geometry)
from knp_emi_cgx_tpu.mesh.topology import build_topology


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_reference_tables(dim):
    nn = p2.n_cell_nodes(dim)
    M2, E, Q = p2.reference_tensors(dim)
    lam, w = cell_quadrature(dim, degree=6)

    # partition of unity + Kronecker-delta nodal property
    N = p2.shape_values(lam)
    assert np.allclose(N.sum(axis=1), 1.0)
    verts = np.eye(dim + 1)
    mids = np.array([(verts[i] + verts[j]) / 2.0
                     for i, j in p2.local_edges(dim)])
    assert np.allclose(p2.shape_values(np.vstack([verts, mids])),
                       np.eye(nn), atol=1e-14)

    # closed-form contraction == direct quadrature with physical gradients
    # on the reference simplex (v0 = 0, vi = e_i)
    B = p2.gradient_coeffs(lam)
    g = np.vstack([-np.ones(dim), np.eye(dim)])        # grad lambda_p
    vol = 1.0 / math.factorial(dim)
    S = vol * (g @ g.T)
    gradN = np.einsum("qap,pd->qad", B, g)
    K_direct = vol * np.einsum("q,qad,qbd->ab", w, gradN, gradN)
    assert np.allclose(np.einsum("pr,apbr->ab", S, E), K_direct, atol=1e-13)
    W_direct = vol * np.einsum("q,qm,qad,qbd->mab", w, N, gradN, gradN)
    assert np.allclose(np.einsum("pr,mapbr->mab", S, Q), W_direct, atol=1e-13)

    # exact P2 basis integrals (vertex/edge values are classical)
    rs = M2.sum(axis=1)
    if dim == 2:
        assert np.allclose(rs, [0, 0, 0] + [1 / 3] * 3)
    else:
        assert np.allclose(rs, [-1 / 20] * 4 + [1 / 5] * 6)


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_stiffness_annihilates_linears_on_random_cells(dim):
    """K_e (closed form via the P1 metric) must reproduce grad-grad exactly:
    K_e @ (linear at nodes) == K_e^{P1-equivalent} action; in particular
    constants are annihilated and the energy of a linear field matches P1."""
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((dim + 1, dim)) * 0.7 + np.eye(dim + 1, dim)
    cells = np.arange(dim + 1)[None, :]
    grads, vols = cell_geometry(pts, cells)
    S = vols[0] * (grads[0] @ grads[0].T)
    _, E, _ = p2.reference_tensors(dim)
    K = np.einsum("pr,apbr->ab", S, E)
    # nodes: vertices then edge midpoints
    nodes = np.vstack([pts] + [[(pts[i] + pts[j]) / 2.0]
                               for i, j in p2.local_edges(dim)])
    assert np.allclose(K.sum(axis=1), 0.0, atol=1e-13)     # constants
    a = rng.standard_normal(dim)
    lin = nodes @ a
    # energy of a linear field: vol * |a|^2 under both P1 and P2
    assert np.isclose(lin @ K @ lin, vols[0] * (a @ a), atol=1e-12)
    # quadratic field u = x_0^2: energy = int (2 x_0)^2
    quad = nodes[:, 0] ** 2
    lamq, wq = cell_quadrature(dim, degree=4)
    x_q = lamq @ pts                                       # [nq, dim]
    exact = vols[0] * np.einsum("q,q->", wq, (2.0 * x_q[:, 0]) ** 2)
    assert np.isclose(quad @ K @ quad, exact, rtol=1e-12)


@pytest.mark.parametrize("make", ["square", "cube"])
def test_p2_node_space(make):
    if make == "square":
        mesh, tagger = generate_square_geometry(8)
        n_ref, dim = 8, 2
    else:
        mesh, tagger = generate_cube_geometry(4)
        n_ref, dim = 4, 3
    topo = build_topology(mesh, facet_tagger=tagger,
                          intra_tags=(1,), extra_tag=(2,),
                          gamma_tags=(4,), boundary_tags=(3,))
    ns = p2.build_node_space(topo, boundary_tags=(3,))

    # Euler-consistent edge count on the structured grid
    assert ns.n_nodes == ns.n_vertices + len(ns.edges)
    assert ns.cell_nodes.shape == (mesh.cells.shape[0], p2.n_cell_nodes(dim))
    # every midpoint really is the midpoint of its edge
    mids = ns.node_points[ns.n_vertices:]
    assert np.allclose(mids, mesh.points[ns.edges].mean(axis=1))
    # membrane facet nodes: vertex prefix matches the topology table
    assert np.array_equal(ns.membrane_facet_nodes[:, :dim],
                          topo.membrane_verts)
    # all membrane nodes are in both restrictions
    mset = np.unique(ns.membrane_facet_nodes.ravel())
    assert np.isin(mset, ns.intra_nodes).all()
    assert np.isin(mset, ns.extra_nodes).all()
    # boundary nodes lie on the outer box boundary
    bp = ns.node_points[ns.boundary_nodes]
    on_box = np.isclose(bp, 0.0).any(axis=1) | np.isclose(bp, 1.0).any(axis=1)
    assert on_box.all()
    # boundary nodes include edge midpoints (count > vertex count)
    assert len(ns.boundary_nodes) > len(np.unique(topo.boundary_dofs))
    # restrictions partition-with-overlap: union covers all nodes
    assert len(np.union1d(ns.intra_nodes, ns.extra_nodes)) == ns.n_nodes


def test_p2_physical_stack_end_to_end():
    """fem_order=2 through the FULL physical pipeline — HH gating (Rush-
    Larsen at every P2 node), ATP pump, cotransporters, stimulus masks,
    deflated-direct solve — on the golden-parity square.  The P1 and P2
    discretisations of the same smooth problem must agree on the phi L2
    norms to discretisation accuracy, and P2 must conserve ions exactly
    like P1 (the semi-implicit scheme's structure is order-independent)."""
    from knp_emi_cgx_tpu.config import load_config
    from knp_emi_cgx_tpu.models.ionic import (HodgkinHuxley, ATPPump,
                                              NeuronalCotransporters)
    from knp_emi_cgx_tpu.problems.knpemi import ProblemKNPEMI, SolverKNPEMI

    norms, problems, states = {}, {}, {}
    for order in (1, 2):
        cfg = load_config("configs/tests/golden_parity.yaml")
        cfg.fem_order = order
        cfg.time_steps = 5
        mesh, tagger = generate_square_geometry(16)
        mesh._facet_tagger = tagger
        problem = ProblemKNPEMI(cfg, mesh=mesh)
        problem.init_ionic_models(
            [NeuronalCotransporters(), HodgkinHuxley(), ATPPump()])
        solver = SolverKNPEMI(problem, cfg.solver_config)
        state = solver.solve()
        u = np.asarray(state.u)
        assert np.all(np.isfinite(u))
        assert u.shape[1] == problem.assembler.n_pts
        norms[order] = {k: float(v)
                        for k, v in problem.l2_norms(state).items()}
        problems[order], states[order] = problem, state

    # P2 state really lives on the node space (vertices + edge midpoints)
    assert problems[2].assembler.n_pts > problems[1].assembler.n_pts

    for f in ("phi_i", "phi_e"):
        rel = abs(norms[1][f] - norms[2][f]) / abs(norms[1][f])
        assert rel < 2e-2, f"{f}: P1 {norms[1][f]:.4e} vs P2 {norms[2][f]:.4e}"

    # conservation-as-assert for the P2 path (print_conservation role,
    # KNPEMIx_problem.py:807-843)
    p2 = problems[2]
    s0 = p2.initial_state()
    for ion in p2.params.ion_list:
        tot0 = float(p2.conservation(s0)[ion["name"]])
        tot = float(p2.conservation(states[2])[ion["name"]])
        assert abs(tot - tot0) / abs(tot0) < 2e-4, ion["name"]
