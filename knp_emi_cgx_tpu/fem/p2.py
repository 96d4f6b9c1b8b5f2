"""P2 Lagrange finite elements on simplices: node space (vertices + edge
midpoints), closed-form element tensors via static reference contractions,
and P2 facet shape tables.

TPU-first counterpart of the reference's `fem_order` config knob
(`mixed_dim_problem.py:207-208` parses it; every reference config uses 1 —
this module makes order 2 actually work).  The design keeps per-step
assembly a single einsum, exactly like the P1 path:

On an AFFINE simplex every P2 form integral reduces to a contraction of the
per-cell P1 metric tensor

    S_c[p, r] = vol_c * (g_p . g_r)        (g = constant P1 gradients)

with a STATIC reference tensor, because the P2 basis gradients are linear
combinations of the P1 gradients with barycentric-polynomial coefficients:

    grad N_a(lam) = sum_p B(lam)[a, p] * g_p

    mass       M_e = vol_c * M2                    (M2 constant)
    stiffness  K_e[a,b] = S_c[p,r] * E[a,p,b,r]    (E = int B B)
    drift      W_e(u)[a,b] = u_m * S_c[p,r] * Q[m,a,p,b,r]
                                                   (Q = int N_m B B)

so the per-step drift assembly is `einsum("fcm,cmab->fcab", coeffs, Qs)`
with `Qs = einsum("cpr,mapbr->cmab", S_c, Q)` precomputed at setup — the P2
analog of the P1 path's `coef * K_e`.

Node numbering: global node i < n_vertices is vertex i; node n_vertices + e
is the midpoint of unique edge e.  Vertex-indexed state/I/O therefore keeps
working on the `[:n_vertices]` prefix of any node-valued array.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from knp_emi_cgx_tpu.fem.p1 import cell_quadrature, facet_quadrature


def local_edges(dim: int):
    """Local vertex-index pairs of a dim-simplex, lexicographic."""
    return [(i, j) for i in range(dim + 1) for j in range(i + 1, dim + 1)]


def n_cell_nodes(dim: int) -> int:
    return (dim + 1) + len(local_edges(dim))       # 6 (2D) / 10 (3D)


def n_facet_nodes(dim: int) -> int:
    return dim + len(local_edges(dim - 1)) if dim == 3 else 3
    # 2D facet = interval: 2 verts + 1 edge node = 3
    # 3D facet = triangle: 3 verts + 3 edge nodes = 6


# ---------------------------------------------------------------------------
# Reference shape tables
# ---------------------------------------------------------------------------

def shape_values(lam: np.ndarray) -> np.ndarray:
    """P2 shape values at barycentric points lam [nq, d+1] -> [nq, nn].
    Ordering: vertex nodes first, then edge nodes in `local_edges` order."""
    nv = lam.shape[1]
    vert = lam * (2.0 * lam - 1.0)                           # [nq, nv]
    edge = np.stack([4.0 * lam[:, i] * lam[:, j]
                     for i, j in local_edges(nv - 1)], axis=1)
    return np.concatenate([vert, edge], axis=1)


def gradient_coeffs(lam: np.ndarray) -> np.ndarray:
    """B(lam)[a, p] with grad N_a = sum_p B[a,p] * grad lambda_p.
    Returns [nq, nn, d+1]."""
    nq, nv = lam.shape
    nn = nv + len(local_edges(nv - 1))
    B = np.zeros((nq, nn, nv))
    for a in range(nv):
        B[:, a, a] = 4.0 * lam[:, a] - 1.0
    for e, (i, j) in enumerate(local_edges(nv - 1)):
        B[:, nv + e, i] = 4.0 * lam[:, j]
        B[:, nv + e, j] = 4.0 * lam[:, i]
    return B


def reference_tensors(dim: int):
    """Static reference contractions (exact; one-time, tiny).

    Returns (M2 [nn,nn], E [nn,d+1,nn,d+1], Q [nn,nn,d+1,nn,d+1]) such that
    on an affine cell with P1 metric S_c = vol * (g.g):

      M_e = vol * M2
      K_e[a,b] = S_c[p,r] E[a,p,b,r]
      int_e N_m grad N_a . grad N_b = S_c[p,r] Q[m,a,p,b,r]
    """
    lam, w = cell_quadrature(dim, degree=6)     # >= deg 4 integrands, exact
    N = shape_values(lam)                       # [nq, nn]
    B = gradient_coeffs(lam)                    # [nq, nn, d+1]
    M2 = np.einsum("q,qa,qb->ab", w, N, N)
    E = np.einsum("q,qap,qbr->apbr", w, B, B)
    Q = np.einsum("q,qm,qap,qbr->mapbr", w, N, B, B)
    return M2, E, Q


def facet_shape_values(dim: int, degree: int = 10):
    """P2 facet shape values at the SAME quadrature points/weights as
    `p1.facet_quadrature` -> (Nsh [nq, nfn], w [nq]).  Node ordering matches
    `facet_nodes`: facet vertices (ascending) then facet edges in
    lexicographic local-pair order."""
    lam, w = facet_quadrature(dim, degree=degree)   # P1 shapes = barycentric
    return shape_values(lam), w


def cell_shape_values(dim: int, degree: int = 10):
    """P2 cell shape values at a degree-`degree` cell rule -> (Nsh, w)."""
    lam, w = cell_quadrature(dim, degree=degree)
    return shape_values(lam), w


# ---------------------------------------------------------------------------
# Node space
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class P2NodeSpace:
    """Global P2 node numbering over a tagged simplicial mesh + the node
    restrictions mirroring the vertex ones in `MeshTopology`
    (multiphenicsx `DofMapRestriction` role, KNPEMIx_problem.py:85-94)."""

    n_vertices: int
    n_nodes: int
    node_points: np.ndarray          # [n_nodes, dim]
    edges: np.ndarray                # [n_edges, 2] sorted vertex pairs
    cell_nodes: np.ndarray           # [nc, nn] vertices then edge nodes
    membrane_facet_nodes: np.ndarray  # [n_mf, nfn]
    intra_nodes: np.ndarray
    extra_nodes: np.ndarray
    boundary_nodes: np.ndarray
    _edge_keys: np.ndarray           # sorted packed keys for lookup

    def facet_nodes(self, fverts: np.ndarray) -> np.ndarray:
        """[nf, d] ascending-sorted facet vertex ids -> [nf, nfn] node ids."""
        fverts = np.asarray(fverts)
        d = fverts.shape[1]
        nV = self.n_vertices
        pairs = [(i, j) for i in range(d) for j in range(i + 1, d)]
        cols = [fverts]
        eids = []
        for i, j in pairs:
            keys = fverts[:, i].astype(np.int64) * nV + fverts[:, j]
            pos = np.searchsorted(self._edge_keys, keys)
            pos = np.minimum(pos, len(self._edge_keys) - 1)
            if not np.array_equal(self._edge_keys[pos], keys):
                raise RuntimeError("facet edge missing from the edge table")
            eids.append(pos)
        cols.append(nV + np.stack(eids, axis=1))
        return np.concatenate(cols, axis=1)

    def node_set(self, cells_mask_or_ids) -> np.ndarray:
        """Unique node ids touched by the given cells."""
        return np.unique(self.cell_nodes[cells_mask_or_ids].ravel())


def build_node_space(topo, boundary_tags=None) -> P2NodeSpace:
    """Construct the P2 node space from a built MeshTopology.

    boundary_tags: the facet tags marking the Dirichlet boundary (same
    selection as `build_topology`'s); when omitted, falls back to facets
    whose vertices are all in `topo.boundary_dofs` (exact unless a
    non-boundary exterior facet has all-boundary vertices, e.g. corners)."""
    mesh = topo.mesh
    cells = np.asarray(mesh.cells)
    dim = mesh.dim
    nV = mesh.num_points
    le = local_edges(dim)

    ev = np.stack([cells[:, [i for i, _ in le]],
                   cells[:, [j for _, j in le]]], axis=-1)  # [nc, n_le, 2]
    ev = np.sort(ev, axis=-1)
    keys = ev[..., 0].astype(np.int64) * nV + ev[..., 1]
    ukeys, inv = np.unique(keys.ravel(), return_inverse=True)
    edges = np.stack([ukeys // nV, ukeys % nV], axis=1).astype(np.int64)
    cell_edges = inv.reshape(cells.shape[0], len(le))
    cell_nodes = np.concatenate(
        [cells.astype(np.int64), nV + cell_edges], axis=1)
    node_points = np.concatenate(
        [mesh.points, mesh.points[edges].mean(axis=1)], axis=0)

    ns = P2NodeSpace(
        n_vertices=nV,
        n_nodes=nV + edges.shape[0],
        node_points=node_points,
        edges=edges,
        cell_nodes=cell_nodes,
        membrane_facet_nodes=np.empty((0, 0), dtype=np.int64),
        intra_nodes=np.empty(0, dtype=np.int64),
        extra_nodes=np.empty(0, dtype=np.int64),
        boundary_nodes=np.empty(0, dtype=np.int64),
        _edge_keys=ukeys,
    )
    ns.membrane_facet_nodes = ns.facet_nodes(topo.membrane_verts)
    ns.intra_nodes = ns.node_set(topo.intra_cells)
    ns.extra_nodes = ns.node_set(topo.extra_cells)
    # boundary facets carrying the configured boundary tags (same selection
    # as topo.boundary_dofs, extended with the facet edge nodes)
    if boundary_tags is not None:
        bfacet_mask = (np.isin(topo.facet_tags,
                               tuple(np.atleast_1d(boundary_tags).tolist()))
                       & topo.exterior_facet_mask)
    else:
        bverts = np.unique(topo.boundary_dofs)
        bfacet_mask = np.isin(topo.facets, bverts).all(axis=1) \
            & topo.exterior_facet_mask
    if bfacet_mask.any():
        bnodes = ns.facet_nodes(topo.facets[bfacet_mask])
        ns.boundary_nodes = np.unique(bnodes.ravel())
    else:
        ns.boundary_nodes = np.unique(topo.boundary_dofs).astype(np.int64)
    return ns
