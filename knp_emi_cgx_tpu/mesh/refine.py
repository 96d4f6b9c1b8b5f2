"""Uniform (red) mesh refinement with tag transfer.

Equivalent of the reference's `utils/refine_mesh.py` (DOLFINx
`refine` + `transfer_*_meshtag`): every triangle splits into 4, every
tetrahedron into 8 (red refinement via edge midpoints, shortest-interior-
diagonal rule for the central octahedron).  Cell tags are inherited from the
parent; facet tags transfer geometrically (children of a tagged parent facet
lie within it, so a vertex-subset test against the parent facet's vertex +
edge-midpoint set identifies them).
"""
from __future__ import annotations

import numpy as np

from knp_emi_cgx_tpu.mesh.generation import SimplexMesh


def _edge_midpoints(cells: np.ndarray, n_points: int):
    """Unique edges of the mesh and midpoint vertex ids for them.
    Returns (edge_array [n_edges, 2] sorted, edge_id_of(v0, v1) lookup)."""
    nv = cells.shape[1]
    pairs = [(i, j) for i in range(nv) for j in range(i + 1, nv)]
    e = np.concatenate([cells[:, [i, j]] for i, j in pairs], axis=0)
    e = np.sort(e, axis=1)
    edges, inverse = np.unique(e, axis=0, return_inverse=True)
    return edges, inverse.reshape(len(pairs), cells.shape[0]).T


def refine_uniform(mesh: SimplexMesh) -> tuple[SimplexMesh, np.ndarray]:
    """Refine once.  Returns (fine_mesh, parent_cell_ids)."""
    pts = mesh.points
    cells = mesh.cells
    nV = mesh.num_points
    dim = mesh.dim
    edges, cell_edge = _edge_midpoints(cells, nV)
    mid = 0.5 * (pts[edges[:, 0]] + pts[edges[:, 1]])
    new_pts = np.concatenate([pts, mid], axis=0)
    m = nV + cell_edge  # per-cell midpoint vertex ids, ordered by local pair

    if dim == 2:
        v0, v1, v2 = cells.T
        # local edge pairs: (0,1), (0,2), (1,2)
        m01, m02, m12 = m[:, 0], m[:, 1], m[:, 2]
        children = [
            np.column_stack([v0, m01, m02]),
            np.column_stack([m01, v1, m12]),
            np.column_stack([m02, m12, v2]),
            np.column_stack([m01, m12, m02]),
        ]
        n_children = 4
    else:
        v0, v1, v2, v3 = cells.T
        # local pairs: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
        m01, m02, m03, m12, m13, m23 = (m[:, i] for i in range(6))
        corner = [
            np.column_stack([v0, m01, m02, m03]),
            np.column_stack([v1, m01, m12, m13]),
            np.column_stack([v2, m02, m12, m23]),
            np.column_stack([v3, m03, m13, m23]),
        ]
        # central octahedron split along diagonal m01-m23 (a fixed choice;
        # uniform meshes stay shape-regular)
        octa = [
            np.column_stack([m01, m23, m02, m03]),
            np.column_stack([m01, m23, m03, m13]),
            np.column_stack([m01, m23, m13, m12]),
            np.column_stack([m01, m23, m12, m02]),
        ]
        children = corner + octa
        n_children = 8

    fine_cells = np.concatenate(children, axis=0).astype(np.int32)
    parent = np.tile(np.arange(mesh.num_cells), n_children)
    fine_tags = None
    if mesh.cell_tags is not None:
        fine_tags = mesh.cell_tags[parent]
    fine = SimplexMesh(points=new_pts, cells=fine_cells, cell_tags=fine_tags)
    # propagate a geometric facet tagger if the parent carried one
    tagger = getattr(mesh, "_facet_tagger", None)
    if tagger is not None:
        fine._facet_tagger = tagger
    return fine, parent


def transfer_facet_tags(coarse_mesh, coarse_facets, coarse_tags,
                        fine_mesh, fine_facets, default=0):
    """Tag fine facets from tagged coarse facets: a fine facet inherits a
    coarse facet's tag iff all its vertices belong to the coarse facet's
    vertex + edge-midpoint set (i.e. it lies within the coarse facet)."""
    nV = coarse_mesh.num_points
    # map (sorted vertex pair) -> midpoint id used by refine_uniform
    edges, _ = _edge_midpoints(coarse_mesh.cells, nV)
    edge_lookup = {tuple(e): nV + i for i, e in enumerate(edges)}

    member = {}
    for fidx, fverts in enumerate(coarse_facets):
        tag = coarse_tags[fidx]
        allowed = set(int(v) for v in fverts)
        vs = sorted(int(v) for v in fverts)
        for a in range(len(vs)):
            for b in range(a + 1, len(vs)):
                key = (vs[a], vs[b])
                if key in edge_lookup:
                    allowed.add(edge_lookup[key])
        member[fidx] = (frozenset(allowed), tag)

    # invert: vertex -> candidate coarse facets
    cand = {}
    for fidx, (allowed, _) in member.items():
        for v in allowed:
            cand.setdefault(v, []).append(fidx)

    out = np.full(fine_facets.shape[0], default, dtype=np.int32)
    for i, fverts in enumerate(fine_facets):
        fs = cand.get(int(fverts[0]))
        if not fs:
            continue
        vset = set(int(v) for v in fverts)
        for fidx in fs:
            allowed, tag = member[fidx]
            if vset <= allowed:
                out[i] = tag
                break
    return out
