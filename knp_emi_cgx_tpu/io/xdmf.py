"""XDMF/HDF5 mesh I/O (host side).

Reader/writer for the XDMF+HDF5 files the reference consumes and produces
(`mixed_dim_problem.py:634-678`, `KNPEMIx_solver.py:766-797`).  Implemented
with h5py + lxml/ElementTree — no DOLFINx dependency.
"""
from __future__ import annotations

import numpy as np

from knp_emi_cgx_tpu.mesh.generation import SimplexMesh


def read_mesh_xdmf(mesh_file: str, facet_file: str | None = None) -> SimplexMesh:
    """Read mesh + cell tags (+ facet tags) from XDMF files.

    Returns a SimplexMesh with `_facet_tags_info` attached: a list of
    (facet_vertex_array, tag_array) entries that `build_topology` maps onto
    its unique-facet table via `attach_facet_tags`.
    """
    from knp_emi_cgx_tpu.io.xdmf_impl import parse_xdmf

    points, cells, cell_tags, facet_entities, facet_values = parse_xdmf(
        mesh_file, facet_file)
    mesh = SimplexMesh(points=points, cells=cells, cell_tags=cell_tags)
    if facet_entities is not None:
        mesh._facet_entities = facet_entities
        mesh._facet_values = facet_values
        mesh._facet_tagger = _tagger_from_entities(facet_entities, facet_values)
    return mesh


def _tagger_from_entities(facet_entities: np.ndarray, facet_values: np.ndarray):
    """Build a facet tagger mapping file-specified facet tags onto the
    unique-facet table (default tag 0 for untagged facets)."""
    key_sorted = np.sort(facet_entities, axis=1)

    def tagger(mesh, facets, exterior_mask):
        tags = np.zeros(facets.shape[0], dtype=np.int32)
        # row-wise match via structured view
        def rowview(a):
            a = np.ascontiguousarray(a, dtype=np.int64)
            return a.view([("", a.dtype)] * a.shape[1]).ravel()

        fv = rowview(facets)
        kv = rowview(key_sorted)
        order = np.argsort(fv)
        pos = np.searchsorted(fv[order], kv)
        ok = pos < fv.shape[0]
        match = np.nonzero(ok & (fv[order[np.clip(pos, 0, len(order) - 1)]] == kv))[0]
        tags[order[pos[match]]] = facet_values[match]
        return tags

    return tagger
