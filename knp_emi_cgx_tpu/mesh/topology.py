"""Host-side mesh topology: facets, connectivity, membrane interface pairs,
subdomain dof restrictions.

Equivalent of the DOLFINx C++ topology/connectivity machinery plus the
reference's interior-facet orientation fixup (`mixed_dim_problem.py:705-729`)
and multiphenicsx `DofMapRestriction` (`KNPEMIx_problem.py:85-94`).  Built
once on the host in numpy; the resulting index arrays are shipped to device
and remain static for the whole run.

Orientation convention (critical correctness detail, SURVEY §7.4-2): every
membrane facet stores its INTRACELLULAR neighbour cell first ('+' side) and
EXTRACELLULAR neighbour second ('-') — the reference enforces the same by
permuting DOLFINx integration entities.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from knp_emi_cgx_tpu.mesh.generation import SimplexMesh


@dataclasses.dataclass
class MeshTopology:
    """All host-computed topology for a tagged simplicial mesh."""

    mesh: SimplexMesh
    # facets[f] = sorted vertex ids of facet f, shape [n_facets, dim]
    facets: np.ndarray
    # facet_cells[f] = (cell0, cell1) adjacent cells; cell1 = -1 on boundary
    facet_cells: np.ndarray
    facet_tags: np.ndarray
    exterior_facet_mask: np.ndarray

    # Membrane interface (Γ): subset of interior facets with gamma tags,
    # oriented intra-first.
    membrane_facets: np.ndarray          # indices into `facets`
    membrane_verts: np.ndarray           # [n_mf, dim] facet vertex ids
    membrane_cell_intra: np.ndarray      # [n_mf] intracellular cell id
    membrane_cell_extra: np.ndarray      # [n_mf] extracellular cell id
    membrane_tags: np.ndarray            # [n_mf] facet tag

    # Subdomain restrictions (vertex dofs for P1)
    intra_dofs: np.ndarray               # sorted vertex ids touching intra cells
    extra_dofs: np.ndarray               # sorted vertex ids touching extra cells
    boundary_dofs: np.ndarray            # vertex ids on tagged exterior boundary

    intra_cells: np.ndarray              # cell ids with intra tags
    extra_cells: np.ndarray              # cell ids with extra tag

    @property
    def dim(self) -> int:
        return self.mesh.dim


def _cell_facets(cells: np.ndarray) -> np.ndarray:
    """Return [n_cells, dim+1, dim] local facet vertex arrays.
    Local facet i of a simplex = all vertices except vertex i."""
    nv = cells.shape[1]
    idx = [[j for j in range(nv) if j != i] for i in range(nv)]
    return cells[:, np.array(idx)]


def build_topology(
    mesh: SimplexMesh,
    facet_tagger=None,
    facet_tags_raw: np.ndarray | None = None,
    intra_tags: tuple = (1,),
    extra_tag: tuple = (2,),
    gamma_tags: tuple = (4,),
    boundary_tags: tuple = (3,),
) -> MeshTopology:
    """Build facet connectivity, tag facets, extract the oriented membrane.

    facet_tagger: callable(mesh, facets, exterior_mask) -> facet tags, used
        for generated geometries.
    facet_tags_raw: alternatively, a precomputed per-facet tag array matching
        the unique-facet ordering (used by the XDMF reader path, which maps
        file facet tags onto the unique-sorted facet table).
    """
    cells = mesh.cells
    dim = mesh.dim
    nv = dim + 1

    # Unique facets + facet->cell adjacency: native hash-map kernel when
    # available (knp_native.cpp — the DOLFINx-topology-core equivalent),
    # numpy sort-unique fallback otherwise.  Both paths canonicalise to
    # lexicographic facet order so downstream structures are identical.
    native_result = None
    try:
        from knp_emi_cgx_tpu import native

        native_result = native.build_facets(cells)
    except Exception:
        native_result = None

    if native_result is not None:
        facets, facet_cells = native_result
        order = np.lexsort(facets.T[::-1])
        facets = facets[order].astype(cells.dtype)
        facet_cells = facet_cells[order]
        n_facets = facets.shape[0]
    else:
        cf = _cell_facets(cells)                     # [n_cells, nv, dim]
        all_facets = np.sort(cf.reshape(-1, dim), axis=1)
        facets, inverse = np.unique(all_facets, axis=0, return_inverse=True)
        n_facets = facets.shape[0]
        inverse = inverse.reshape(cells.shape[0], nv)

        facet_cells = np.full((n_facets, 2), -1, dtype=np.int64)
        cell_ids = np.repeat(np.arange(cells.shape[0]), nv)
        flat = inverse.ravel()
        order = np.argsort(flat, kind="stable")
        flat_sorted = flat[order]
        cell_sorted = cell_ids[order]
        first_mask = np.ones_like(flat_sorted, dtype=bool)
        first_mask[1:] = flat_sorted[1:] != flat_sorted[:-1]
        facet_cells[flat_sorted[first_mask], 0] = cell_sorted[first_mask]
        second_mask = ~first_mask
        facet_cells[flat_sorted[second_mask], 1] = cell_sorted[second_mask]
        counts = (facet_cells >= 0).sum(axis=1)
        if np.any(counts > 2) or np.any(counts == 0):
            raise RuntimeError("Non-manifold mesh: facet shared by >2 cells")

    exterior_mask = facet_cells[:, 1] < 0

    if facet_tags_raw is not None:
        facet_tags = np.asarray(facet_tags_raw, dtype=np.int32)
        if facet_tags.shape[0] != n_facets:
            raise ValueError("facet_tags_raw length mismatch")
    elif facet_tagger is not None:
        try:
            # taggers deriving tags from cell adjacency (tissue geometries)
            facet_tags = facet_tagger(mesh, facets, exterior_mask,
                                      facet_cells=facet_cells)
        except TypeError:
            facet_tags = facet_tagger(mesh, facets, exterior_mask)
    else:
        facet_tags = np.zeros(n_facets, dtype=np.int32)

    cell_tags = mesh.cell_tags
    if cell_tags is None:
        raise ValueError("mesh.cell_tags must be set before build_topology")

    intra_tags = tuple(np.atleast_1d(intra_tags).tolist())
    extra_tag = tuple(np.atleast_1d(extra_tag).tolist())
    gamma_tags = tuple(np.atleast_1d(gamma_tags).tolist())
    boundary_tags = tuple(np.atleast_1d(boundary_tags).tolist())

    is_intra_cell = np.isin(cell_tags, intra_tags)
    is_extra_cell = np.isin(cell_tags, extra_tag)

    # Membrane facets: tagged gamma, interior, separating intra from extra.
    gamma_mask = np.isin(facet_tags, gamma_tags) & ~exterior_mask
    mf = np.nonzero(gamma_mask)[0]
    c0, c1 = facet_cells[mf, 0], facet_cells[mf, 1]
    c0_intra = is_intra_cell[c0]
    c1_intra = is_intra_cell[c1]
    valid = c0_intra != c1_intra  # must separate the two compartments
    if not np.all(valid):
        # A facet tagged gamma that does not separate compartments is a tag
        # inconsistency; the reference would mis-assemble — we drop and warn.
        import warnings

        warnings.warn(
            f"{np.count_nonzero(~valid)} gamma-tagged facets do not separate "
            "intra/extra subdomains; ignoring them."
        )
        mf, c0, c1, c0_intra = mf[valid], c0[valid], c1[valid], c0_intra[valid]
    cell_intra = np.where(c0_intra, c0, c1)
    cell_extra = np.where(c0_intra, c1, c0)

    intra_cells = np.nonzero(is_intra_cell)[0]
    extra_cells = np.nonzero(is_extra_cell)[0]
    intra_dofs = np.unique(cells[intra_cells].ravel())
    extra_dofs = np.unique(cells[extra_cells].ravel())

    bdry_facet_mask = np.isin(facet_tags, boundary_tags) & exterior_mask
    boundary_dofs = np.unique(facets[bdry_facet_mask].ravel())

    return MeshTopology(
        mesh=mesh,
        facets=facets,
        facet_cells=facet_cells,
        facet_tags=facet_tags,
        exterior_facet_mask=exterior_mask,
        membrane_facets=mf,
        membrane_verts=facets[mf],
        membrane_cell_intra=cell_intra.astype(np.int64),
        membrane_cell_extra=cell_extra.astype(np.int64),
        membrane_tags=facet_tags[mf],
        intra_dofs=intra_dofs.astype(np.int64),
        extra_dofs=extra_dofs.astype(np.int64),
        boundary_dofs=boundary_dofs.astype(np.int64),
        intra_cells=intra_cells.astype(np.int64),
        extra_cells=extra_cells.astype(np.int64),
    )
