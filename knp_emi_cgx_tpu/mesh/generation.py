"""Host-side simplicial mesh generation and tagging (numpy).

This module is the TPU-framework's equivalent of the reference's mesh layer
(DOLFINx `create_unit_square`/`create_unit_cube` plus the subdomain/boundary
marker functions in CGx `utils/misc.py:99-504` and the CLI generator
`utils/generate_square_mesh.py`).  Meshes are plain numpy structures; all
device-side data is derived from them once and stays static for the whole
simulation (static sparsity, static shapes — XLA-friendly).

Tag conventions replicated from the reference:
  unit square / cube with inner box [0.25, 0.75]^d:
    cell tags:  1 = inner box (intracellular), 2 = outer region (extracellular)
    facet tags: 3 = exterior boundary, 4 = membrane interface Γ, 5 = other
  MMS variant boundary tags (misc.py:197-254, 400-504):
    2D: membrane planes left/right/bottom/top = 1/2/3/4, interior 7, boundary 8
    3D: left/right/front/back/bottom/top = 1/2/3/4/5/6, interior 7, boundary 8
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SimplexMesh:
    """An unstructured simplicial mesh with cell and facet tags.

    points     : [n_points, dim] float64 vertex coordinates
    cells      : [n_cells, dim+1] int32 vertex indices
    cell_tags  : [n_cells] int32 subdomain markers
    facet_tags : optional dict built later by `build_topology` or markers
    """

    points: np.ndarray
    cells: np.ndarray
    cell_tags: np.ndarray | None = None

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    def scaled(self, factor: float) -> "SimplexMesh":
        """Return a copy with coordinates scaled by `factor`
        (the reference's `mesh_conversion_factor`, mixed_dim_problem.py:681)."""
        return dataclasses.replace(self, points=self.points * factor)


# ---------------------------------------------------------------------------
# Structured generators
# ---------------------------------------------------------------------------

def unit_square_mesh(nx: int, ny: int | None = None, diagonal: str = "right") -> SimplexMesh:
    """Uniform triangulation of the unit square.

    `diagonal="right"` splits each grid square along the bottom-left →
    top-right diagonal ("/"), `"left"` along bottom-right → top-left ("\\").
    The "right" layout matches DOLFINx's default for `create_unit_square`.
    """
    if ny is None:
        ny = nx
    xs = np.linspace(0.0, 1.0, nx + 1)
    ys = np.linspace(0.0, 1.0, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    # Vertex v(ix, iy) = iy*(nx+1) + ix
    points = np.column_stack([X.ravel(), Y.ravel()])

    ix, iy = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
    v0 = (iy * (nx + 1) + ix).ravel()
    v1 = v0 + 1
    v2 = v0 + (nx + 1)
    v3 = v1 + (nx + 1)
    if diagonal == "right":
        cells = np.concatenate(
            [np.column_stack([v0, v1, v3]), np.column_stack([v0, v2, v3])], axis=0
        )
    elif diagonal == "left":
        cells = np.concatenate(
            [np.column_stack([v0, v1, v2]), np.column_stack([v1, v2, v3])], axis=0
        )
    else:
        raise ValueError(f"Unknown diagonal type: {diagonal}")
    return SimplexMesh(points=points.astype(np.float64), cells=cells.astype(np.int32))


def unit_cube_mesh(nx: int, ny: int | None = None, nz: int | None = None) -> SimplexMesh:
    """Uniform tetrahedralisation of the unit cube (6 tets per hex cell)."""
    if ny is None:
        ny = nx
    if nz is None:
        nz = nx
    xs = np.linspace(0.0, 1.0, nx + 1)
    ys = np.linspace(0.0, 1.0, ny + 1)
    zs = np.linspace(0.0, 1.0, nz + 1)
    # Vertex v(ix, iy, iz) = (iz*(ny+1) + iy)*(nx+1) + ix
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    points = np.column_stack([X.ravel(), Y.ravel(), Z.ravel()])

    ix, iy, iz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    ix, iy, iz = ix.ravel(), iy.ravel(), iz.ravel()
    sx, sy = nx + 1, (nx + 1) * (ny + 1)
    v0 = iz * sy + iy * sx + ix
    v1 = v0 + 1
    v2 = v0 + sx
    v3 = v2 + 1
    v4 = v0 + sy
    v5 = v4 + 1
    v6 = v4 + sx
    v7 = v6 + 1
    # Kuhn split of the hexahedron into six tetrahedra sharing diagonal v0-v7.
    tets = [
        (v0, v1, v3, v7),
        (v0, v1, v5, v7),
        (v0, v2, v3, v7),
        (v0, v2, v6, v7),
        (v0, v4, v5, v7),
        (v0, v4, v6, v7),
    ]
    cells = np.concatenate([np.column_stack(t) for t in tets], axis=0)
    return SimplexMesh(points=points.astype(np.float64), cells=cells.astype(np.int32))


# ---------------------------------------------------------------------------
# Subdomain / boundary markers (replicating CGx utils/misc.py conventions)
# ---------------------------------------------------------------------------

def _inside_box(x: np.ndarray, lo: float = 0.25, hi: float = 0.75) -> np.ndarray:
    """True for points inside [lo, hi]^dim (all coordinates)."""
    ok = np.ones(x.shape[0], dtype=bool)
    for d in range(x.shape[1]):
        ok &= (x[:, d] >= lo - 1e-12) & (x[:, d] <= hi + 1e-12)
    return ok


def mark_subdomains_square(mesh: SimplexMesh, intra: int = 1, extra: int = 2) -> np.ndarray:
    """Cell tags: `intra` where ALL cell vertices lie in [0.25,0.75]^2, else
    `extra` (matches dolfinx.mesh.locate_entities semantics used at
    misc.py:99-135: an entity is located iff all its vertices satisfy the
    locator)."""
    verts_inside = _inside_box(mesh.points)
    cell_inside = verts_inside[mesh.cells].all(axis=1)
    tags = np.full(mesh.num_cells, extra, dtype=np.int32)
    tags[cell_inside] = intra
    return tags


mark_subdomains_cube = mark_subdomains_square  # same rule in 3D (misc.py:256-297)


def _facet_midplane_masks_2d(fp: np.ndarray):
    """Facet classification helpers for the [0.25,0.75]^2 interface.
    fp: [n_facets, 2 verts, 2 coords]."""
    def on_plane(axis, value):
        coords = fp[:, :, axis]
        other = fp[:, :, 1 - axis]
        on = np.isclose(coords, value).all(axis=1)
        in_range = ((other >= 0.25 - 1e-12) & (other <= 0.75 + 1e-12)).all(axis=1)
        return on & in_range

    return {
        "left": on_plane(0, 0.25),
        "right": on_plane(0, 0.75),
        "bottom": on_plane(1, 0.25),
        "top": on_plane(1, 0.75),
    }


def _facet_midplane_masks_3d(fp: np.ndarray):
    """fp: [n_facets, 3 verts, 3 coords]."""
    def on_plane(axis, value):
        coords = fp[:, :, axis]
        on = np.isclose(coords, value).all(axis=1)
        in_range = np.ones(fp.shape[0], dtype=bool)
        for other_axis in range(3):
            if other_axis == axis:
                continue
            oc = fp[:, :, other_axis]
            in_range &= ((oc >= 0.25 - 1e-12) & (oc <= 0.75 + 1e-12)).all(axis=1)
        return on & in_range

    return {
        "left": on_plane(0, 0.25),
        "right": on_plane(0, 0.75),
        "front": on_plane(1, 0.25),
        "back": on_plane(1, 0.75),
        "bottom": on_plane(2, 0.25),
        "top": on_plane(2, 0.75),
    }


def mark_boundaries_square(mesh: SimplexMesh, facets: np.ndarray,
                           exterior_mask: np.ndarray) -> np.ndarray:
    """Facet tags for the physical square problem (misc.py:137-195):
    3 = exterior boundary, 4 = membrane Γ, 5 = other interior facets."""
    fp = mesh.points[facets]  # [n_facets, 2, 2]
    tags = np.full(facets.shape[0], 5, dtype=np.int32)
    tags[exterior_mask] = 3
    masks = _facet_midplane_masks_2d(fp)
    gamma = masks["left"] | masks["right"] | masks["bottom"] | masks["top"]
    tags[gamma] = 4
    return tags


def mark_boundaries_cube(mesh: SimplexMesh, facets: np.ndarray,
                         exterior_mask: np.ndarray) -> np.ndarray:
    """3D physical variant (misc.py:299-398): 3 = boundary, 4 = Γ, 5 = other."""
    fp = mesh.points[facets]
    tags = np.full(facets.shape[0], 5, dtype=np.int32)
    tags[exterior_mask] = 3
    masks = _facet_midplane_masks_3d(fp)
    gamma = np.zeros(facets.shape[0], dtype=bool)
    for m in masks.values():
        gamma |= m
    tags[gamma] = 4
    return tags


def mark_boundaries_square_mms(mesh: SimplexMesh, facets: np.ndarray,
                               exterior_mask: np.ndarray) -> np.ndarray:
    """MMS variant (misc.py:197-254): per-plane membrane tags
    left/right/bottom/top = 1/2/3/4; interior 7, exterior boundary 8."""
    fp = mesh.points[facets]
    tags = np.full(facets.shape[0], 7, dtype=np.int32)
    tags[exterior_mask] = 8
    masks = _facet_midplane_masks_2d(fp)
    for name, tag in (("left", 1), ("right", 2), ("bottom", 3), ("top", 4)):
        tags[masks[name]] = tag
    return tags


def mark_boundaries_cube_mms(mesh: SimplexMesh, facets: np.ndarray,
                             exterior_mask: np.ndarray) -> np.ndarray:
    """MMS variant (misc.py:400-504): left/right/front/back/bottom/top =
    1/2/3/4/5/6; interior 7, boundary 8."""
    fp = mesh.points[facets]
    tags = np.full(facets.shape[0], 7, dtype=np.int32)
    tags[exterior_mask] = 8
    masks = _facet_midplane_masks_3d(fp)
    for name, tag in (("left", 1), ("right", 2), ("front", 3),
                      ("back", 4), ("bottom", 5), ("top", 6)):
        tags[masks[name]] = tag
    return tags


# ---------------------------------------------------------------------------
# Complete tagged geometries (mesh + cell tags + facet tagger)
# ---------------------------------------------------------------------------

def geometry_from_spec(spec: str):
    """Resolve a `generate:` pseudo-file mesh spec (the CLI convention,
    main.py) to (mesh, facet_tagger): "squareN", "cubeN", "tissueNxCc",
    "circleN".  The tagger is attached by the caller via
    `mesh._facet_tagger`."""
    import re

    spec = spec.split("generate:")[-1]
    # "_refined" suffixes (stackable, reference configs/5m/100c_refined*.yaml):
    # generate the base geometry, then uniform-refine with tag inheritance
    # (cell tags from parents, facet tags geometrically re-applied).
    n_refine = 0
    while spec.endswith("_refined"):
        spec = spec[: -len("_refined")]
        n_refine += 1
    if n_refine:
        from knp_emi_cgx_tpu.mesh.refine import refine_uniform

        mesh, tagger = geometry_from_spec(spec)
        for _ in range(n_refine):
            mesh, _ = refine_uniform(mesh)
        return mesh, tagger
    tissue = re.fullmatch(r"tissue(\d+)x(\d+)c", spec)
    if tissue:
        return generate_tissue_geometry(int(tissue.group(1)),
                                        int(tissue.group(2)))
    if spec.startswith("square"):
        return generate_square_geometry(int(spec[6:]))
    if spec.startswith("cube"):
        return generate_cube_geometry(int(spec[4:]))
    if spec.startswith("circle"):
        return generate_circle_geometry(n_rings=int(spec[6:]))
    raise ValueError(f"Unknown generated mesh spec: {spec}")


def generate_square_geometry(n: int, diagonal: str = "right", mms: bool = False):
    """Unit square with the inner box tagged; returns (mesh, facet_tagger).
    The facet tagger is applied by `build_topology` once facets exist."""
    mesh = unit_square_mesh(n, n, diagonal=diagonal)
    mesh.cell_tags = mark_subdomains_square(mesh)
    tagger = mark_boundaries_square_mms if mms else mark_boundaries_square
    return mesh, tagger


def generate_cube_geometry(n: int, mms: bool = False):
    mesh = unit_cube_mesh(n, n, n)
    mesh.cell_tags = mark_subdomains_cube(mesh)
    tagger = mark_boundaries_cube_mms if mms else mark_boundaries_cube
    return mesh, tagger


def generate_circle_geometry(n_rings: int = 16, n_theta: int = 48,
                             membrane_ring_frac: float = 0.5,
                             radius: float = 1.0):
    """Disk with a concentric circular membrane — the reference's gmsh
    circle-in-circle geometry (`utils/dfx_mesh_creation.py:107-183`) built
    natively (no gmsh in this environment): a polar triangulation with a
    centre fan and annulus rings, the membrane placed exactly on a vertex
    ring.

      cell tags:  1 = inside the membrane ring, 2 = outside
      facet tags: 3 = outer boundary, 4 = membrane circle, 5 = other
    """
    m_ring = max(1, int(round(membrane_ring_frac * n_rings)))
    r_m = radius * m_ring / n_rings

    pts = [(0.0, 0.0)]
    ring_start = [None]  # index of first vertex of ring k (k>=1)
    for k in range(1, n_rings + 1):
        ring_start.append(len(pts))
        r = radius * k / n_rings
        for j in range(n_theta):
            a = 2 * np.pi * j / n_theta
            pts.append((r * np.cos(a), r * np.sin(a)))
    points = np.asarray(pts)

    cells = []
    # centre fan
    s1 = ring_start[1]
    for j in range(n_theta):
        cells.append((0, s1 + j, s1 + (j + 1) % n_theta))
    # annuli
    for k in range(1, n_rings):
        a0, b0 = ring_start[k], ring_start[k + 1]
        for j in range(n_theta):
            j1 = (j + 1) % n_theta
            cells.append((a0 + j, b0 + j, b0 + j1))
            cells.append((a0 + j, b0 + j1, a0 + j1))
    cells = np.asarray(cells, dtype=np.int32)

    mesh = SimplexMesh(points=points, cells=cells)
    centroids_r = np.linalg.norm(points[cells].mean(axis=1), axis=1)
    mesh.cell_tags = np.where(centroids_r < r_m, 1, 2).astype(np.int32)

    def tagger(mesh, facets, exterior_mask):
        fr = np.linalg.norm(mesh.points[facets], axis=2)
        tags = np.full(facets.shape[0], 5, dtype=np.int32)
        tags[exterior_mask] = 3
        on_membrane = np.all(np.isclose(fr, r_m, rtol=1e-10), axis=1)
        tags[on_membrane & ~exterior_mask] = 4
        return tags

    return mesh, tagger


def generate_two_cell_geometry(n: int = 16):
    """Unit square with TWO separate intracellular boxes — for neuron+glia
    (three-compartment) runs following the reference's tissue-config tag
    convention (configs/5m/100c.yaml): per-cell membrane tags equal to the
    cell tags, ECS tag 1.

      cells:  1 = ECS, 2 = neuron box [0.125,0.375]^2,
              3 = glia box [0.625,0.875]^2
      facets: tag 2 on the neuron membrane, 3 on the glia membrane,
              4 exterior boundary, 5 other
    """
    if n % 8:
        raise ValueError("n must be a multiple of 8 for aligned boxes")
    mesh = unit_square_mesh(n, n)

    def in_box(x, lo, hi):
        ok = np.ones(x.shape[0], dtype=bool)
        for d in range(2):
            ok &= (x[:, d] >= lo - 1e-12) & (x[:, d] <= hi + 1e-12)
        return ok

    neuron_v = in_box(mesh.points, 0.125, 0.375)
    glia_v = in_box(mesh.points, 0.625, 0.875)
    tags = np.ones(mesh.num_cells, dtype=np.int32)
    tags[neuron_v[mesh.cells].all(axis=1)] = 2
    tags[glia_v[mesh.cells].all(axis=1)] = 3
    mesh.cell_tags = tags

    def tagger(mesh, facets, exterior_mask):
        fp = mesh.points[facets]
        out = np.full(facets.shape[0], 5, dtype=np.int32)
        out[exterior_mask] = 4

        def on_box_boundary(lo, hi):
            on = np.zeros(facets.shape[0], dtype=bool)
            for axis in range(2):
                for val in (lo, hi):
                    coords = fp[:, :, axis]
                    other = fp[:, :, 1 - axis]
                    hit = np.isclose(coords, val).all(axis=1)
                    rng = ((other >= lo - 1e-12) & (other <= hi + 1e-12)).all(axis=1)
                    on |= hit & rng
            return on

        out[on_box_boundary(0.125, 0.375)] = 2
        out[on_box_boundary(0.625, 0.875)] = 3
        return out

    return mesh, tagger


def generate_tissue_geometry(n: int, n_cells: int, seed: int = 0,
                             cell_size: int | None = None):
    """Many-cell 3D tissue-like geometry: `n_cells` separate intracellular
    boxes seeded in a unit-cube n^3x6 tet mesh, following the reference's
    dense-tissue tag convention (configs/5m/100c.yaml):

      cell tags:  1 = ECS, 2..n_cells+1 = biological cells
      facet tags: per-cell membrane tag equal to the cell tag,
                  1001 = exterior boundary, 0 = other

    Cells are axis-aligned boxes placed on a jittered coarse lattice with a
    >=1-grid-cell ECS gap between any two cells (ECS percolates), so the
    geometry mimics the reference's dense reconstructions' topology (every
    cell coupled to every neighbour only through the shared ECS).  A fixed
    `seed` makes the geometry reproducible.  Use `glia_tags` in the config
    to mark any subset of the cells as glia.
    """
    if cell_size is None:
        # largest box size whose gapped lattice still fits n_cells
        cell_size = 1
        for s in range(n, 0, -1):
            if (n // (s + 1)) ** 3 >= n_cells:
                cell_size = s
                break
    pitch = cell_size + 1
    sites_per_axis = n // pitch
    capacity = sites_per_axis ** 3
    if capacity < n_cells:
        raise ValueError(
            f"tissue mesh n={n} fits only {capacity} cells of grid size "
            f"{cell_size} (requested {n_cells})")

    mesh = unit_cube_mesh(n, n, n)
    h = 1.0 / n

    rng = np.random.default_rng(seed)
    sites = rng.permutation(capacity)[:n_cells]
    sx = sites // (sites_per_axis ** 2)
    sy = (sites // sites_per_axis) % sites_per_axis
    sz = sites % sites_per_axis
    # one grid cell of jitter where the lattice leaves room
    slack = n - sites_per_axis * pitch
    jit = rng.integers(0, 2, size=(n_cells, 3)) if slack >= 1 else 0

    lo = (np.stack([sx, sy, sz], axis=1) * pitch + 1) + jit   # grid units
    hi = lo + cell_size                                        # exclusive

    # Tet membership via an owner grid: every tet midpoint lies strictly
    # inside one unit grid cube, so tagging is one gather from an
    # [n,n,n] owner lookup filled with n_cells small slice assignments —
    # O(n^3 + n_cells*cell_size^3) instead of the O(n_cells * n_tets)
    # per-cell scan (which is 3e9 comparisons at 80^3 x 1000 cells).
    owner = np.ones((n, n, n), dtype=np.int32)                 # 1 = ECS
    for c in range(n_cells):
        owner[lo[c, 0]:hi[c, 0], lo[c, 1]:hi[c, 1], lo[c, 2]:hi[c, 2]] = 2 + c
    cell_mid = mesh.points[mesh.cells].mean(axis=1) / h        # [nc, 3]
    cube = np.floor(cell_mid).astype(np.int64)
    tags = owner[cube[:, 0], cube[:, 1], cube[:, 2]]
    mesh.cell_tags = tags

    def tagger(mesh, facets, exterior_mask, facet_cells=None):
        out = np.zeros(facets.shape[0], dtype=np.int32)
        out[exterior_mask] = 1001
        if facet_cells is None:
            raise RuntimeError("tissue tagger needs facet_cells adjacency")
        interior = ~exterior_mask
        # the MESH ARGUMENT's own cell tags, not the generator's: the
        # tagger is re-applied after uniform refinement, where cell tags
        # are inherited from the parent cells (mesh/refine.py)
        ct = mesh.cell_tags
        t0 = ct[facet_cells[interior, 0]]
        t1 = ct[facet_cells[interior, 1]]
        membrane = (t0 == 1) != (t1 == 1)
        out[np.nonzero(interior)[0][membrane]] = np.maximum(t0, t1)[membrane]
        return out

    return mesh, tagger
