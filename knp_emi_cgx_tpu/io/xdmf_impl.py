"""XDMF + HDF5 parsing/writing (host side, ElementTree + h5py).

Reader handles the two layouts the reference consumes
(`mixed_dim_problem.py:636-678`):
  * "square" meshes written by DOLFINx with separate `ct`/`ft` grids
    (mesh + cell tags in one file, facet tags in another)
  * tissue meshes with mesh/tags under one hierarchy ("mesh" grid names)

Writer produces ParaView-readable XDMF time series of P1 fields
(KNPEMIx_solver.py:766-797 equivalent).
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np


def _read_data_item(item: ET.Element, base_dir: str):
    fmt = item.get("Format", "XML")
    if fmt == "HDF":
        import h5py

        path = item.text.strip()
        fname, dset = path.split(":")
        with h5py.File(os.path.join(base_dir, fname), "r") as fh:
            return np.asarray(fh[dset])
    # inline XML data
    dims = [int(d) for d in item.get("Dimensions", "").split()]
    data = np.fromstring(item.text.replace("\n", " "), sep=" ")
    return data.reshape(dims) if dims else data


def parse_xdmf(mesh_file: str, facet_file: str | None = None):
    """Returns (points, cells, cell_tags, facet_entities, facet_values)."""
    base = os.path.dirname(os.path.abspath(mesh_file))
    tree = ET.parse(mesh_file)
    root = tree.getroot()

    points = cells = cell_tags = None
    facet_entities = facet_values = None

    def _set_cells(c, attrs, base_dir):
        nonlocal cells, cell_tags
        cells = c.astype(np.int32)
        for a in attrs:
            vals = _read_data_item(a.find("DataItem"), base_dir)
            if vals.size == cells.shape[0]:
                cell_tags = vals.astype(np.int32).ravel()

    def _set_facets(ents, attrs, base_dir):
        nonlocal facet_entities, facet_values
        facet_entities = ents.astype(np.int64)
        for a in attrs:
            vals = _read_data_item(a.find("DataItem"), base_dir)
            if vals.size == ents.shape[0]:
                facet_values = vals.astype(np.int32).ravel()

    for domain in root.findall("Domain"):
        for grid in domain.iter("Grid"):
            topo = grid.find("Topology")
            if topo is None:
                continue
            ttype = (topo.get("TopologyType") or "").lower()
            geom = grid.find("Geometry")
            attrs = grid.findall("Attribute")
            if ttype in ("triangle", "tetrahedron"):
                conn = _read_data_item(topo.find("DataItem"), base).astype(np.int64)
                nvc = 3 if ttype == "triangle" else 4
                c = conn.reshape(-1, nvc)
                if cells is None:
                    _set_cells(c, attrs, base)
                else:
                    # a second cell-dim grid can carry facet tags in 3D
                    # (triangle facets of a tet mesh)
                    if nvc < cells.shape[1]:
                        _set_facets(c, attrs, base)
                if geom is not None and points is None:
                    points = _read_data_item(geom.find("DataItem"), base).astype(float)
            elif ttype in ("polyline", "edge", "edge_3"):
                conn = _read_data_item(topo.find("DataItem"), base).astype(np.int64)
                _set_facets(conn.reshape(-1, 2), attrs, base)
            if geom is not None and points is None:
                points = _read_data_item(geom.find("DataItem"), base).astype(float)

    if facet_file is not None and facet_file != mesh_file:
        ftree = ET.parse(facet_file)
        fbase = os.path.dirname(os.path.abspath(facet_file))
        for domain in ftree.getroot().findall("Domain"):
            for grid in domain.iter("Grid"):
                topo = grid.find("Topology")
                if topo is None:
                    continue
                ttype = (topo.get("TopologyType") or "").lower()
                attrs = grid.findall("Attribute")
                if ttype in ("polyline", "edge", "triangle"):
                    conn = _read_data_item(topo.find("DataItem"), fbase).astype(np.int64)
                    nvf = 2 if ttype in ("polyline", "edge") else 3
                    # in 2D facet grids are polylines; in 3D triangles
                    if cells is not None and nvf == cells.shape[1]:
                        continue  # that's the cell grid again
                    _set_facets(conn.reshape(-1, nvf), attrs, fbase)

    if points is None or cells is None:
        raise RuntimeError(f"Could not parse mesh from {mesh_file}")
    if points.shape[1] == 3 and cells.shape[1] == 3:
        # 2D mesh stored with z=0 column
        if np.allclose(points[:, 2], 0.0):
            points = points[:, :2]
    return points, cells, cell_tags, facet_entities, facet_values


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

class XDMFWriter:
    """Time-series writer for P1 vertex fields on a simplicial mesh."""

    def __init__(self, filename: str, mesh):
        self.filename = filename
        self.h5name = os.path.splitext(filename)[0] + ".h5"
        self.mesh = mesh
        self._steps = []  # (time, {name: dataset})
        import h5py

        self._h5 = h5py.File(self.h5name, "w")
        self._h5.create_dataset("mesh/points", data=mesh.points)
        self._h5.create_dataset("mesh/cells", data=mesh.cells.astype(np.int64))
        if mesh.cell_tags is not None:
            self._h5.create_dataset("mesh/cell_tags", data=mesh.cell_tags)

    def write_fields(self, t: float, fields: dict[str, np.ndarray]):
        idx = len(self._steps)
        names = {}
        for name, vals in fields.items():
            ds = f"fields/{idx}/{name}"
            self._h5.create_dataset(ds, data=np.asarray(vals))
            names[name] = ds
        self._steps.append((t, names))

    def close(self):
        mesh = self.mesh
        dim = mesh.dim
        ttype = "Triangle" if dim == 2 else "Tetrahedron"
        gtype = "XY" if dim == 2 else "XYZ"
        h5rel = os.path.basename(self.h5name)

        lines = [
            '<?xml version="1.0"?>',
            '<Xdmf Version="3.0"><Domain>',
            '<Grid Name="TimeSeries" GridType="Collection" CollectionType="Temporal">',
        ]
        npts, ncells = mesh.num_points, mesh.num_cells
        for t, names in self._steps:
            lines.append(f'<Grid Name="mesh" GridType="Uniform">')
            lines.append(f'<Time Value="{t}"/>')
            lines.append(
                f'<Topology TopologyType="{ttype}" NumberOfElements="{ncells}">'
                f'<DataItem Dimensions="{ncells} {dim+1}" NumberType="Int" Format="HDF">'
                f'{h5rel}:mesh/cells</DataItem></Topology>')
            lines.append(
                f'<Geometry GeometryType="{gtype}">'
                f'<DataItem Dimensions="{npts} {dim}" Format="HDF">'
                f'{h5rel}:mesh/points</DataItem></Geometry>')
            for name, ds in names.items():
                lines.append(
                    f'<Attribute Name="{name}" AttributeType="Scalar" Center="Node">'
                    f'<DataItem Dimensions="{npts}" Format="HDF">'
                    f'{h5rel}:{ds}</DataItem></Attribute>')
            lines.append('</Grid>')
        lines += ['</Grid>', '</Domain></Xdmf>']
        with open(self.filename, "w") as fh:
            fh.write("\n".join(lines))
        self._h5.close()


def write_mesh_xdmf(mesh_file: str, facet_file: str, mesh, facet_verts,
                    facet_tags):
    """Write a tagged mesh in the same two-file layout the reference's
    `generate_square_mesh.py` produces (ct grid + ft grid)."""
    import h5py

    dim = mesh.dim
    ttype = "Triangle" if dim == 2 else "Tetrahedron"
    ftype = "PolyLine" if dim == 2 else "Triangle"
    gtype = "XY" if dim == 2 else "XYZ"

    h5name = os.path.splitext(mesh_file)[0] + ".h5"
    h5rel = os.path.basename(h5name)
    with h5py.File(h5name, "w") as fh:
        fh.create_dataset("points", data=mesh.points)
        fh.create_dataset("cells", data=mesh.cells.astype(np.int64))
        fh.create_dataset("cell_tags", data=mesh.cell_tags.astype(np.int32))
        fh.create_dataset("facets", data=np.asarray(facet_verts, dtype=np.int64))
        fh.create_dataset("facet_tags", data=np.asarray(facet_tags, dtype=np.int32))

    npts, ncells, nf = mesh.num_points, mesh.num_cells, len(facet_tags)
    poly_attr = ' NodesPerElement="2"' if dim == 2 else ""
    mesh_xml = f'''<?xml version="1.0"?>
<Xdmf Version="3.0"><Domain>
<Grid Name="mesh" GridType="Uniform">
<Topology TopologyType="{ttype}" NumberOfElements="{ncells}">
<DataItem Dimensions="{ncells} {dim+1}" NumberType="Int" Format="HDF">{h5rel}:cells</DataItem></Topology>
<Geometry GeometryType="{gtype}"><DataItem Dimensions="{npts} {dim}" Format="HDF">{h5rel}:points</DataItem></Geometry>
<Attribute Name="ct" AttributeType="Scalar" Center="Cell">
<DataItem Dimensions="{ncells}" NumberType="Int" Format="HDF">{h5rel}:cell_tags</DataItem></Attribute>
</Grid>
</Domain></Xdmf>'''
    with open(mesh_file, "w") as fh:
        fh.write(mesh_xml)

    nvf = dim
    ft_xml = f'''<?xml version="1.0"?>
<Xdmf Version="3.0"><Domain>
<Grid Name="ft" GridType="Uniform">
<Topology TopologyType="{ftype}"{poly_attr} NumberOfElements="{nf}">
<DataItem Dimensions="{nf} {nvf}" NumberType="Int" Format="HDF">{h5rel}:facets</DataItem></Topology>
<Geometry GeometryType="{gtype}"><DataItem Dimensions="{npts} {dim}" Format="HDF">{h5rel}:points</DataItem></Geometry>
<Attribute Name="ft" AttributeType="Scalar" Center="Cell">
<DataItem Dimensions="{nf}" NumberType="Int" Format="HDF">{h5rel}:facet_tags</DataItem></Attribute>
</Grid>
</Domain></Xdmf>'''
    with open(facet_file, "w") as fh:
        fh.write(ft_xml)
