"""Regroup a DOLFINx-written XDMF time series so ParaView sees one Grid per
timestep carrying every field (reference `utils/restructure_xdmf.py:6-77`
equivalent — independent implementation of the same transformation).

DOLFINx writes each field at each time as its OWN Uniform Grid inside a
temporal Collection, referencing the mesh through an xi:include pointer and
keeping cell tags in a separate 'ct' Grid.  ParaView then shows N unrelated
time series.  This tool merges: for every distinct Time value, one Uniform
Grid holding the mesh include, the cell-tag attribute (when present) and
ALL field Attributes of that time.

Files produced by this framework's own XDMFWriter are already merged; this
converter exists so externally produced (reference-run) outputs can be
post-processed with the same tooling.

CLI: python -m knp_emi_cgx_tpu.io.restructure_xdmf file.xdmf [-o out.xdmf]
"""
from __future__ import annotations

import copy
from collections import defaultdict

XI_NS = "https://www.w3.org/2001/XInclude"


def restructure(filename: str, out: str | None = None) -> str:
    from lxml import etree

    parser = etree.XMLParser(remove_blank_text=True)
    tree = etree.parse(filename, parser)
    root = tree.getroot()

    include = root.xpath("//xi:include", namespaces={"xi": XI_NS})
    include = include[0] if include else None

    mesh_grids = root.xpath("//Grid[@Name='mesh']")
    ct_grids = root.xpath("//Grid[@Name='ct']")
    ct_topology = ct_attribute = None
    if ct_grids:
        ct_topology = ct_grids[0].find("Topology")
        ct_attribute = ct_grids[0].find("Attribute")

    # collect Uniform grids by time value, in first-seen time order
    by_time: dict[str, list] = defaultdict(list)
    order: list[str] = []
    for coll in root.xpath("//Grid[@GridType='Collection']"):
        for grid in coll.xpath(".//Grid[@GridType='Uniform']"):
            tel = grid.find("Time")
            if tel is None:
                continue
            t = tel.get("Value")
            if t not in by_time:
                order.append(t)
            by_time[t].append(grid)

    merged = []
    for t in order:
        g = etree.Element("Grid", Name=f"merged_time_{t}",
                          GridType="Uniform")
        if include is not None:
            g.append(etree.Element(f"{{{XI_NS}}}include",
                                   attrib=dict(include.attrib)))
        g.append(etree.Element("Time", Value=t))
        if ct_topology is not None:
            g.append(copy.deepcopy(ct_topology))
        if ct_attribute is not None:
            g.append(copy.deepcopy(ct_attribute))
        for grid in by_time[t]:
            for attr in grid.findall("Attribute"):
                g.append(copy.deepcopy(attr))
        merged.append(g)

    # rebuild the document: Domain with the mesh grid + one temporal
    # collection containing all merged per-time grids
    xdmf = tree.xpath("//Xdmf")[0]
    xdmf.set("Version", "3.0")
    for child in list(xdmf):
        xdmf.remove(child)
    domain = etree.SubElement(xdmf, "Domain")
    if mesh_grids:
        domain.append(mesh_grids[0])
    coll = etree.SubElement(domain, "Grid", Name="TimeSeries",
                            GridType="Collection", CollectionType="Temporal")
    for g in merged:
        coll.append(g)

    out = out or filename
    with open(out, "wb") as fh:
        fh.write(etree.tostring(tree, pretty_print=True,
                                xml_declaration=True, encoding="UTF-8"))
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser(
        description="Merge per-field XDMF grids into one grid per timestep")
    ap.add_argument("file")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    print(restructure(args.file, args.out))


if __name__ == "__main__":
    main()
