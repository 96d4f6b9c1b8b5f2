"""Mesh statistics report + plots (the reference `utils/plot_mesh_data.py`
role, computed from the mesh itself instead of a spreadsheet).

Prints cells/vertices/membrane counts, compartment volumes, membrane areas
and the ECS volume fraction; optionally writes a per-cell volume/area bar
chart.

Usage:
    python scripts/mesh_stats.py --mesh generate:tissue16x8c [--out dir]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plot_slices import build_mesh  # noqa: E402


def mesh_stats(mesh_spec: str, out_dir: str | None = None):
    from knp_emi_cgx_tpu.fem.p1 import cell_geometry, facet_geometry
    from knp_emi_cgx_tpu.mesh.topology import build_topology

    mesh = build_mesh(mesh_spec)
    tags = np.unique(mesh.cell_tags)
    intra_tags = tuple(int(t) for t in tags if t != 1)
    topo = build_topology(
        mesh, facet_tagger=getattr(mesh, "_facet_tagger", None),
        intra_tags=intra_tags, extra_tag=(1,), gamma_tags=intra_tags,
        boundary_tags=(1001, 3))

    _, vols = cell_geometry(mesh.points, mesh.cells)
    areas = facet_geometry(mesh.points, topo.membrane_verts)

    stats = {
        "dim": mesh.dim,
        "vertices": int(mesh.num_points),
        "cells": int(mesh.num_cells),
        "biological_cells": len(intra_tags),
        "membrane_facets": int(len(topo.membrane_facets)),
        "total_volume": float(vols.sum()),
        "ecs_volume": float(vols[mesh.cell_tags == 1].sum()),
        "membrane_area": float(areas.sum()),
    }
    stats["ecs_fraction"] = stats["ecs_volume"] / stats["total_volume"]

    per_cell = {}
    for t in intra_tags:
        per_cell[t] = {
            "volume": float(vols[mesh.cell_tags == t].sum()),
            "area": float(areas[topo.membrane_tags == t].sum()),
        }

    print(f"# mesh statistics: {mesh_spec}")
    for k, v in stats.items():
        print(f"{k:>18}: {v:.6g}" if isinstance(v, float) else
              f"{k:>18}: {v}")
    if per_cell:
        v = np.array([c["volume"] for c in per_cell.values()])
        a = np.array([c["area"] for c in per_cell.values()])
        print(f"{'cell volume':>18}: min {v.min():.3g}  mean {v.mean():.3g}"
              f"  max {v.max():.3g}")
        print(f"{'membrane area':>18}: min {a.min():.3g}  mean {a.mean():.3g}"
              f"  max {a.max():.3g}")

    if out_dir:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        cells_sorted = sorted(per_cell)
        ax1.bar(cells_sorted, [per_cell[t]["volume"] for t in cells_sorted])
        ax1.set_xlabel("cell tag")
        ax1.set_ylabel("volume")
        ax2.bar(cells_sorted, [per_cell[t]["area"] for t in cells_sorted],
                color="tab:orange")
        ax2.set_xlabel("cell tag")
        ax2.set_ylabel("membrane area")
        fig.suptitle(mesh_spec)
        path = os.path.join(out_dir, "mesh_stats.png")
        fig.savefig(path, dpi=130, bbox_inches="tight")
        plt.close(fig)
        print(path)
    return stats, per_cell


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--mesh", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    mesh_stats(args.mesh, args.out)


if __name__ == "__main__":
    main()
