"""Geometry renders of a tagged mesh (the pyvista-role counterpart of
reference `utils/plot_geometries.py`, matplotlib-only).

Produces (a) a cell-tag slice image (which biological cell / ECS each point
of a cutting plane belongs to) and (b) a 3D view of the membrane surfaces
coloured by cell tag.

Usage:
    python scripts/plot_geometries.py --mesh generate:tissue16x8c \\
        [--axis z --pos 0.5] [--resolution 200] [--out outdir]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plot_slices import build_mesh, slice_points  # noqa: E402


def plot_geometry(mesh_spec: str, axis="z", pos=0.5, resolution=200,
                  out_dir=".", max_triangles=20000):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from knp_emi_cgx_tpu.io.pointeval import PointEvaluator
    from knp_emi_cgx_tpu.mesh.topology import build_topology

    mesh = build_mesh(mesh_spec)
    written = []

    # --- (a) cell-tag slice ---
    if mesh.dim == 2:
        axis, pos = "z", 0.0
    pts, (U, V), others = slice_points(mesh, axis, pos, resolution)
    subset = None
    if mesh.dim == 3:
        ax = "xyz".index(axis)
        centroid = mesh.points[mesh.cells].mean(axis=1)[:, ax]
        h = (mesh.points.max(axis=0) - mesh.points.min(axis=0))[ax]
        subset = np.nonzero(np.abs(centroid - pts[0, ax])
                            < 4 * h / resolution + h * 0.05)[0]
        if len(subset) == 0:
            subset = None
    pe = PointEvaluator(mesh, pts, cells_subset=subset)
    tags = mesh.cell_tags[pe.cell_ids].reshape(U.shape)

    fig, axp = plt.subplots(figsize=(6, 5))
    im = axp.pcolormesh(U, V, tags, shading="auto", cmap="tab20")
    fig.colorbar(im, ax=axp, label="cell tag")
    axp.set_xlabel("xyz"[others[0]])
    axp.set_ylabel("xyz"[others[1]])
    axp.set_title(f"subdomains @ {axis}={pos:.2f}")
    path = os.path.join(out_dir, "geometry_slice.png")
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    written.append(path)

    # --- (b) 3D membrane surfaces ---
    if mesh.dim == 3:
        topo = build_topology(
            mesh, facet_tagger=getattr(mesh, "_facet_tagger", None),
            intra_tags=tuple(np.unique(mesh.cell_tags[mesh.cell_tags > 1])),
            extra_tag=(1,),
            gamma_tags=tuple(np.unique(mesh.cell_tags[mesh.cell_tags > 1])),
            boundary_tags=(1001,))
        tri = topo.membrane_verts
        mtags = topo.membrane_tags
        if len(tri) > max_triangles:
            sel = np.linspace(0, len(tri) - 1, max_triangles).astype(int)
            tri, mtags = tri[sel], mtags[sel]
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        fig = plt.figure(figsize=(7, 6))
        ax3 = fig.add_subplot(111, projection="3d")
        polys = mesh.points[tri]
        col = Poly3DCollection(polys, linewidths=0.05)
        cmap = plt.get_cmap("tab20")
        col.set_facecolor(cmap((mtags % 20) / 20.0))
        ax3.add_collection3d(col)
        lo, hi = mesh.points.min(axis=0), mesh.points.max(axis=0)
        ax3.set_xlim(lo[0], hi[0])
        ax3.set_ylim(lo[1], hi[1])
        ax3.set_zlim(lo[2], hi[2])
        ax3.set_title("membrane surfaces (per-cell tags)")
        path = os.path.join(out_dir, "geometry_membranes.png")
        fig.savefig(path, dpi=130, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--mesh", required=True)
    ap.add_argument("--axis", default="z", choices=list("xyz"))
    ap.add_argument("--pos", type=float, default=0.5)
    ap.add_argument("--resolution", type=int, default=200)
    ap.add_argument("--out", default=".")
    args = ap.parse_args()
    for p in plot_geometry(args.mesh, axis=args.axis, pos=args.pos,
                           resolution=args.resolution, out_dir=args.out):
        print(p)


if __name__ == "__main__":
    main()
