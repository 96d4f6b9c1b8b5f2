"""Planar slice renders of checkpointed 3D fields (the pyvista-role
counterpart of reference `utils/plot_slices.py`, matplotlib-only).

Loads an npz checkpoint (io/checkpoint.py), rebuilds the generated mesh
from its spec, samples the requested fields on a regular grid in a slice
plane via barycentric point evaluation (io/pointeval.py), and writes one
PNG per field.

Usage:
    python scripts/plot_slices.py --checkpoint out/checkpoint_000005.npz \\
        --mesh generate:tissue16x8c [--fields phi_e phi_m Na_e] \\
        [--axis z --pos 0.5] [--resolution 200] [--out outdir]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_mesh(spec: str):
    if "generate:" in spec or not os.path.exists(spec):
        from knp_emi_cgx_tpu.mesh.generation import geometry_from_spec

        mesh, tagger = geometry_from_spec(spec)
    else:
        from knp_emi_cgx_tpu.io.xdmf import read_mesh_xdmf

        mesh = read_mesh_xdmf(spec, None)
        tagger = getattr(mesh, "_facet_tagger", None)
    mesh._facet_tagger = tagger
    return mesh


def slice_points(mesh, axis: str, pos: float, resolution: int):
    """Regular grid of points on the plane {axis = lo + pos*(hi-lo)}."""
    lo = mesh.points.min(axis=0)
    hi = mesh.points.max(axis=0)
    ax = "xyz".index(axis)
    others = [d for d in range(mesh.dim) if d != ax]
    eps = 1e-6 * (hi - lo).max()
    grids = [np.linspace(lo[d] + eps, hi[d] - eps, resolution)
             for d in others]
    U, V = np.meshgrid(*grids, indexing="ij")
    pts = np.zeros((resolution * resolution, mesh.dim))
    pts[:, others[0]] = U.ravel()
    pts[:, others[1]] = V.ravel()
    pts[:, ax] = lo[ax] + pos * (hi[ax] - lo[ax])
    return pts, (U, V), others


def field_arrays(state_fields: dict, field: str, n_ions: int = 3,
                 ion_names=("Na", "K", "Cl")):
    """Map a field name (phi_i/phi_e/phi_m/<ion>_{i,e}/n/m/h) to the
    [nV] vertex array inside the checkpointed state."""
    u = state_fields["u"]
    nvar = n_ions + 1
    if field == "phi_m":
        return state_fields["phi_m"]
    if field in ("n", "m", "h"):
        return state_fields[field]
    if field == "phi_i":
        return u[n_ions]
    if field == "phi_e":
        return u[nvar + n_ions]
    for k, name in enumerate(ion_names):
        if field == f"{name}_i":
            return u[k]
        if field == f"{name}_e":
            return u[nvar + k]
    raise ValueError(f"Unknown field {field}")


def plot_slices(checkpoint: str, mesh_spec: str, fields, axis="z", pos=0.5,
                resolution=150, out_dir="."):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from knp_emi_cgx_tpu.io.pointeval import PointEvaluator

    mesh = build_mesh(mesh_spec)
    data = np.load(checkpoint)
    state_fields = {k[len("state__"):]: data[k]
                    for k in data.files if k.startswith("state__")}

    if mesh.dim == 2:
        axis, pos = "z", 0.0   # degenerate: the whole 2D domain
    pts, (U, V), others = slice_points(mesh, axis, pos, resolution)

    # restrict the cell search to a slab around the plane (setup cost)
    ax = "xyz".index(axis) if mesh.dim == 3 else None
    subset = None
    if ax is not None:
        centroid = mesh.points[mesh.cells].mean(axis=1)[:, ax]
        h = (mesh.points.max(axis=0) - mesh.points.min(axis=0))[ax]
        target = pts[0, ax]
        subset = np.nonzero(np.abs(centroid - target) < 4 * h / resolution
                            + h * 0.05)[0]
        if len(subset) == 0:
            subset = None
    pe = PointEvaluator(mesh, pts, cells_subset=subset)

    written = []
    for field in fields:
        vals = pe(field_arrays(state_fields, field)).reshape(U.shape)
        fig, axp = plt.subplots(figsize=(6, 5))
        im = axp.pcolormesh(U, V, vals, shading="auto", cmap="viridis")
        fig.colorbar(im, ax=axp, label=field)
        axp.set_xlabel("xyz"[others[0]])
        axp.set_ylabel("xyz"[others[1]])
        axp.set_title(f"{field} @ {axis}={pos:.2f}, "
                      f"t={float(state_fields.get('t', 0.0)):.3e} s")
        path = os.path.join(out_dir, f"slice_{field}.png")
        fig.savefig(path, dpi=130, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mesh", required=True,
                    help="generate:<spec> or an XDMF path")
    ap.add_argument("--fields", nargs="+",
                    default=["phi_e", "phi_m", "K_e"])
    ap.add_argument("--axis", default="z", choices=list("xyz"))
    ap.add_argument("--pos", type=float, default=0.5)
    ap.add_argument("--resolution", type=int, default=150)
    ap.add_argument("--out", default=".")
    args = ap.parse_args()
    for p in plot_slices(args.checkpoint, args.mesh, args.fields,
                         axis=args.axis, pos=args.pos,
                         resolution=args.resolution, out_dir=args.out):
        print(p)


if __name__ == "__main__":
    main()
