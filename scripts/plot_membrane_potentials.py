"""Membrane-potential-over-time traces from a checkpoint series (the
matplotlib counterpart of reference `utils/plot_membrane_potentials.py`:
per-cell phi_m traces read back from checkpoints, sampled at the membrane
vertex closest to each cell's centroid).

Reads every `checkpoint_*.npz` in an output directory (io/checkpoint.py
series written by `save_cpoints`), rebuilds the generated mesh from its
spec, and plots one phi_m(t) line per requested biological cell tag.

Usage:
    python scripts/plot_membrane_potentials.py --outdir output/tissue_run \\
        --mesh generate:tissue16x8c [--cells 2 3] [--out traces.png]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_series(outdir: str):
    """All checkpoints in step order -> (steps, list of state dicts)."""
    files = sorted(glob.glob(os.path.join(outdir, "checkpoint_*.npz")))
    if not files:
        raise FileNotFoundError(f"no checkpoint_*.npz in {outdir}")
    steps, states = [], []
    for f in files:
        data = np.load(f)
        states.append({k[len("state__"):]: data[k]
                       for k in data.files if k.startswith("state__")})
        steps.append(int(os.path.basename(f)[len("checkpoint_"):-len(".npz")]))
    return steps, states


def membrane_probe_vertices(mesh, cell_tags_wanted):
    """For each biological cell tag, the membrane vertex closest to that
    cell's centroid (reference plot_membrane_potentials.py picks the
    gamma vertex nearest the cell centroid)."""
    from knp_emi_cgx_tpu.mesh.topology import build_topology

    ct = mesh.cell_tags
    intra = tuple(int(t) for t in np.unique(ct) if t != 1)
    topo = build_topology(mesh, facet_tagger=mesh._facet_tagger,
                          intra_tags=intra, extra_tag=(1,),
                          gamma_tags=intra,
                          boundary_tags=(1001, 3))
    probes = {}
    for tag in cell_tags_wanted:
        on_tag = topo.membrane_tags == tag
        verts = np.unique(topo.membrane_verts[on_tag])
        if len(verts) == 0:
            raise ValueError(f"cell tag {tag} has no membrane facets")
        centroid = mesh.points[mesh.cells[ct == tag]].mean(axis=(0, 1))
        d = np.linalg.norm(mesh.points[verts] - centroid, axis=1)
        probes[tag] = int(verts[np.argmin(d)])
    return probes


def plot_membrane_potentials(outdir: str, mesh_spec: str, cells=None,
                             out_path=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from plot_slices import build_mesh

    mesh = build_mesh(mesh_spec)
    steps, states = load_series(outdir)
    if cells is None:
        tags = np.unique(mesh.cell_tags)
        cells = [int(t) for t in tags if t != 1][:8]
    probes = membrane_probe_vertices(mesh, cells)

    times = [float(s.get("t", i)) for i, s in enumerate(states)]
    fig, ax = plt.subplots(figsize=(8, 5))
    for tag, v in probes.items():
        trace = [1e3 * float(s["phi_m"][v]) for s in states]
        ax.plot(np.asarray(times) * 1e3, trace, label=f"cell {tag}")
    ax.set_xlabel("t [ms]")
    ax.set_ylabel(r"$\phi_m$ [mV]")
    ax.set_title("Membrane potentials (from checkpoints)")
    ax.legend(fontsize=8, ncol=2)
    ax.grid(alpha=0.3)
    if out_path is None:
        out_path = os.path.join(outdir, "membrane_potentials.png")
    fig.savefig(out_path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--outdir", required=True,
                    help="run output dir containing checkpoint_*.npz")
    ap.add_argument("--mesh", required=True,
                    help="generate:<spec> or an XDMF path")
    ap.add_argument("--cells", nargs="*", type=int, default=None,
                    help="biological cell tags to trace (default: first 8)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    print(plot_membrane_potentials(args.outdir, args.mesh, args.cells,
                                   args.out))


if __name__ == "__main__":
    main()
