"""Point-value traces from a checkpoint series (the counterpart of
reference `utils/plot_point_checkpoint.py:22-36`: read each checkpoint,
evaluate the ion concentration fields at a point, plot value-vs-time in a
rows x {intra, extra} subplot grid).

Usage:
    python scripts/plot_point_checkpoint.py --outdir output/tissue_run \\
        --mesh generate:tissue16x8c --point 0.5 0.5 0.5 \\
        [--vars Na K Cl] [--out point_values.png]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def plot_point_checkpoint(outdir: str, mesh_spec: str, point,
                          ions=("Na", "K", "Cl"), out_path=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from knp_emi_cgx_tpu.io.pointeval import PointEvaluator
    from plot_membrane_potentials import load_series
    from plot_slices import build_mesh, field_arrays

    mesh = build_mesh(mesh_spec)
    steps, states = load_series(outdir)
    pe = PointEvaluator(mesh, np.asarray(point, dtype=float)[None, :])
    times = np.asarray([float(s.get("t", i)) for i, s in enumerate(states)])

    fig, ax = plt.subplots(figsize=(10, 2.6 * len(ions)),
                           nrows=len(ions), ncols=2, squeeze=False)
    for col, side in enumerate(("i", "e")):
        for row, ion in enumerate(ions):
            var = f"{ion}_{side}"
            vals = [float(pe(field_arrays(s, var))[0]) for s in states]
            a = ax[row][col]
            a.plot(times * 1e3, vals, label=var)
            a.set_ylabel(f"{var} [mM]")
            a.legend(fontsize=8)
            a.grid(alpha=0.3)
    ax[-1][0].set_xlabel("t [ms]")
    ax[-1][1].set_xlabel("t [ms]")
    fig.suptitle(f"Point values at {tuple(float(p) for p in point)} "
                 "(from checkpoints)")
    fig.tight_layout()
    if out_path is None:
        out_path = os.path.join(outdir, "point_values_from_checkpoint.png")
    fig.savefig(out_path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--mesh", required=True)
    ap.add_argument("--point", nargs="+", type=float, required=True)
    ap.add_argument("--vars", nargs="*", default=["Na", "K", "Cl"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    print(plot_point_checkpoint(args.outdir, args.mesh, args.point,
                                ions=args.vars, out_path=args.out))


if __name__ == "__main__":
    main()
