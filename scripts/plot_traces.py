"""Plot point traces from a run's npy exports (the reference's
utils/plot_point*.py equivalents, matplotlib-only).

Usage: python scripts/plot_traces.py <output_dir>
"""
import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main(out_dir):
    def load(name):
        p = os.path.join(out_dir, name)
        return np.load(p) if os.path.exists(p) else None

    phi_m = load("phi_m.npy")
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    if phi_m is not None:
        axes[0].plot(phi_m)
        axes[0].set_title("Membrane potential [mV]")
        axes[0].set_xlabel("step")
    gates = [(load(f"{g}.npy"), g) for g in ("n", "m", "h")]
    for vals, name in gates:
        if vals is not None:
            axes[1].plot(vals, label=name)
    axes[1].set_title("Gating variables")
    axes[1].legend()
    out = os.path.join(out_dir, "traces.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "./output/")
