"""Scaling/perf plot from bench JSON lines (the reference's
utils/plot_scaling.py hardcodes its cluster timings; ours reads BENCH_r*.json
or any file of bench.py output lines).

Usage: python scripts/plot_scaling.py BENCH_r1.json [more...]
"""
import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REFERENCE_CPU_US_PER_DOF_STEP = 5.94  # plot_scaling.py:6-8 density estimate


def main(paths):
    labels, vals = [], []
    for p in paths:
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                d = json.loads(line)
                labels.append(p.split("/")[-1])
                vals.append(d["value"])
    fig, ax = plt.subplots()
    ax.bar(range(len(vals)), vals, tick_label=labels)
    ax.axhline(REFERENCE_CPU_US_PER_DOF_STEP, color="red", ls="--",
               label="reference CPU 1-core density")
    ax.set_yscale("log")
    ax.set_ylabel("us / dof / step (lower is better)")
    ax.legend()
    fig.savefig("scaling.png", dpi=120)
    print("wrote scaling.png")


if __name__ == "__main__":
    main(sys.argv[1:])
