"""Post-processing curves: the stats.jl equivalent (reference stats.jl:1-58).

Reads results/bench*_out.csv and emits PNG curves:
  - total free energy vs time (log-x), optionally overlaid on the committed
    reference CSVs for visual parity checking,
  - normalized solute / solid fraction vs time.

Usage: python tools/plot_results.py [--results DIR] [--reference DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BENCHES = {
    "bench1": ("total_solute", "solute / solute(0)"),
    "bench2": ("total_solute", "solute / solute(0)"),
    "bench3": ("solid_fraction", "solid fraction"),
    "bench6": ("total_solute", "solute / solute(0)"),
}


def load(path):
    return np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results")
    ap.add_argument("--reference", default="/root/reference/results")
    ap.add_argument("--out", default="results")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for name, (col2, label2) in BENCHES.items():
        path = os.path.join(args.results, f"{name}_out.csv")
        if not os.path.exists(path):
            continue
        data = load(path)
        ref_path = os.path.join(args.reference, f"{name}_out.csv")
        ref = load(ref_path) if os.path.exists(ref_path) else None

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.semilogx(data[:, 0], data[:, 1], "b.-", label="pfhubbenchmarks_tpu")
        if ref is not None:
            ax.semilogx(ref[:, 0], ref[:, 1], "r--", label="reference (FEniCS)")
        ax.set_xlabel("time")
        ax.set_ylabel("total free energy")
        ax.set_title(f"{name}: free energy")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"{name}_E.png"), dpi=120)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(6, 4))
        norm = data[0, 2] if col2 == "total_solute" else 1.0
        ax.plot(data[:, 0], data[:, 2] / norm, "b.-", label="pfhubbenchmarks_tpu")
        if ref is not None:
            rnorm = ref[0, 2] if col2 == "total_solute" else 1.0
            ax.plot(ref[:, 0], ref[:, 2] / rnorm, "r--", label="reference")
        ax.set_xlabel("time")
        ax.set_ylabel(label2)
        ax.set_title(f"{name}: {col2}")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"{name}_{'S' if 'solid' in col2 else 'C'}.png"),
                    dpi=120)
        plt.close(fig)
        print(f"plotted {name}")


if __name__ == "__main__":
    main()
