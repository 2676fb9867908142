"""BM2 free-energy landscape contour — bench2_fchem.jl equivalent
(reference bench2_fchem.jl:4-22): f_chem(c, eta) over [0,1]^2 with the
remaining order parameters at 0; a design/debugging aid for the 4-well
structure.

Usage: python tools/fchem_landscape.py [--out results/bench2_fchem.png]
"""

from __future__ import annotations

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/bench2_fchem.png")
    args = ap.parse_args()

    from pfhubbenchmarks_tpu.benchmarks.bench2 import Bench2Params
    from pfhubbenchmarks_tpu.models import forms

    p = Bench2Params()
    c, e = np.meshgrid(np.linspace(0, 1, 201), np.linspace(0, 1, 201))
    rho2 = p.rho ** 2
    H = forms.h(e)
    f = (rho2 * (c - p.c_alpha) ** 2 * (1 - H)
         + rho2 * (c - p.c_beta) ** 2 * H
         + p.w * e**2 * (1 - e) ** 2)

    fig, ax = plt.subplots(figsize=(6, 5))
    cs = ax.contourf(c, e, f, levels=40)
    fig.colorbar(cs, ax=ax, label="f_chem")
    ax.set_xlabel("c")
    ax.set_ylabel("eta")
    ax.set_title("BM2 chemical free energy landscape")
    fig.tight_layout()
    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
