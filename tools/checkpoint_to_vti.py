"""Convert a saved checkpoint to a VTI snapshot — the HDF5->PVD conversion
workflow of the reference (dolfin/process_bench1.py:8-43, b1_read.py:9-30)
on our npz checkpoints.

Usage: python tools/checkpoint_to_vti.py CKPT.npz BENCH OUT.vti [--nx N --ny N]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("bench")
    ap.add_argument("out")
    ap.add_argument("--nx", type=int, default=None)
    ap.add_argument("--ny", type=int, default=None)
    args = ap.parse_args()

    from pfhubbenchmarks_tpu.benchmarks import get_benchmark
    from pfhubbenchmarks_tpu.io.vti import write_state_vti

    kwargs = {}
    if args.nx:
        kwargs["nx"] = args.nx
    if args.ny:
        kwargs["ny"] = args.ny
    problem = get_benchmark(args.bench, **kwargs)
    z = np.load(args.ckpt)
    write_state_vti(args.out, problem.grid, (z["v"], z["m"]), problem.field_names)
    print(f"wrote {args.out} (t={float(z['t'])}, step={int(z['step'])})")


if __name__ == "__main__":
    main()
