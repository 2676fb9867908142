"""Bisect the bench1_3d fused-driver compile crash (round-4 VERDICT item 4:
the 50^3 whole-run program killed the axon worker 3x in rounds 2-3; no 3D
perf artifact exists).

Two independent suspects: program SIZE (the 3D step body under the drive's
nested while loops) and the MOSAIC kernels compiled inside that program
(the r3 bisection of the tiled kernels found the remote Mosaic compiler
fragile under composition). Cases:

  small   — 32^3 fused: same program structure, smaller kernels. Crash =>
            structure, not size.
  noplas  — 50^3 fused with use_pallas='off': full-size pure-XLA program.
            Survives => Mosaic kernels are the trigger; crash => size.
  full    — 50^3 default (known-crash control; run LAST).

Each case is its own process invocation so a worker crash is contained.

Usage: python tools/probes/b13d_bisect_probe.py small|noplas|full
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64

setup_compile_cache()
enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench1_3d import make
from probe_util import agg_counts

mode = sys.argv[1]
if mode == "small":
    pb = make(nx=32, ny=32, nz=32)
elif mode == "noplas":
    pb = make()
    pb = dataclasses.replace(pb, solver=dataclasses.replace(
        pb.solver, use_pallas="off"))
elif mode == "full":
    pb = make()
else:
    raise SystemExit(f"unknown mode {mode}")

runner = timeloop.Runner(pb)
t0 = time.time()
runner.run_fused(end_time=0.25)
print(f"b13d_bisect[{mode}] fused compile+warm: {time.time()-t0:.1f}s",
      flush=True)
t0 = time.time()
res = runner.run_fused()
w = time.time() - t0
c = agg_counts(res)
print(f"b13d_bisect[{mode}] wall={w:.1f}s {c} rows={len(res.rows)} "
      f"t_end={res.rows[-1,0]:.4g} TFE_end={res.rows[-1,1]:.8g}")
