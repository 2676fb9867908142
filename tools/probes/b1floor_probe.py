"""bench1 accuracy-floor experiment (round-4 VERDICT item 2).

The committed bench1 replay tracks results/bench1_out.csv at TFE 7.5e-6 on
the full 73-row reference grid. Is that OUR bias or the two-solver noise
floor of the committed data?  Same experiment design as the bench3
adjudication (ROADMAP "bench3 solid-fraction discrepancy"): replay the
reference's exact time grid with Newton tightened 1000x (atol 1e-9) and the
whole Krylov path in f64 (mixed_precision off).  If the per-row TFE error is
unchanged, 7.5e-6 is the floor of the reference data (both sides solve to
||F|| < 1e-6, /root/reference/dolfin/bench1.py:87); if it moves, we have a
real quadrature/precision bias to chase.

Usage: python tools/probes/b1floor_probe.py [tight|default]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64

setup_compile_cache()
enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench1 import make

mode = sys.argv[1] if len(sys.argv) > 1 else "tight"
ref = np.loadtxt("/root/reference/results/bench1_out.csv", delimiter=",",
                 skiprows=1)
pb = make()
if mode == "tight":
    pb = dataclasses.replace(pb, solver=dataclasses.replace(
        pb.solver, newton_atol=1e-9, krylov_rtol=1e-8,
        mixed_precision=False))
t0 = time.time()
res = timeloop.run(pb, time_grid=ref[:, 0], verbose=False,
                   replay_partial=True, replay_substep_fallback=True)
wall = time.time() - t0
rows = np.asarray(res.rows)
n = min(len(rows), len(ref))
rel = np.abs(rows[:n, 1] - ref[:n, 1]) / np.abs(ref[:n, 1])
print(f"b1floor[{mode}] rows={n}/{len(ref)} wall={wall:.1f}s "
      f"TFE max={rel.max():.6e} median={np.median(rel):.3e}")
# per-row profile: where does the error live?
for i in range(0, n, 8):
    print(f"  row {i:2d} t={rows[i,0]:9.2f} relerr={rel[i]:.3e}")
print(f"  row {n-1:2d} t={rows[n-1,0]:9.2f} relerr={rel[n-1]:.3e}")
