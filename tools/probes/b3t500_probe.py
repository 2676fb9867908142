"""bench3 to T=500 — the reference's own recorded operating point
(dolfin/bench3.py:123-126: cp line search, 25 s at 128 MPI cores for
T=500). Our committed artifacts stop at T=100 (where the golden CSV
ends), so every speedup claim for bench3 so far divided mismatched
workloads. This records the apples-to-apples number for the
per-benchmark baseline JSON; the t<=103 prefix is still gated against
the reference rows.

Usage: python tools/probes/b3t500_probe.py [end_time]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64

setup_compile_cache()
enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench3 import make
from probe_util import agg_counts, traj_check

end = float(sys.argv[1]) if len(sys.argv) > 1 else 500.0
pb = make()
runner = timeloop.Runner(pb)
runner.run_fused(end_time=pb.time.dt0 * 2)   # warm compile
t0 = time.time(); res = runner.run_fused(end_time=end); w1 = time.time() - t0
t0 = time.time(); res = runner.run_fused(end_time=end); w2 = time.time() - t0
c = agg_counts(res)
rows = res.rows
print(f"b3t500[end={end}] wall={w1:.3f}/{w2:.3f}s rows={len(rows)} "
      f"t_end={float(rows[-1][0]):.6g} {c}")
traj_check(res.rows, "/root/reference/results/bench3_out.csv", "b3 t500")
