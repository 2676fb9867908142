"""bench3 Eisenstat-Walker forcing probe on TPU (the one open EW verdict).

Usage: python tools/probes/b3ew_probe.py <ew_dt_min | fixed>
Runs the fused production path, prints wall + iteration totals + trajectory
bounds vs the reference CSV (bounds: prefix>=14, interp TFE<=2e-4).
"""
import dataclasses, os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64
setup_compile_cache(); enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench3 import make
from probe_util import traj_check, agg_counts

arg = sys.argv[1]
pb = make()
if arg != "fixed":
    pb = dataclasses.replace(pb, solver=dataclasses.replace(
        pb.solver, krylov_forcing="ew", ew_eta0=0.1, ew_eta_max=0.3,
        ew_dt_min=float(arg)))
runner = timeloop.Runner(pb)
runner.run_fused(end_time=0.05)            # warm compile
t0 = time.time(); res = runner.run_fused(); wall = time.time() - t0
c = agg_counts(res)
print(f"b3ew[{arg}] wall={wall:.2f}s {c}")
traj_check(res.rows, "/root/reference/results/bench3_out.csv", f"b3ew {arg}")
