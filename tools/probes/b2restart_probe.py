"""bench2 fused wall at a given FGMRES restart width.

Usage: python tools/probes/b2restart_probe.py <restart>
"""
import dataclasses, os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64
setup_compile_cache(); enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench2 import make
from probe_util import traj_check, agg_counts

m = int(sys.argv[1])
pb = make()
pb = dataclasses.replace(pb, solver=dataclasses.replace(
    pb.solver, gmres_restart=m))
runner = timeloop.Runner(pb)
runner.run_fused(end_time=0.2)             # warm compile
t0 = time.time(); res = runner.run_fused(); w1 = time.time() - t0
t0 = time.time(); res = runner.run_fused(); w2 = time.time() - t0
c = agg_counts(res)
print(f"b2restart[{m}] wall={w1:.3f}/{w2:.3f}s {c}")
traj_check(res.rows, "/root/reference/results/bench2_out.csv", f"b2 m={m}")
