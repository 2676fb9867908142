"""bench2 fused wall under solver-config tweaks untested on the 6-field
system: in-kernel coarse sweeps (bench1's 24->8 cut wall 9%) and symmetric
nu 3/3 (bench1's and bench3's measured optimum).

Usage: python tools/probes/b2cfg_probe.py <coarse_sweeps> <nu>
"""
import dataclasses, os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64
setup_compile_cache(); enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench2 import make
from probe_util import traj_check, agg_counts

cs, nu = int(sys.argv[1]), int(sys.argv[2])
pb = make()
pb = dataclasses.replace(pb, solver=dataclasses.replace(
    pb.solver, gmg_coarse_sweeps=cs, gmg_nu_pre=nu, gmg_nu_post=nu))
runner = timeloop.Runner(pb)
runner.run_fused(end_time=0.2)             # warm compile
t0 = time.time(); res = runner.run_fused(); w1 = time.time() - t0
t0 = time.time(); res = runner.run_fused(); w2 = time.time() - t0
c = agg_counts(res)
print(f"b2cfg[cs={cs},nu={nu}] wall={w1:.3f}/{w2:.3f}s {c}")
traj_check(res.rows, "/root/reference/results/bench2_out.csv", f"b2 cs{cs} nu{nu}")
