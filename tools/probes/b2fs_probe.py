"""bench2 field-split preconditioner probe (TPU).

Round-4 VERDICT item 2: bench2 is apply-cost-bound (inner_mr and lag=solve
both rejected — ROADMAP session P); the 6-field monolithic V-cycle pays
~36 pinv plane-FMAs + the dense 6-field coupled tangent per sweep. The
split cycle (CH 2x2 block + 4 scalar AC blocks, SolverConfig.field_split)
pays 8 plane-FMAs with the AC cross-tangents symbolically zeroed. CPU lab
(fs_lab, t=3.59): trajectory IDENTICAL, accepted krylov +9% (1313->1433).

Usage: python tools/probes/b2fs_probe.py [0|1]
"""
import dataclasses, os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64
setup_compile_cache(); enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench2 import make
from probe_util import traj_check, agg_counts

fs = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
pb = make()
pb = dataclasses.replace(pb, solver=dataclasses.replace(
    pb.solver, field_split=fs))
runner = timeloop.Runner(pb)
runner.run_fused(end_time=0.2)             # warm compile
t0 = time.time(); res = runner.run_fused(); w1 = time.time() - t0
t0 = time.time(); res = runner.run_fused(); w2 = time.time() - t0
c = agg_counts(res)
print(f"b2fs[split={fs}] wall={w1:.3f}/{w2:.3f}s {c}")
traj_check(res.rows, "/root/reference/results/bench2_out.csv", f"b2 fs{fs}")
