"""Generic fused-run config probe: apply SolverConfig overrides, run the
production fused driver on the TPU, print wall + iteration totals +
trajectory bounds vs the committed reference CSV.

Usage: python tools/probes/cfg_probe.py <bench> [key=val ...]
  e.g. python tools/probes/cfg_probe.py bench2 gmg_coarse_sweeps=8 gmg_min_cells=5
       python tools/probes/cfg_probe.py bench1 gmg_inner_mr=3
Values are parsed as int, then float, then left as strings.
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
from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from probe_util import agg_counts, traj_check

bench = sys.argv[1]


def parse(v):
    for t in (int, float):
        try:
            return t(v)
        except ValueError:
            pass
    return v


overrides = dict((k, parse(v)) for k, v in
                 (a.split("=", 1) for a in sys.argv[2:]))
reps = overrides.pop("reps", 2)
tag = ",".join(f"{k.replace('gmg_', '')}={v}" for k, v in overrides.items())
pb = get_benchmark(bench)
pb = dataclasses.replace(pb, solver=dataclasses.replace(
    pb.solver, **overrides))
runner = timeloop.Runner(pb)
# benchmarks that declare fused_seg_rows (bench1_3d) must run the segmented
# driver: a whole-run 50^3 dispatch crashes the remote worker (ROADMAP,
# round-4 session L)
seg = getattr(pb, "fused_seg_rows", None)
run = ((lambda **kw: runner.run_fused_segmented(seg_rows=seg, **kw))
       if seg else runner.run_fused)
t0 = time.time()
run(end_time=pb.time.t0 + 2.1 * pb.time.dt0)   # warm compile
compile_s = time.time() - t0
walls = []
for _ in range(reps):
    t0 = time.time()
    res = run()
    walls.append(time.time() - t0)
c = agg_counts(res)
print(f"{bench}[{tag}] wall={min(walls):.3f}s (reps {walls}) "
      f"compile={compile_s:.0f}s {c}", flush=True)
ref = f"/root/reference/results/{bench.split('@')[0]}_out.csv"
if not os.path.exists(ref):
    # no reference golden (3D benchmarks): self-consistency check against
    # our own committed trajectory so config probes still surface curve
    # regressions (label says so)
    ref = f"/root/repo/results/{bench.split('@')[0]}_out.csv"
    tag += " [vs committed self-trajectory]"
if os.path.exists(ref):
    traj_check(res.rows, ref, f"{bench} {tag}")
