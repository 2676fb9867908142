"""bench1 fused wall under GMG hierarchy/fusion variants (round-4 VERDICT
item 1: attack the fused V-cycle's serial depth — ~26 sweep-units of
latency-bound smoothing per Krylov iteration on the 100-50-25-12 hierarchy
with 8 in-kernel coarse sweeps).

The untried lever: SHALLOWER hierarchy + exact dense coarse via
fuse_vcycle='split_chain' (descent kernel -> external dense MXU solve ->
ascent kernel): a 25^2 (2602-dof) or 12^2 (626-dof) dense inverse is one
~0.01 ms matmul replacing the deepest level visits, and is a strictly
stronger coarse solve, so Krylov counts shouldn't rise (the round-3
rejection log only ever tried DEEPER: min_cells=5 -> worse).

Usage: python tools/probes/b1gmg_probe.py <fuse_vcycle> <min_cells> <dense_cap>
e.g.   python tools/probes/b1gmg_probe.py split_chain 25 3000
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
from pfhubbenchmarks_tpu.benchmarks.bench1 import make
from probe_util import agg_counts, traj_check

fv, mc, cap = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
pb = make()
pb = dataclasses.replace(pb, solver=dataclasses.replace(
    pb.solver, fuse_vcycle=fv, gmg_min_cells=mc,
    gmg_dense_coarse_max_dofs=cap))
runner = timeloop.Runner(pb)
runner.run_fused(end_time=0.2)             # warm compile
t0 = time.time(); res = runner.run_fused(); w1 = time.time() - t0
t0 = time.time(); res = runner.run_fused(); w2 = time.time() - t0
c = agg_counts(res)
print(f"b1gmg[{fv},mc={mc},cap={cap}] wall={w1:.3f}/{w2:.3f}s {c}")
traj_check(res.rows, "/root/reference/results/bench1_out.csv",
           f"b1 {fv} mc{mc}")
