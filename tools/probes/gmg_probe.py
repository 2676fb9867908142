"""Fused wall under GMG hierarchy/fusion variants, any 2D benchmark
(successor of b1gmg_probe.py; round-4 VERDICT item 1 — serial-depth cuts).

split_chain + a GOOD dense coarse (mxu_inverse, not the bf16-poisoned
jnp.linalg.inv — chain_r16 measured 87570 vs 6034 Krylov iters through
the broken one) removes the deepest level visits from the fused kernel:
bench1's default 100-50-25-12 V-cycle spends ~14 of ~26 serial sweep-units
below the 50 level.

Usage: python tools/probes/gmg_probe.py <bench> <fuse_vcycle> <min_cells> <dense_cap> [nu]
e.g.   python tools/probes/gmg_probe.py bench1 split_chain 25 3000
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

bench, fv, mc, cap = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
over = {}
if len(sys.argv) > 5:
    over = dict(gmg_nu_pre=int(sys.argv[5]), gmg_nu_post=int(sys.argv[5]))
pb = get_benchmark(bench)
pb = dataclasses.replace(pb, solver=dataclasses.replace(
    pb.solver, fuse_vcycle=fv, gmg_min_cells=mc,
    gmg_dense_coarse_max_dofs=cap, **over))
runner = timeloop.Runner(pb)
runner.run_fused(end_time=pb.time.t0 + 2.1 * pb.time.dt0)   # warm compile
t0 = time.time(); res = runner.run_fused(); w1 = time.time() - t0
t0 = time.time(); res = runner.run_fused(); w2 = time.time() - t0
c = agg_counts(res)
tag = f"{bench} {fv} mc{mc} cap{cap}" + (f" nu{sys.argv[5]}" if over else "")
print(f"gmg[{tag}] wall={w1:.3f}/{w2:.3f}s {c}")
ref = f"/root/reference/results/{bench}_out.csv"
if os.path.exists(ref):
    traj_check(res.rows, ref, tag)
