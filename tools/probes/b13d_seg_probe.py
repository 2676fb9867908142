"""bench1_3d fused-SEGMENTED wall on TPU (round-4 VERDICT item 4).

One whole-run dispatch at 50³ crashes the remote worker during execution
(chain_r19 bisect: with and without Pallas; a ~48 s dispatch completes),
so the production path drives the same compiled fused program in
``fused_seg_rows``-step segments (timeloop.run_fused_segmented).

Usage: python tools/probes/b13d_seg_probe.py [seg_rows]
Prints compile time, warm segmented wall, iteration totals, and the
host-loop baseline comparison (387 s measured r2; packed-fetch host loop
re-measure pending).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64

setup_compile_cache()
enable_x64()
import dataclasses

from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from probe_util import agg_counts

seg = int(sys.argv[1]) if len(sys.argv) > 1 else 4
pb = get_benchmark("bench1_3d")
pb = dataclasses.replace(pb, fused_seg_rows=seg)
runner = timeloop.Runner(pb)
t0 = time.time()
runner.run_fused(end_time=pb.time.t0 + 2.1 * pb.time.dt0,
                 max_rows=seg, allow_partial=True)
compile_s = time.time() - t0
t0 = time.time()
res = runner.run_fused_segmented(seg_rows=seg)
w = time.time() - t0
c = agg_counts(res)
print(f"b13d_seg[{seg}] compile={compile_s:.1f}s wall={w:.1f}s "
      f"{c} rows={len(res.rows)} t_end={res.rows[-1,0]:.4g} "
      f"TFE_end={res.rows[-1,1]:.4f}")
