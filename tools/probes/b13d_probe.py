"""bench1_3d perf probes.

Usage: python tools/probes/b13d_probe.py host|fused
  host  — re-time the host loop (now with the packed single-fetch scalar
          read, session E); r2 measured 387 s with ~46% host overhead.
  fused — retry the fused whole-run driver at 50^3 (compile crashed the
          axon worker twice in r2; retry after split-kernel landings).
"""
import os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64
setup_compile_cache(); enable_x64()
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench1_3d import make
from probe_util import agg_counts

mode = sys.argv[1]
pb = make()
runner = timeloop.Runner(pb)
if mode == "host":
    t0 = time.time(); res = runner.run(max_steps=1, verbose=False)
    print(f"compile+step1: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); res = runner.run(verbose=False); w = time.time() - t0
else:
    t0 = time.time(); runner.run_fused(end_time=0.25)
    print(f"fused compile+warm: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); res = runner.run_fused(); w = time.time() - t0
c = agg_counts(res)
print(f"b13d[{mode}] wall={w:.1f}s {c} rows={len(res.rows)} "
      f"t_end={res.rows[-1,0]:.4g} TFE_end={res.rows[-1,1]:.8g}")
