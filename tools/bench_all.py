"""Run the full benchmark suite and report wall times + reference parity.

The quantitative record the reference keeps in code comments
(dolfin/bench2.py:139-143 etc.) as a reproducible harness. Writes
results/<bench>_out.csv and prints one summary line per benchmark.

Usage: python tools/bench_all.py [--fused] [bench1 bench2 ...]

``--fused`` drives each run through timeloop.run_fused (ONE device
dispatch per benchmark) — the production fast path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64
setup_compile_cache(); enable_x64()
import numpy as np
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from pfhubbenchmarks_tpu.io.csvout import write_csv

args = sys.argv[1:]
fused = "--fused" in args
names = [a for a in args if not a.startswith("--")] or [
    "bench1", "bench2", "bench6", "bench3", "bench1_3d", "elast"]
for name in names:
    pb = get_benchmark(name)
    runner = timeloop.Runner(pb)
    use_fused = fused and (pb.abort_condition is None
                           or getattr(pb, "abort_device", None) is not None)
    t0 = time.time()
    if use_fused:
        runner.run_fused(end_time=pb.time.t0 + 2.1 * pb.time.dt0)
    else:
        runner.run(max_steps=1, verbose=False)
    compile_s = time.time() - t0
    t0 = time.time()
    res = runner.run_fused() if use_fused else runner.run(verbose=False)
    wall = time.time() - t0
    write_csv(f"results/{name}_out.csv", res.rows, res.columns)
    line = (f"{name}: steps={len(res.rows)} wall={wall:.1f}s "
            f"compile={compile_s:.0f}s t_final={res.rows[-1,0]:.4g}")
    refp = f"/root/reference/results/{name}_out.csv"
    if os.path.exists(refp):
        ref = np.loadtxt(refp, delimiter=",", skiprows=1)
        n = min(len(res.rows), len(ref))
        m = np.isclose(res.rows[:n, 0], ref[:n, 0])
        k = int(np.argmin(m)) if not m.all() else n
        err = (abs(res.rows[:k, 1] - ref[:k, 1]) / abs(ref[:k, 1])).max() if k else float("nan")
        line += f" ref_steps={len(ref)} prefix_match={k} TFE_relerr={err:.2e}"
    print(line, flush=True)
