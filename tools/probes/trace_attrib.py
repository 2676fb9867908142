"""Per-op device-time attribution for a fused benchmark run (VERDICT r3
weak 7: no MFU/FLOP attribution existed for bench2/bench3, the only
FLOP-carrying workloads — without it the next perf round can't tell
serial-depth-bound from HBM-bound from launch-bound).

Runs one warmed fused adaptive run under jax.profiler.trace, then parses
the xplane protobuf (jax._src.profiler.ProfileData) and aggregates device
plane event durations by op-name bucket.

Usage: python tools/probes/trace_attrib.py <bench1|bench2|bench3|bench6>
"""
import collections
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64

setup_compile_cache()
enable_x64()
import jax

from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks import get_benchmark

name = sys.argv[1] if len(sys.argv) > 1 else "bench1"
# trace overhead is ~80 us/event on the host (bench2's full run: 5M events,
# 11 s -> 446 s traced); trace a representative prefix instead
end = float(sys.argv[2]) if len(sys.argv) > 2 else None
pb = get_benchmark(name)
runner = timeloop.Runner(pb)
runner.run_fused(end_time=pb.time.dt0 * 2)  # warm compile
tdir = f"/tmp/trace_{name}_{int(time.time())}"
kw = {} if end is None else {"end_time": end}
t0 = time.time()
with jax.profiler.trace(tdir):
    res = runner.run_fused(**kw)
wall = time.time() - t0
print(f"{name} fused wall={wall:.3f}s rows={len(res.rows)} trace={tdir}")

files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
assert files, f"no xplane under {tdir}"
from jax._src.profiler import ProfileData

data = ProfileData.from_file(files[0])


def bucket(opname: str) -> str:
    n = opname.lower()
    for key in ("fusion", "custom-call", "dynamic-update-slice", "dynamic-slice",
                "copy", "convert", "dot", "reduce", "scatter", "gather",
                "broadcast", "iota", "transpose", "while", "select", "add",
                "multiply", "subtract"):
        if key in n:
            return key
    return "other"


# Aggregate PER LINE: a device plane carries several timelines ("XLA
# Modules" = whole-program spans, "XLA Ops" = non-overlapping leaf op
# executions, async-activity lines = start->done spans that overlap real
# work). Only within one line do durations sum meaningfully; the leaf-op
# line (most events) is the one that attributes busy time.
for plane in data.planes:
    pname = plane.name
    if "TPU" not in pname and "/device" not in pname.lower():
        continue
    for line in plane.lines:
        per_op = collections.Counter()
        per_bucket = collections.Counter()
        nevents = 0
        for ev in line.events:
            dur = ev.duration_ns
            nm = ev.name
            per_op[nm] += dur
            per_bucket[bucket(nm)] += dur
            nevents += 1
        tot = sum(per_bucket.values())
        if not tot:
            continue
        print(f"\n== plane {pname} | line {line.name}: {nevents} events, "
              f"{tot/1e9:.3f} s summed ==")
        print("-- buckets --")
        for k, v in per_bucket.most_common(12):
            print(f"  {k:24s} {v/1e9:8.3f} s  {100*v/tot:5.1f}%")
        print("-- top 25 ops --")
        for k, v in per_op.most_common(25):
            print(f"  {v/1e9:8.3f} s  {100*v/tot:5.1f}%  {k[:110]}")
