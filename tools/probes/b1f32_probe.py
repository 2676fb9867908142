"""bench1 f32-native throughput mode, fused, full run + trajectory check.

The f64 Newton layer is EMULATED on this TPU; f32-native with rescaled
tolerances (the registry --f32 rescaling) tracked the f64 trajectory to t=22
at TFE ~3e-7 rel (session E). Measure the FULL run wall + curve error here.
NOTE: x64 stays OFF (mirrors registry.py:81).
"""
import dataclasses, os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import setup_compile_cache
setup_compile_cache()
import jax.numpy as jnp
from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench1 import make
from probe_util import traj_check, agg_counts

pb = make(dtype=jnp.float32)
pb = dataclasses.replace(pb, solver=dataclasses.replace(
    pb.solver, newton_atol=1e-4, newton_rtol=1e-5,
    krylov_rtol=1e-4, mixed_precision=False))
runner = timeloop.Runner(pb)
runner.run_fused(end_time=0.2)
t0 = time.time(); res = runner.run_fused(); w1 = time.time() - t0
t0 = time.time(); res = runner.run_fused(); w2 = time.time() - t0
c = agg_counts(res)
print(f"b1f32 wall={w1:.3f}/{w2:.3f}s {c}")
traj_check(res.rows, "/root/reference/results/bench1_out.csv", "b1 f32")
