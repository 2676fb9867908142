"""Separate per-launch overhead from in-kernel work in the fused kernels.

Times, per launch under a lax.scan chain (device-only, no tunnel RTT):
  - make_pallas_jvp: ONE J.v op per launch
  - make_pallas_lmr_sweep_loop at n_sweeps in {1,2,4,8,16}: n sweeps/launch

A linear fit t(n) = a + b*n over the sweep ladder gives a = per-launch
overhead (Mosaic dispatch + operand staging) and b = true in-kernel cost
of one LMR sweep (Pinv apply + J.v + 2 reductions + 2 updates). This
decides where bench1's remaining 0.3 ms/Krylov-iter lives: if a dominates,
the next multiplier is FEWER LAUNCHES per iteration (multi-iteration /
inner-MR kernels); if b does, it's less in-kernel serial depth.

Usage: python tools/probes/kernel_ladder_probe.py [bench] [reps]
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
import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from pfhubbenchmarks_tpu.ops.pallas_residual import (make_pallas_jvp,
                                                     make_pallas_lmr_sweep_loop)
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi

bench = sys.argv[1] if len(sys.argv) > 1 else "bench1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 400

pb = get_benchmark(bench)
rule = pb.solver.precond_rule
g = dataclasses.replace(pb.grid, rule_name=rule) if rule else pb.grid
F = len(pb.field_names)
terms = pb.terms
w = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32),
                           pb.initial_state())
dt = jnp.asarray(pb.time.dt0, jnp.float32)
bj = make_block_jacobi(g, terms, F, dirichlet=(), dtype=jnp.float32)(w, w, dt)
pv, pm = bj.pinv_planes
r = jax.tree_util.tree_map(lambda a: jnp.ones_like(a), w)


def timeit(f, *args):
    out = jax.block_until_ready(f(*args))  # compile
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    return (time.time() - t0) / reps * 1e3


# one J.v per launch
jv = make_pallas_jvp(g, terms, F, dtype=jnp.float32)


@jax.jit
def chain_jv(x):
    def body(c, _):
        return jv(w, w, dt, c), None

    out, _ = jax.lax.scan(body, x, None, length=reps)
    return out


print(f"{bench} jvp(1 op/launch): {timeit(chain_jv, r):.4f} ms/launch",
      flush=True)

pts = []
for n in (1, 2, 4, 8, 16):
    kern = make_pallas_lmr_sweep_loop(g, terms, F, dtype=jnp.float32,
                                      n_sweeps=n)

    @jax.jit
    def chain_sw(x0, r0):
        def body(c, _):
            x, rr = kern(c[0], c[1], w, w, dt, pv, pm)
            return (x, rr), None

        out, _ = jax.lax.scan(body, (x0, r0), None, length=reps)
        return out

    ms = timeit(chain_sw, jax.tree_util.tree_map(jnp.zeros_like, r), r)
    pts.append((n, ms))
    print(f"{bench} sweep_loop n={n:2d}: {ms:.4f} ms/launch", flush=True)

ns = np.array([p[0] for p in pts], float)
ts = np.array([p[1] for p in pts], float)
b_fit, a_fit = np.polyfit(ns, ts, 1)
print(f"fit: launch_overhead a={a_fit*1e3:.1f} us, per-sweep b={b_fit*1e3:.1f} us"
      f"  (V-cycle ~{(ts[0] - b_fit):.3f} ms of overhead if 1 launch)",
      flush=True)
