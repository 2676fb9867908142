"""Per-application V-cycle timing by fusion mode (round-4: the bench1
trace shows ~0.005 s total custom-call time over a 2.1 s run — is the
whole-fused Pallas kernel even engaged, and what does one preconditioner
application actually cost per path?).

For each fuse_vcycle mode: build the production preconditioner exactly as
the Runner does, report whether the fused (z, Az) pair is exposed, and
time N blocked applications of Minv (and minv_matvec when present).

Usage: python tools/probes/vcycle_timing_probe.py <bench> [reps]
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

from pfhubbenchmarks_tpu.benchmarks import get_benchmark

bench = sys.argv[1] if len(sys.argv) > 1 else "bench1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 200

pb0 = get_benchmark(bench)
w = pb0.initial_state()
dt = pb0.time.dt0
r = jax.tree_util.tree_map(lambda a: jnp.ones_like(a, jnp.float32), w)

for mode in ("auto", "split_chain", "off"):
    pb = dataclasses.replace(pb0, solver=dataclasses.replace(
        pb0.solver, fuse_vcycle=mode))
    try:
        build = pb.precond_builder()
        Minv = build(w, w, dt)
    except Exception as e:  # noqa: BLE001 - probe reports and moves on
        print(f"{bench}[{mode}] build failed: {type(e).__name__}: {e}")
        continue
    pair = getattr(Minv, "minv_matvec", None)

    # chained applications under ONE dispatch: device-only per-application
    # time, free of the tunnel's per-dispatch RTT
    def chain(x):
        def body(c, _):
            return Minv(c), None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    f = jax.jit(chain)
    z = jax.block_until_ready(f(r))          # compile
    t0 = time.time()
    z = jax.block_until_ready(f(r))
    ms = (time.time() - t0) / reps * 1e3
    line = f"{bench}[{mode}] pair={'yes' if pair else 'no'} Minv={ms:.4f} ms/apply"
    if pair is not None:

        def chain_pair(x):
            def body(c, _):
                zz, az = pair(c)
                return az, None

            out, _ = jax.lax.scan(body, x, None, length=reps)
            return out

        g = jax.jit(chain_pair)
        za = jax.block_until_ready(g(r))
        t0 = time.time()
        za = jax.block_until_ready(g(r))
        line += f" minv_matvec={(time.time() - t0) / reps * 1e3:.4f} ms/apply"
    print(line, flush=True)
