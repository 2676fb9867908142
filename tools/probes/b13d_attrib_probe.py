"""bench1_3d per-V-cycle attribution (round-5: the ≤60 s ask needs to know
where the 14.3 ms/krylov_all goes — chain_r32 b13d_seg[8]: 8604 iters,
123.4 s).

Times, each as a chained-scan device-only ms/apply:
  Minv@kcycle=k       — the production preconditioner for k in 1..4
                        (kcycle multiplies LEVEL-1 work; comparing k=1/k=3
                        isolates the level-1 + coarse share)
  L0 sweeps (tiled)   — 2 pre + 2 post at 50³ (z-slab Pallas, nb=5)
  L1 sweeps (XLA)     — 4 sweeps at 25³ (choose_block_zrows returns nz=25,
                        gmg3d's bc<nz gate leaves it on the XLA path)
  outer J.v           — the production lowp f32 fine-level J.v

Usage: python tools/probes/b13d_attrib_probe.py [reps] [kcycles]
  kcycles: comma-separated list (default "1,3" — k=1 vs the k=3 default
  isolates the level-1+coarse share without paying two more ~10-min
  preconditioner compiles; chain_r43 already measured k=2/k=4 full-run
  walls). reps default 10: the reps=50 chained-scan apply crashed the
  remote worker (chain_r41, the documented long-running-dispatch class).
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

from pfhubbenchmarks_tpu.benchmarks.bench1_3d import make

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
kcycles = [int(k) for k in
           (sys.argv[2] if len(sys.argv) > 2 else "1,3").split(",")]
pb0 = make()
w = pb0.initial_state()
dt = pb0.time.dt0
r = jax.tree_util.tree_map(lambda a: jnp.ones_like(a, jnp.float32), w)


def bench_apply(label, fn, x):
    def chain(x):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    f = jax.jit(chain)
    t0 = time.time()
    z = jax.block_until_ready(f(x))
    compile_s = time.time() - t0
    t0 = time.time()
    z = jax.block_until_ready(f(x))
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label}: {ms:.3f} ms/apply (compile {compile_s:.0f}s)",
          flush=True)
    return ms


for k in kcycles:
    pb = dataclasses.replace(pb0, solver=dataclasses.replace(
        pb0.solver, gmg_kcycle=k))
    Minv = pb.precond_builder()(w, w, dt)
    bench_apply(f"Minv@kcycle={k}", Minv, r)

# isolated level phases
from pfhubbenchmarks_tpu.fem.assembly3d import make_residual3d
from pfhubbenchmarks_tpu.ops.pallas3d import (choose_block_zrows,
                                              make_tiled_lmr_sweep3d)
from pfhubbenchmarks_tpu.solve.gmg3d import build_hierarchy3d
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi3d
from pfhubbenchmarks_tpu.solve.transfer3d import inject3d_any

grids = [dataclasses.replace(g, rule_name="keast2")
         for g in build_hierarchy3d(pb0.grid)]
w32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), w)
F = w32[0].shape[0]
dt32 = jnp.asarray(dt, jnp.float32)

# L0: production tiled path
g0 = grids[0]
nq0 = g0.tab().nq
bc0 = choose_block_zrows(g0, F, nq0)
prep0, sweep0 = make_tiled_lmr_sweep3d(g0, pb0.terms, F, dtype=jnp.float32,
                                       block_rows=bc0)
bj0 = make_block_jacobi3d(g0, pb0.terms, F, dtype=jnp.float32)(w32, w32, dt32)
st0 = prep0(w32, w32, bj0.pinv_planes)
x0 = jax.tree_util.tree_map(jnp.zeros_like, r)
bench_apply(f"L0 4 tiled sweeps (bc={bc0}, nb={g0.nz // bc0})",
            lambda rr: sweep0(x0, rr, 4, st0, dt32)[1], r)

# L1: the XLA path gmg3d actually runs (bc == nz fails the tiled gate)
g1 = grids[1]
w1 = inject3d_any(grids[1], grids[0])(w32)
res1 = make_residual3d(g1, pb0.terms, F, dtype=jnp.float32)
bj1 = make_block_jacobi3d(g1, pb0.terms, F, dtype=jnp.float32)(w1, w1, dt32)
_, jvp1 = jax.linearize(lambda u: res1(u, w1, dt32), w1)
r1 = jax.tree_util.tree_map(lambda a: jnp.ones_like(a), w1)
from pfhubbenchmarks_tpu.solve import tree as tr


def sweeps1(rr):
    def body(c, _):
        x, rr = c
        z = bj1(rr)
        Az = jvp1(z)
        alpha = tr.vdot(Az, rr) * tr.safe_inv(tr.vdot(Az, Az))
        return (tr.axpy(alpha, z, x), tr.axpy(-alpha, Az, rr)), None

    (x, rr), _ = jax.lax.scan(
        body, (jax.tree_util.tree_map(jnp.zeros_like, rr), rr), None,
        length=4)
    return rr


bench_apply("L1 4 XLA sweeps (25³ keast2)", sweeps1, r1)

# L1 via the tiled kernel at nb=1 (the gate candidate)
bc1 = choose_block_zrows(g1, F, g1.tab().nq)
prep1, sweep1 = make_tiled_lmr_sweep3d(g1, pb0.terms, F, dtype=jnp.float32,
                                       block_rows=bc1)
st1 = prep1(w1, w1, bj1.pinv_planes)
x1 = jax.tree_util.tree_map(jnp.zeros_like, r1)
bench_apply(f"L1 4 tiled sweeps (bc={bc1}, nb={g1.nz // bc1})",
            lambda rr: sweep1(x1, rr, 4, st1, dt32)[1], r1)

# outer lowp J.v (production fast_residual operator)
lowp = pb0.lowp_jvp_factory()
if lowp is not None:
    jv = lowp(w32, w32, dt32)
    bench_apply("outer lowp J.v (50³)", jv, r)
