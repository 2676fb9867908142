"""TPU compile + timing verdict for the grid-form tiled kernels.

The round-3 Mosaic SIGABRT was bisected to in-kernel jax.jvp of the WHOLE
assembly under a Pallas grid; ops/pallas_tiled_grid.py hand-writes the
tangent assembly (pointwise-physics jvp only). This probe compiles and runs
the PRODUCTION makers at production sizes, checks J.v against the XLA jvp,
and times grid-form vs unrolled-launch sweeps.

Usage: python tools/probes/tiledgrid_probe.py [bench3|bench2] [n_sweeps]
(one bench per process: a SIGABRT kills the worker connection)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pfhubbenchmarks_tpu.config import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

bench = sys.argv[1] if len(sys.argv) > 1 else "bench3"
n_sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

if bench == "bench3":
    from pfhubbenchmarks_tpu.benchmarks.bench3 import make
    pb = make()
else:
    from pfhubbenchmarks_tpu.benchmarks.bench2 import make
    pb = make()

from pfhubbenchmarks_tpu.fem.assembly import make_residual
from pfhubbenchmarks_tpu.ops.pallas_tiled import (choose_block_rows_vmem,
                                                  make_tiled_jvp,
                                                  make_tiled_lmr_sweep)
from pfhubbenchmarks_tpu.ops.pallas_tiled_grid import (
    make_grid_tiled_jvp, make_grid_tiled_lmr_sweep)
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi

g, F = pb.grid, pb.n_fields
nq = g.tab().nq
bc = choose_block_rows_vmem(g, F, nq)
print(f"{bench}: {g.ny}x{g.nx} F={F} nq={nq} bc={bc}", flush=True)

w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
rng = np.random.default_rng(0)
r = (jnp.asarray(rng.normal(size=(F,) + g.vshape), jnp.float32),
     jnp.asarray(rng.normal(size=(F,) + g.mshape), jnp.float32))
dt = 0.01

# --- J.v: compile verdict + correctness + timing
prep_g, jv_g = make_grid_tiled_jvp(g, pb.terms, F, block_rows=bc)
staged_g = prep_g(w, w)
f_g = jax.jit(lambda v, st: jv_g(v, st, dt))
out = f_g(r, staged_g)
jax.block_until_ready(out)
print("grid-form J.v: COMPILED AND RAN", flush=True)

res32 = make_residual(g, pb.terms, F, dtype=jnp.float32)
az = jax.jit(lambda u, z: jax.jvp(
    lambda x: res32(x, w, jnp.float32(dt)), (u,), (z,))[1])(w, r)
err = max(float(jnp.abs(a - b).max()) for a, b in zip(out, az))
scale = max(float(jnp.abs(a).max()) for a in az)
print(f"grid-form J.v vs XLA: abs_err={err:.3e} scale={scale:.3g}",
      flush=True)

prep_u, jv_u = make_tiled_jvp(g, pb.terms, F, block_rows=bc)
staged_u = prep_u(w, w)
f_u = jax.jit(lambda v, st: jv_u(v, st, dt))
jax.block_until_ready(f_u(r, staged_u))

for name, f, st in (("grid", f_g, staged_g), ("unrolled", f_u, staged_u)):
    t0 = time.time()
    for _ in range(50):
        o = f(r, st)
    jax.block_until_ready(o)
    print(f"J.v[{name}]: {(time.time() - t0) / 50 * 1e3:.3f} ms", flush=True)

# --- sweeps
pinv = make_block_jacobi(g, pb.terms, F, dtype=jnp.float32)(w, w, dt)
pp = pinv.pinv_planes
x0 = (jnp.zeros_like(r[0]), jnp.zeros_like(r[1]))

prep_gs, sw_g = make_grid_tiled_lmr_sweep(g, pb.terms, F, block_rows=bc)
st_g = prep_gs(w, w, pp)
fs_g = jax.jit(lambda x, rr, st: sw_g(x, rr, n_sweeps, st, dt))
og = fs_g(x0, r, st_g)
jax.block_until_ready(og)
print("grid-form sweep: COMPILED AND RAN", flush=True)

prep_us, sw_u = make_tiled_lmr_sweep(g, pb.terms, F, block_rows=bc)
st_u = prep_us(w, w, pp)
fs_u = jax.jit(lambda x, rr, st: sw_u(x, rr, n_sweeps, st, dt))
ou = fs_u(x0, r, st_u)
jax.block_until_ready(ou)
derr = max(float(jnp.abs(a - b).max())
           for a, b in zip(og[0] + og[1], ou[0] + ou[1]))
print(f"sweep grid vs unrolled: abs_err={derr:.3e}", flush=True)

for name, f, st in (("grid", fs_g, st_g), ("unrolled", fs_u, st_u)):
    t0 = time.time()
    for _ in range(20):
        o = f(x0, r, st)
    jax.block_until_ready(o)
    print(f"sweep[{name}] ({n_sweeps} sweeps): "
          f"{(time.time() - t0) / 20 * 1e3:.3f} ms", flush=True)
