"""elast solve-phase attribution + fix candidates (round-5).

chain_r40's attribution run got build=0.09 s (f32 J), fact=0.35 s
(mxu_inverse) and then crashed in its refine-quality phase (the Jr64
closure baked an 880 MB f64 constant into the HLO -> remote-compile
HTTP 413). Production skips refinement, so the open question is the
~0.40 s solve phase: the dense M apply promotes to EMULATED f64
(``A @ f64vec`` in precond.Minv) and the outer J.v is emulated-f64 FEM
assembly — which one carries the wall?

Cases (each jitted, warm-timed, operands passed as ARGS so nothing bakes
into the HLO):
  jv64      — one f64 J.v (jax.linearize of the f64 residual)
  mv64      — dense M apply at f64 promotion (the production op)
  mv32      — dense M apply with the vector cast to f32 around the matmul
  prod      — production warm solve (runner.run_fused) for the total
  mixed     — fix candidate 2: f32 Krylov under f64 Newton (GMRES
              iterative refinement; convergence factor ~cond*eps32 ~ 0.06
              per Newton pass), newton_max_iters raised to let IR walk
              down; quality gated on tip deflection vs beam theory.

Usage: python tools/probes/elast_solve_probe.py
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

from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.elast import make
from pfhubbenchmarks_tpu.fem.assembly import make_residual

pb = make()
grid, F = pb.grid, pb.n_fields
ny, nx = grid.ny, grid.nx
nvy, nvx = grid.n_vertices_y, grid.n_vertices_x
nv = F * nvy * nvx
n = nv + F * ny * nx
w = pb.initial_state()
dt = pb.time.dt0


def timed(label, fn, *args, reps=5):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f(*args))
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts)*1e3:.2f} ms", flush=True)
    return out


res64 = make_residual(grid, pb.terms, F, dirichlet=pb.dirichlet,
                      dtype=jnp.float64)
v = jax.tree_util.tree_map(lambda a: jnp.ones_like(a), w)


def jv64(w_, v_):
    _, jvp = jax.linearize(lambda x: res64(x, w_, dt), w_)
    return jvp(v_)


timed("jv64", jv64, w, v)

rng = np.random.default_rng(0)
A32 = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
r64 = jnp.asarray(rng.standard_normal(n))
timed("mv64 (promoted)", lambda A, r: A @ r, A32, r64)
timed("mv32 (cast)", lambda A, r: (A @ r.astype(jnp.float32)).astype(r.dtype),
      A32, r64)
del A32

runner = timeloop.Runner(pb)
runner.run_fused(end_time=pb.time.t0 + 2.1 * pb.time.dt0)
walls = []
for _ in range(3):
    t0 = time.time()
    res = runner.run_fused()
    walls.append(time.time() - t0)
print(f"prod: warm={min(walls):.3f}s (reps {[round(x,3) for x in walls]}) "
      f"tip={res.rows[-1,2]:.6g} E={res.rows[-1,1]:.6g}", flush=True)
del runner

# fix candidate 2: f32 Krylov under f64 Newton (iterative refinement).
# krylov_rtol 1e-6: the f32 solve can't certify 1e-8; each Newton pass
# contracts the f64 residual by ~cond*eps32, extra passes finish the job.
pbm = dataclasses.replace(pb, solver=dataclasses.replace(
    pb.solver, mixed_precision=True, newton_max_iters=8,
    krylov_rtol=1e-6))
runner = timeloop.Runner(pbm)
runner.run_fused(end_time=pb.time.t0 + 2.1 * pb.time.dt0)
walls = []
for _ in range(3):
    t0 = time.time()
    resm = runner.run_fused()
    walls.append(time.time() - t0)
print(f"mixed: warm={min(walls):.3f}s (reps {[round(x,3) for x in walls]}) "
      f"tip={resm.rows[-1,2]:.6g} E={resm.rows[-1,1]:.6g} "
      f"(prod tip {res.rows[-1,2]:.6g})", flush=True)
