"""Diagnose elast's step-1 failure on TPU (round-4: chain_r15 shows
'step 1 failed 61 times at dt_min=1.0; |F|=1.189e-03').

Discriminates (a) the column-chunked f32 LU inverse (commit 808c390)
producing garbage on TPU from (b) a line-search/Newton semantics problem:
builds the dense preconditioner exactly as the runner does, applies it to
a random residual-shaped vector, and measures the true preconditioned
residual ||J M r - r|| / ||r|| in f64. ~1e-3 (3 digits/application) is
the design point (benchmarks/elast.py solver note); ~1 means the inverse
is broken on this backend.

Usage: python tools/probes/elast_debug_probe.py
"""
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

from pfhubbenchmarks_tpu.benchmarks.elast import make

pb = make()
w = pb.initial_state()
dt = pb.time.dt0

t0 = time.time()
build = pb.precond_builder()
Minv = build(w, w, dt)
print(f"precond build: {time.time()-t0:.1f}s")

res64 = pb.residual()
_, jvp64 = jax.linearize(lambda x: res64(x, w, dt), w)

rng = np.random.default_rng(0)
r = jax.tree_util.tree_map(
    lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype), w)
rn = np.sqrt(sum(float(jnp.vdot(a, a)) for a in jax.tree_util.tree_leaves(r)))

t0 = time.time()
x = Minv(jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), r))
x64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), x)
jx = jvp64(x64)
err = jax.tree_util.tree_map(lambda a, b: a - b, jx, r)
en = np.sqrt(sum(float(jnp.vdot(a, a)) for a in jax.tree_util.tree_leaves(err)))
print(f"apply: {time.time()-t0:.1f}s  ||J M r - r||/||r|| = {en/rn:.3e}")

# one real Newton solve, reporting per-iteration residual norms
from pfhubbenchmarks_tpu.solve.newton import make_newton_solver

solve = make_newton_solver(pb.residual(), pb.solver, build)
t0 = time.time()
out = solve(w, w, dt)
print(f"newton: conv={bool(out.converged)} iters={int(out.iters)} "
      f"krylov={int(out.krylov_iters)} |F|={float(out.res_norm):.3e} "
      f"({time.time()-t0:.1f}s)")
