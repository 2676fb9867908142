"""Attribute elast's 126 s warm run (chain_r20) across build phases.

Phases timed separately (each jitted, block_until_ready, warm = 2nd call):
  J     — dense Jacobian materialization via chunked vmapped jvp (f64)
  J32   — same but with an f32 residual build (candidate cost cut: the
          inverse only resolves J to f32 anyway)
  fact  — mxu_inverse of the equilibrated f32 matrix
  ref   — refine_inverse (3 chunked-f64 Newton-Schulz passes)
  then the production Newton solve, and one with refinement SKIPPED
  (f64 FGMRES may tolerate the raw 1.6e-1 factor with extra iterations).

Usage: python tools/probes/elast_attrib_probe.py
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

from pfhubbenchmarks_tpu.benchmarks.elast import make
from pfhubbenchmarks_tpu.fem.assembly import make_residual
from pfhubbenchmarks_tpu.solve.mxu_inverse import mxu_inverse, refine_inverse

pb = make()
grid, F = pb.grid, pb.n_fields
ny, nx = grid.ny, grid.nx
nvy, nvx = grid.n_vertices_y, grid.n_vertices_x
nv = F * nvy * nvx
n = nv + F * ny * nx
chunk = 512
nchunks = -(-n // chunk)
w = pb.initial_state()
dt = pb.time.dt0


def timed(label, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)
    return out


def make_J(dtype):
    residual = make_residual(grid, pb.terms, F, dirichlet=pb.dirichlet,
                             dtype=dtype)
    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape

    def flatten(s):
        v, m = s
        return jnp.concatenate([v[:, :nvy, :nvx].reshape(-1),
                                m[:, :ny, :nx].reshape(-1)])

    def unflatten(x):
        v = jnp.zeros((F, Yv, Xv), x.dtype).at[:, :nvy, :nvx].set(
            x[:nv].reshape(F, nvy, nvx))
        m = jnp.zeros((F, Ym, Xm), x.dtype).at[:, :ny, :nx].set(
            x[nv:].reshape(F, ny, nx))
        return v, m

    def build(w, dt):
        wc = jax.tree_util.tree_map(lambda a: a.astype(dtype), w)
        x0 = flatten(wc)
        _, jvp = jax.linearize(
            lambda x: flatten(residual(unflatten(x), wc, jnp.asarray(dt, dtype))), x0)

        def chunk_rows(i):
            rows = i * chunk + jnp.arange(chunk)
            basis = (jnp.arange(n)[None, :] == rows[:, None]).astype(dtype)
            return jax.vmap(jvp)(basis)

        JT = jax.lax.map(chunk_rows, jnp.arange(nchunks))
        return JT.reshape(nchunks * chunk, n)[:n].T

    return build


J = timed("J_f64", make_J(jnp.float64), w, dt)
J32 = timed("J_f32build", make_J(jnp.float32), w, dt)
J32.delete()                      # timing-only; free n² before the inverses
del J32
d = 1.0 / jnp.maximum(jnp.abs(J).max(axis=1), 1e-30)
Jd = (J * d[:, None]).astype(jnp.float32)
Jd64 = Jd.astype(jnp.float64)     # quality-check operand, built once
X0 = timed("fact", lambda A: mxu_inverse(A), Jd)
J.delete()                        # refine passes peak HBM (chain_r32 OOM)
del J

# application quality in f64 (each case timed, checked, then freed)
import numpy as np

rng = np.random.default_rng(0)
r = jnp.asarray(rng.standard_normal(n))
Jr64 = jax.jit(lambda X, rr: Jd64 @ (X.astype(jnp.float64) @ rr) - rr)


def quality(label, X):
    err = jax.block_until_ready(Jr64(X, r))
    print(f"{label}: {float(jnp.linalg.norm(err) / jnp.linalg.norm(r)):.3e}",
          flush=True)


quality("q0", X0)
for iters in (1, 3):
    Xr = timed(f"ref{iters}",
               lambda A, X, it=iters: refine_inverse(A, X, iters=it), Jd, X0)
    quality(f"q{iters}", Xr)
    Xr.delete()
    del Xr

# production Newton solve (refined) vs refinement skipped
import dataclasses

from pfhubbenchmarks_tpu import timeloop

for iters, label in ((None, "prod"),):
    runner = timeloop.Runner(pb)
    t0 = time.time(); runner.run(verbose=False); c = time.time() - t0
    t0 = time.time(); res = runner.run(verbose=False); ww = time.time() - t0
    print(f"elast[{label}]: first={c:.1f}s warm={ww:.1f}s "
          f"tip={res.rows[-1,2]:.6g}", flush=True)
