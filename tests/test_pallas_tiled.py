"""Row-block-tiled LMR sweep must reproduce the XLA sweep exactly
(same z = P^-1 r, same A z, same global alpha). Interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from pfhubbenchmarks_tpu.ops.pallas_tiled import make_tiled_lmr_sweep
from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi


def _xla_sweep(problem, x, r, n, w, dt):
    res32 = problem.residual(dtype=jnp.float32)
    _, jvp = jax.linearize(lambda u: res32(u, w, dt), w)
    bj = make_block_jacobi(problem.grid, problem.terms, problem.n_fields,
                           dtype=jnp.float32)(w, w, dt)
    for _ in range(n):
        z = bj(r)
        Az = jvp(z)
        alpha = tr.vdot(Az, r) * tr.safe_inv(tr.vdot(Az, Az))
        x = tr.axpy(alpha, z, x)
        r = tr.axpy(-alpha, Az, r)
    return x, r


def _run_case(name, nx, block_rows, n_sweeps=2, dt=0.05):
    problem = get_benchmark(name, nx=nx, ny=nx)
    g = problem.grid
    F = problem.n_fields
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt32 = jnp.asarray(dt, jnp.float32)

    rng = np.random.default_rng(1)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))
    x = tr.zeros_like(r)

    x_ref, r_ref = _xla_sweep(problem, x, r, n_sweeps, w, dt32)

    prepare, sweep = make_tiled_lmr_sweep(g, problem.terms, F,
                                          dtype=jnp.float32,
                                          block_rows=block_rows,
                                          interpret=True)
    pinv = make_block_jacobi(g, problem.terms, F,
                             dtype=jnp.float32)(w, w, dt32).pinv_planes
    staged = prepare(w, w, pinv)
    x_t, r_t = sweep(x, r, n_sweeps, staged, dt32)

    for a, b in zip(x_t + r_t, x_ref + r_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_tiled_sweep_matches_xla_bench1():
    _run_case("bench1", nx=16, block_rows=8)


def test_tiled_sweep_matches_xla_bench2_six_fields():
    # nb=2 blocks: interpret-mode lowering cost grows with the
    # unrolled per-block kernel instances (production: nb<=7)
    _run_case("bench2", nx=12, block_rows=6, n_sweeps=1)


def test_tiled_jvp_matches_xla():
    """make_tiled_jvp must reproduce the XLA linearize J.v exactly."""
    from pfhubbenchmarks_tpu.ops.pallas_tiled import make_tiled_jvp

    problem = get_benchmark("bench2", nx=16, ny=16)
    g = problem.grid
    F = problem.n_fields
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt32 = jnp.asarray(0.05, jnp.float32)

    rng = np.random.default_rng(2)
    v_v = np.zeros((F,) + g.vshape, np.float32)
    v_m = np.zeros((F,) + g.mshape, np.float32)
    v_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    v_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    v = (jnp.asarray(v_v), jnp.asarray(v_m))

    res32 = problem.residual(dtype=jnp.float32)
    _, jvp = jax.linearize(lambda u: res32(u, w, dt32), w)
    want = jvp(v)

    prep, jv = make_tiled_jvp(g, problem.terms, F, dtype=jnp.float32,
                              block_rows=4, interpret=True)
    got = jv(v, prep(w, w), dt32)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)
