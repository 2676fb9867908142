"""Grid-form tiled kernels (ops/pallas_tiled_grid.py) vs the validated
unrolled-launch tiled kernels (ops/pallas_tiled.py) and the XLA J.v —
identical math: hand-gathered tangent + pointwise-physics jvp + push-reduce
seams must equal jvp-of-the-whole-assembly with re-evaluated halos."""

import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.benchmarks.bench1 import make as make_b1
from pfhubbenchmarks_tpu.benchmarks.bench2 import make as make_b2
from pfhubbenchmarks_tpu.fem.assembly import make_residual
from pfhubbenchmarks_tpu.ops.pallas_tiled import (make_tiled_jvp,
                                                  make_tiled_lmr_sweep)
from pfhubbenchmarks_tpu.ops.pallas_tiled_grid import (
    make_grid_tiled_jvp, make_grid_tiled_lmr_sweep)
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi


def _rand(pb, seed=0):
    g, F = pb.grid, pb.n_fields
    rng = np.random.default_rng(seed)
    v = np.zeros((F,) + g.vshape, np.float32)
    m = np.zeros((F,) + g.mshape, np.float32)
    v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(
        np.float32)
    return jnp.asarray(v), jnp.asarray(m)


def test_grid_tiled_jvp_matches_xla_and_unrolled():
    pb = make_b1(nx=24, ny=24)
    g, F = pb.grid, pb.n_fields
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    z = _rand(pb, seed=1)
    dt = 0.3

    prep_g, jv_g = make_grid_tiled_jvp(g, pb.terms, F, block_rows=8,
                                       interpret=True)
    av_g, am_g = jv_g(z, prep_g(w, w), dt)

    res32 = make_residual(g, pb.terms, F, dtype=jnp.float32)
    _, az = jax.jvp(lambda u: res32(u, w, jnp.float32(dt)), (w,), (z,))
    np.testing.assert_allclose(np.asarray(av_g), np.asarray(az[0]),
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(am_g), np.asarray(az[1]),
                               rtol=2e-4, atol=5e-5)

    prep_u, jv_u = make_tiled_jvp(g, pb.terms, F, block_rows=8,
                                  interpret=True)
    av_u, am_u = jv_u(z, prep_u(w, w), dt)
    np.testing.assert_allclose(np.asarray(av_g), np.asarray(av_u),
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(am_g), np.asarray(am_u),
                               rtol=2e-4, atol=5e-5)


def test_grid_tiled_sweep_matches_unrolled():
    pb = make_b2(nx=8, ny=8)
    g, F = pb.grid, pb.n_fields
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    dt = 0.05
    r = _rand(pb, seed=2)
    x0 = (jnp.zeros_like(r[0]), jnp.zeros_like(r[1]))
    pinv = make_block_jacobi(g, pb.terms, F,
                             dtype=jnp.float32)(w, w, dt).pinv_planes

    prep_g, sweep_g = make_grid_tiled_lmr_sweep(g, pb.terms, F,
                                                block_rows=4,
                                                interpret=True)
    xg, rg = sweep_g(x0, r, 1, prep_g(w, w, pinv), dt)

    prep_u, sweep_u = make_tiled_lmr_sweep(g, pb.terms, F, block_rows=4,
                                           interpret=True)
    xu, ru = sweep_u(x0, r, 1, prep_u(w, w, pinv), dt)

    for a, b in zip(list(xg) + list(rg), list(xu) + list(ru)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=5e-5)


def test_grid_tiled_sweep_field_split():
    """With field_groups, the grid-form sweep must equal the dense apply of
    the exactly-block-diagonal pinv (the static skip drops only zeros)."""
    pb = make_b2(nx=8, ny=8)
    g, F = pb.grid, pb.n_fields
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    dt = 0.05
    r = _rand(pb, seed=3)
    x0 = (jnp.zeros_like(r[0]), jnp.zeros_like(r[1]))
    pinv = make_block_jacobi(g, pb.terms_precond, F,
                             dtype=jnp.float32)(w, w, dt).pinv_planes

    prep_s, sweep_s = make_grid_tiled_lmr_sweep(
        g, pb.terms_precond, F, block_rows=4,
        field_groups=pb.field_groups, interpret=True)
    xs, rs = sweep_s(x0, r, 1, prep_s(w, w, pinv), dt)

    prep_d, sweep_d = make_grid_tiled_lmr_sweep(g, pb.terms_precond, F,
                                                block_rows=4,
                                                interpret=True)
    xd, rd = sweep_d(x0, r, 1, prep_d(w, w, pinv), dt)
    for a, b in zip(list(xs) + list(rs), list(xd) + list(rd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
