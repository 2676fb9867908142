"""3D Pallas kernels (ops/pallas3d.py) vs the XLA einsum assembly.
Interpreter mode so the suite runs on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.benchmarks.bench1_3d import make
from pfhubbenchmarks_tpu.fem.assembly3d import make_residual3d
from pfhubbenchmarks_tpu.ops import pallas3d
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi3d


@pytest.fixture(scope="module")
def prob():
    pb = make(nx=8, ny=8, nz=8)
    g = pb.grid
    F = pb.n_fields
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    dt = jnp.asarray(0.3, jnp.float32)
    rng = np.random.default_rng(0)
    v = np.zeros((F,) + g.vshape, np.float32)
    v[:, : g.nz + 1, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.nz + 1, g.ny + 1, g.nx + 1)).astype(np.float32)
    return pb, g, F, w, dt, (jnp.asarray(v),)


def _xla_jvp(pb, g, F, w, dt, v):
    res32 = make_residual3d(g, pb.terms, F, dtype=jnp.float32)
    _, jvp_fn = jax.linearize(lambda u: res32(u, w, dt), w)
    return jvp_fn(v)


def test_whole_array_jvp3d_matches(prob):
    pb, g, F, w, dt, v = prob
    residual = pallas3d._scalar_assembly3d(g, pb.terms, F)

    # exercise the in-kernel code path through interpret-mode pallas_call
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Z, Y, X = g.vshape

    def kernel(w_v, w0_v, v_v, dt_ref, out_v):
        dtk = dt_ref[0, 0]
        _, jv = jax.jvp(lambda u: residual(u, (w0_v[:],), dtk),
                        ((w_v[:],),), ((v_v[:],),))
        pallas3d._scatter_refs3d(jv, out_v, F, g.nz, g.ny, g.nx)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, Z, Y, X), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=True,
    )
    av = call(w[0], w[0], v[0], jnp.asarray([[dt]], jnp.float32))
    (rv,) = _xla_jvp(pb, g, F, w, dt, v)
    scale = float(jnp.abs(rv).max())
    np.testing.assert_allclose(np.asarray(av), np.asarray(rv),
                               atol=2e-5 * scale)


def test_tiled_jvp3d_matches(prob):
    pb, g, F, w, dt, v = prob
    prep, jv = pallas3d.make_tiled_jvp3d(g, pb.terms, F,
                                         dtype=jnp.float32, block_rows=4,
                                         interpret=True)
    (av,) = jv(v, prep(w, w), dt)
    (rv,) = _xla_jvp(pb, g, F, w, dt, v)
    scale = float(jnp.abs(rv).max())
    np.testing.assert_allclose(np.asarray(av), np.asarray(rv),
                               atol=2e-5 * scale)


def test_tiled_sweep3d_matches(prob):
    pb, g, F, w, dt, v = prob
    bj = make_block_jacobi3d(g, pb.terms, F, dtype=jnp.float32)(w, w, dt)
    prep, sweep = pallas3d.make_tiled_lmr_sweep3d(
        g, pb.terms, F, dtype=jnp.float32, block_rows=4, interpret=True)
    x0 = (jnp.zeros_like(v[0]),)
    staged = prep(w, w, bj.pinv_planes)
    x_t, r_t = sweep(x0, v, 2, staged, dt)

    res32 = make_residual3d(g, pb.terms, F, dtype=jnp.float32)
    _, jvp_fn = jax.linearize(lambda u: res32(u, w, dt), w)
    x, rr = x0, v
    for _ in range(2):
        z = bj(rr)
        Az = jvp_fn(z)
        num = jnp.vdot(Az[0], rr[0])
        den = jnp.vdot(Az[0], Az[0])
        alpha = num / den
        x = (x[0] + alpha * z[0],)
        rr = (rr[0] - alpha * Az[0],)
    scale = float(jnp.abs(x[0]).max())
    np.testing.assert_allclose(np.asarray(x_t[0]), np.asarray(x[0]),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(r_t[0]), np.asarray(rr[0]),
        atol=1e-4 * float(jnp.abs(rr[0]).max()))


def test_whole_sweep_loop3d_matches(prob):
    pb, g, F, w, dt, v = prob
    bj = make_block_jacobi3d(g, pb.terms, F, dtype=jnp.float32)(w, w, dt)
    sweep = pallas3d.make_pallas_lmr_sweep_loop3d(
        g, pb.terms, F, dtype=jnp.float32, n_sweeps=2, interpret=True)
    x0 = (jnp.zeros_like(v[0]),)
    x_t, r_t = sweep(x0, v, w, w, dt, bj.pinv_planes)

    res32 = make_residual3d(g, pb.terms, F, dtype=jnp.float32)
    _, jvp_fn = jax.linearize(lambda u: res32(u, w, dt), w)
    x, rr = x0, v
    for _ in range(2):
        z = bj(rr)
        Az = jvp_fn(z)
        alpha = jnp.vdot(Az[0], rr[0]) / jnp.vdot(Az[0], Az[0])
        x = (x[0] + alpha * z[0],)
        rr = (rr[0] - alpha * Az[0],)
    scale = float(jnp.abs(x[0]).max())
    np.testing.assert_allclose(np.asarray(x_t[0]), np.asarray(x[0]),
                               atol=1e-4 * scale)


def test_gmg3d_pallas_matches_xla(prob):
    from pfhubbenchmarks_tpu.solve.gmg3d import make_gmg3d

    pb, g, F, w, dt, v = prob
    import pfhubbenchmarks_tpu.ops.pallas3d as p3
    import pfhubbenchmarks_tpu.solve.gmg3d as g3

    # interpret-mode wrappers so the pallas path runs on CPU
    orig = {n: getattr(p3, n) for n in
            ("make_pallas_jvp3d", "make_pallas_lmr_sweep_loop3d",
             "make_tiled_jvp3d", "make_tiled_lmr_sweep3d")}
    try:
        p3_make_jvp = orig["make_pallas_jvp3d"]

        def mk_jvp(grid_, terms_, nf_, dtype=jnp.float32):
            residual = p3._scalar_assembly3d(grid_, terms_, nf_)
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            Z, Y, X = grid_.vshape

            def kernel(w_v, w0_v, v_v, dt_ref, out_v):
                dtk = dt_ref[0, 0]
                _, jv_ = jax.jvp(lambda u: residual(u, (w0_v[:],), dtk),
                                 ((w_v[:],),), ((v_v[:],),))
                p3._scatter_refs3d(jv_, out_v, nf_, grid_.nz, grid_.ny,
                                   grid_.nx)

            call = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((nf_, Z, Y, X), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
                + [pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=True,
            )
            return lambda w_, w0_, dt_, v_: (
                call(w_[0], w0_[0], v_[0], jnp.asarray([[dt_]], dtype)),)

        p3.make_pallas_jvp3d = mk_jvp
        p3.make_pallas_lmr_sweep_loop3d = (
            lambda *a, **k: orig["make_pallas_lmr_sweep_loop3d"](
                *a, **{**k, "interpret": True}))
        p3.make_tiled_jvp3d = (
            lambda *a, **k: orig["make_tiled_jvp3d"](
                *a, **{**k, "interpret": True}))
        p3.make_tiled_lmr_sweep3d = (
            lambda *a, **k: orig["make_tiled_lmr_sweep3d"](
                *a, **{**k, "interpret": True}))

        build = make_gmg3d(g, pb.terms, F, dtype=jnp.float32,
                           use_pallas=True)
        z = build(w, w, dt)(v)
    finally:
        for n, f in orig.items():
            setattr(p3, n, f)

    build_xla = make_gmg3d(g, pb.terms, F, dtype=jnp.float32)
    z_ref = build_xla(w, w, dt)(v)
    scale = float(jnp.abs(z_ref[0]).max())
    np.testing.assert_allclose(np.asarray(z[0]), np.asarray(z_ref[0]),
                               atol=3e-4 * scale)


def test_tiled_jvp3d_nb1_matches(prob):
    """block_rows == nz (nb=1): one slab covers the grid — the shape
    SolverConfig.tiled_nb1_3d routes to on levels where the fori-loop
    whole-array kernel exceeds VMEM (bench1_3d's 25³)."""
    pb, g, F, w, dt, v = prob
    prep, jv = pallas3d.make_tiled_jvp3d(g, pb.terms, F,
                                         dtype=jnp.float32,
                                         block_rows=g.nz, interpret=True)
    (av,) = jv(v, prep(w, w), dt)
    (rv,) = _xla_jvp(pb, g, F, w, dt, v)
    scale = float(jnp.abs(rv).max())
    np.testing.assert_allclose(np.asarray(av), np.asarray(rv),
                               atol=2e-5 * scale)


def test_tiled_sweep3d_nb1_matches(prob):
    pb, g, F, w, dt, v = prob
    bj = make_block_jacobi3d(g, pb.terms, F, dtype=jnp.float32)(w, w, dt)
    prep, sweep = pallas3d.make_tiled_lmr_sweep3d(
        g, pb.terms, F, dtype=jnp.float32, block_rows=g.nz, interpret=True)
    x0 = (jnp.zeros_like(v[0]),)
    x_t, r_t = sweep(x0, v, 2, prep(w, w, bj.pinv_planes), dt)

    res32 = make_residual3d(g, pb.terms, F, dtype=jnp.float32)
    _, jvp_fn = jax.linearize(lambda u: res32(u, w, dt), w)
    x, rr = x0, v
    for _ in range(2):
        z = bj(rr)
        Az = jvp_fn(z)
        alpha = jnp.vdot(Az[0], rr[0]) / jnp.vdot(Az[0], Az[0])
        x = (x[0] + alpha * z[0],)
        rr = (rr[0] - alpha * Az[0],)
    scale = float(jnp.abs(x[0]).max())
    np.testing.assert_allclose(np.asarray(x_t[0]), np.asarray(x[0]),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(r_t[0]), np.asarray(rr[0]),
        atol=1e-4 * float(jnp.abs(rr[0]).max()))
