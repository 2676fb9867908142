"""Compiled-Mosaic regression tests for the Pallas kernel paths.

The CPU suite exercises these kernels in interpreter mode only
(tests/test_pallas*.py); a Mosaic regression — the remote compiler
rejecting or miscompiling a kernel — would otherwise surface only as a
TPU-run crash (round-2 VERDICT weak item 2). These tests compile and run
the real kernels against their XLA counterparts on the TPU.

Run BY HAND from /root/repo (never alongside another TPU process):

    PFHUB_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -v

Skipped entirely (collection-time) unless the backend is a TPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if not __import__("os").environ.get("PFHUB_TPU_TESTS"):
    pytest.skip("TPU kernel tests are opt-in (PFHUB_TPU_TESTS=1)",
                allow_module_level=True)
if jax.default_backend() in ("cpu", "gpu"):
    pytest.skip("requires a TPU backend", allow_module_level=True)

from pfhubbenchmarks_tpu.config import setup_compile_cache  # noqa: E402

setup_compile_cache()

from pfhubbenchmarks_tpu.benchmarks.bench1 import make as make_b1  # noqa: E402
from pfhubbenchmarks_tpu.benchmarks.bench3 import make as make_b3  # noqa: E402
from pfhubbenchmarks_tpu.fem.assembly import make_residual  # noqa: E402
from pfhubbenchmarks_tpu.ops.pallas_tiled import (  # noqa: E402
    choose_block_rows_vmem, make_tiled_jvp, make_tiled_lmr_sweep)
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi  # noqa: E402


def _rand_r(g, F, rng):
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    return jnp.asarray(r_v), jnp.asarray(r_m)


@pytest.fixture(scope="module")
def b3():
    problem = make_b3()          # 350^2: past the whole-array jvp envelope
    g = problem.grid
    F = problem.n_fields
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    return problem, g, F, w


def test_tiled_jvp_compiles_and_matches(b3):
    problem, g, F, w = b3
    dt = jnp.asarray(0.05, jnp.float32)
    bc = choose_block_rows_vmem(g, F, g.tab().nq)
    assert bc is not None and bc < g.ny
    prep, jv = make_tiled_jvp(g, problem.terms, F, dtype=jnp.float32,
                              block_rows=bc)
    rng = np.random.default_rng(0)
    v = _rand_r(g, F, rng)
    av, am = jax.jit(lambda v, s, dt: jv(v, s, dt))(v, prep(w, w), dt)

    res32 = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, jvp_fn = jax.linearize(lambda u: res32(u, w, dt), w)
    rv, rm = jvp_fn(v)
    scale = float(jnp.abs(rv).max())
    np.testing.assert_allclose(np.asarray(av), np.asarray(rv),
                               atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(am), np.asarray(rm),
                               atol=3e-6 * scale)


def test_tiled_sweep_compiles_and_matches(b3):
    problem, g, F, w = b3
    dt = jnp.asarray(0.05, jnp.float32)
    bc = choose_block_rows_vmem(g, F, g.tab().nq)
    prep, sweep = make_tiled_lmr_sweep(g, problem.terms, F,
                                       dtype=jnp.float32, block_rows=bc)
    bj = make_block_jacobi(g, problem.terms, F, dtype=jnp.float32)(w, w, dt)
    rng = np.random.default_rng(1)
    r = _rand_r(g, F, rng)
    x0 = (jnp.zeros_like(r[0]), jnp.zeros_like(r[1]))
    staged = prep(w, w, bj.pinv_planes)
    x_t, r_t = jax.jit(
        lambda x, r, s, dt: sweep(x, r, 2, s, dt))(x0, r, staged, dt)

    # XLA reference: 2 LMR sweeps with the same block-Jacobi
    res32 = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, jvp_fn = jax.linearize(lambda u: res32(u, w, dt), w)
    x, rr = x0, r
    for _ in range(2):
        z = bj(rr)
        Az = jvp_fn(z)
        num = sum(jnp.vdot(a, b) for a, b in zip(Az, rr))
        den = sum(jnp.vdot(a, a) for a in Az)
        alpha = num / den
        x = tuple(xi + alpha * zi for xi, zi in zip(x, z))
        rr = tuple(ri - alpha * ai for ri, ai in zip(rr, Az))
    scale = float(jnp.abs(x[0]).max())
    np.testing.assert_allclose(np.asarray(x_t[0]), np.asarray(x[0]),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(r_t[0]), np.asarray(rr[0]),
                               atol=1e-4 * float(jnp.abs(rr[0]).max()))


def test_fused_vcycle_minv_matvec_true_rule():
    """The bench1-config fused V-cycle (dunavant2 hierarchy) compiles on
    Mosaic and its exported Az is the TRUE-rule J.v of the exported z."""
    from pfhubbenchmarks_tpu.solve.gmg import make_gmg

    problem = make_b1(nx=100, ny=100)
    g = problem.grid
    F = problem.n_fields
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)
    build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                     use_pallas=True, precond_rule="dunavant2")
    Minv = build(w, w, dt)
    assert hasattr(Minv, "minv_matvec")
    rng = np.random.default_rng(2)
    r = _rand_r(g, F, rng)
    z, az = jax.jit(Minv.minv_matvec)(r)

    res32 = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, az_true = jax.jvp(lambda u: res32(u, w, dt), (w,), (z,))
    for a, b in zip(az, az_true):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale)


def test_split_vcycle_compiles_and_matches(b3):
    """The bench3-config split V-cycle (descend + fused tail + ascend at
    350², plus the exported true-rule (z, Az) pair) compiles on Mosaic and
    matches the XLA cycle."""
    from pfhubbenchmarks_tpu.solve.gmg import make_gmg

    problem, g, F, w = b3
    dt = jnp.asarray(0.05, jnp.float32)
    s = problem.solver
    build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                     use_pallas=True, precond_rule=s.precond_rule)
    Minv = build(w, w, dt)
    assert hasattr(Minv, "minv_matvec")
    rng = np.random.default_rng(5)
    r = _rand_r(g, F, rng)
    z, az = jax.jit(Minv.minv_matvec)(r)

    xla_build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         precond_rule=s.precond_rule,
                         dense_coarse_max_dofs=0)
    z_ref = jax.jit(xla_build(w, w, dt))(r)
    for a, b in zip(z, z_ref):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale)
    res32 = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, az_true = jax.jvp(lambda u: res32(u, w, dt), (w,), (z,))
    for a, b in zip(az, az_true):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale)


def test_fused_vcycle_dirichlet_compiles():
    """bench6's Dirichlet V-cycle (in-kernel edge masks) compiles on Mosaic
    and matches the XLA cycle."""
    from pfhubbenchmarks_tpu.benchmarks.bench6 import make as make_b6
    from pfhubbenchmarks_tpu.solve.gmg import make_gmg

    problem = make_b6()
    g = problem.grid
    F = problem.n_fields
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.05, jnp.float32)
    build = make_gmg(g, problem.terms, F,
                     dirichlet_for=problem.dirichlet_for,
                     dtype=jnp.float32, use_pallas=True,
                     dense_coarse_max_dofs=0)
    Minv = build(w, w, dt)
    assert hasattr(Minv, "minv_matvec")
    rng = np.random.default_rng(4)
    r = _rand_r(g, F, rng)
    z, az = jax.jit(Minv.minv_matvec)(r)

    # XLA reference cycle (same math, use_pallas off)
    xla_build = make_gmg(g, problem.terms, F,
                         dirichlet_for=problem.dirichlet_for,
                         dtype=jnp.float32, dense_coarse_max_dofs=0)
    z_ref = jax.jit(xla_build(w, w, dt))(r)
    for a, b in zip(z, z_ref):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale)

def test_split_chain_vcycle_compiles_and_matches():
    """fuse_vcycle='split_chain' (whole descent + whole ascent as ONE
    Mosaic kernel each around the external dense coarse) compiles on the
    real TPU and matches the XLA cycle — bench1's 100² dunavant2 config."""
    from pfhubbenchmarks_tpu.solve.gmg import make_gmg

    problem = make_b1(nx=100, ny=100)
    g = problem.grid
    F = problem.n_fields
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)
    build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                     use_pallas=True, precond_rule="dunavant2",
                     fuse_vcycle="split_chain")
    Minv = build(w, w, dt)
    assert hasattr(Minv, "minv_matvec")
    rng = np.random.default_rng(7)
    r = _rand_r(g, F, rng)
    z, az = jax.jit(Minv.minv_matvec)(r)

    xla_build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         precond_rule="dunavant2")
    z_ref = jax.jit(xla_build(w, w, dt))(r)
    for a, b in zip(z, z_ref):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale)

    res32 = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, az_true = jax.jvp(lambda u: res32(u, w, dt), (w,), (z,))
    for a, b in zip(az, az_true):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6 * scale)
