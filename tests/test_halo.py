"""Explicit-halo shard_map assembly vs the auto-partitioned/single-device
path (parallel/halo.py). The hand-scheduled ppermute ghost exchange must be
bit-compatible (to reduction-order noise) with the global assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from pfhubbenchmarks_tpu.parallel.halo import (
    aligned_pad_to, make_halo_functional, make_halo_residual)
from pfhubbenchmarks_tpu.parallel.mesh import (
    make_device_mesh, shard_state, state_sharding)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_device_mesh(8)


def _aligned_problem(mesh, name="bench1"):
    my, mx = mesh.devices.shape
    return get_benchmark(name, nx=16, ny=16,
                         pad_to=aligned_pad_to(16, 16, (my, mx)))


def test_halo_residual_matches_global(mesh):
    problem = _aligned_problem(mesh)
    res_global = problem.residual()
    res_halo = make_halo_residual(problem.grid, problem.terms,
                                  problem.n_fields, mesh)
    w = problem.initial_state()
    ws = shard_state(w, mesh)
    r_g = jax.jit(res_global)(w, w, 0.1)
    r_h = jax.jit(res_halo)(ws, ws, 0.1)
    np.testing.assert_allclose(np.asarray(r_h[0]), np.asarray(r_g[0]),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(r_h[1]), np.asarray(r_g[1]),
                               rtol=1e-12, atol=1e-13)


def test_halo_residual_uses_collective_permute(mesh):
    """The halo exchange must actually be ppermute collectives (the
    hand-scheduled schedule, not a gather-back to one device)."""
    problem = _aligned_problem(mesh)
    res_halo = make_halo_residual(problem.grid, problem.terms,
                                  problem.n_fields, mesh)
    w = problem.initial_state()
    ws = shard_state(w, mesh)
    txt = jax.jit(res_halo).lower(ws, ws, 0.1).compile().as_text()
    assert "collective-permute" in txt
    assert "all-gather" not in txt  # nothing falls back to replication


def test_halo_jvp_matches_global(mesh):
    """J.v through the halo residual: the ppermutes must carry the tangent
    (jax.jvp of shard_map) identically to the global linearization."""
    problem = _aligned_problem(mesh)
    res_global = problem.residual()
    res_halo = make_halo_residual(problem.grid, problem.terms,
                                  problem.n_fields, mesh)
    w = problem.initial_state()
    ws = shard_state(w, mesh)
    key = jax.random.PRNGKey(0)
    tv = (0.01 * jax.random.normal(key, w[0].shape, w[0].dtype),
          0.01 * jax.random.normal(key, w[1].shape, w[1].dtype))
    tvs = shard_state(tv, mesh)

    def jv_g(v):
        return jax.jvp(lambda u: res_global(u, w, 0.1), (w,), (v,))[1]

    def jv_h(v):
        return jax.jvp(lambda u: res_halo(u, ws, 0.1), (ws,), (v,))[1]

    g = jax.jit(jv_g)(tv)
    h = jax.jit(jv_h)(tvs)
    np.testing.assert_allclose(np.asarray(h[0]), np.asarray(g[0]),
                               rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(h[1]), np.asarray(g[1]),
                               rtol=1e-11, atol=1e-12)


def test_halo_dirichlet_matches_global(mesh):
    """bench6's phi Dirichlet columns land on edge shards; the u - g row
    replacement must be applied by the owning shard only."""
    problem = _aligned_problem(mesh, "bench6")
    res_global = problem.residual()
    res_halo = make_halo_residual(problem.grid, problem.terms,
                                  problem.n_fields, mesh,
                                  dirichlet=problem.dirichlet)
    w = problem.initial_state()
    ws = shard_state(w, mesh)
    r_g = jax.jit(res_global)(w, w, 0.01)
    r_h = jax.jit(res_halo)(ws, ws, 0.01)
    np.testing.assert_allclose(np.asarray(r_h[0]), np.asarray(r_g[0]),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(r_h[1]), np.asarray(r_g[1]),
                               rtol=1e-12, atol=1e-13)


def test_halo_functional_matches_global(mesh):
    problem = _aligned_problem(mesh)
    w = problem.initial_state()
    ws = shard_state(w, mesh)
    from pfhubbenchmarks_tpu.fem.assembly import make_functional

    for name, density in problem.observables.items():
        f_g = jax.jit(make_functional(problem.grid, density))
        f_h = jax.jit(make_halo_functional(problem.grid, density, mesh))
        a = float(f_g(w))
        b = float(f_h(ws))
        np.testing.assert_allclose(b, a, rtol=1e-12), name


def test_halo3d_residual_and_jvp_match_global(mesh):
    """3D explicit-halo residual: y/x halo pencils with z local must match
    the global Kuhn-tet assembly, including under jvp."""
    from pfhubbenchmarks_tpu.parallel.halo import make_halo_residual3d
    from pfhubbenchmarks_tpu.parallel.mesh import shard_state3d

    my, mx = mesh.devices.shape
    problem = get_benchmark("bench1_3d", nx=12, ny=12, nz=12,
                            pad_to=(1, my, mx))
    res_global = problem.residual()
    res_halo = make_halo_residual3d(problem.grid, problem.terms,
                                    problem.n_fields, mesh)
    w = problem.initial_state()
    ws = shard_state3d(w, mesh)
    r_g = jax.jit(res_global)(w, w, 0.1)
    r_h = jax.jit(res_halo)(ws, ws, 0.1)
    np.testing.assert_allclose(np.asarray(r_h[0]), np.asarray(r_g[0]),
                               rtol=1e-12, atol=1e-13)

    key = jax.random.PRNGKey(1)
    tv = (0.01 * jax.random.normal(key, w[0].shape, w[0].dtype),)
    tvs = shard_state3d(tv, mesh)
    g = jax.jit(lambda v: jax.jvp(
        lambda u: res_global(u, w, 0.1), (w,), (v,))[1])(tv)
    h = jax.jit(lambda v: jax.jvp(
        lambda u: res_halo(u, ws, 0.1), (ws,), (v,))[1])(tvs)
    np.testing.assert_allclose(np.asarray(h[0]), np.asarray(g[0]),
                               rtol=1e-11, atol=1e-12)
