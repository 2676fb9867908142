"""Sharded fused LMR smoother (parallel/halo_smoother.py) vs the
single-device math. The per-shard Pallas kernel (interpret mode on the
virtual 8-device CPU mesh) + ppermute halos + psum'd step size must
reproduce the global LMR sweep to f32 reduction-order noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from pfhubbenchmarks_tpu.fem.assembly import make_residual
from pfhubbenchmarks_tpu.parallel.halo import aligned_pad_to
from pfhubbenchmarks_tpu.parallel.halo_smoother import make_sharded_lmr_sweep
from pfhubbenchmarks_tpu.parallel.mesh import make_device_mesh, shard_state
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_device_mesh(8)


def _setup(mesh, name="bench1", nx=16):
    my, mx = mesh.devices.shape
    pb = get_benchmark(name, nx=nx, ny=nx,
                       pad_to=aligned_pad_to(nx, nx, (my, mx)))
    g, F = pb.grid, pb.n_fields
    assert g.vshape == g.mshape
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    dt = 0.1
    rng = np.random.default_rng(3)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(
        np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))
    bj = make_block_jacobi(g, pb.terms, F, dtype=jnp.float32)(w, w, dt)
    return pb, w, r, bj.pinv_planes, dt


def _reference_sweeps(pb, w, r, pinv, dt, n):
    """Global-array LMR sweeps — the math the sharded kernel must match."""
    g, F = pb.grid, pb.n_fields
    res32 = make_residual(g, pb.terms, F, dtype=jnp.float32)
    pv, pm = pinv
    x = (jnp.zeros_like(r[0]), jnp.zeros_like(r[1]))
    for _ in range(n):
        z = (jnp.einsum("ijyx,jyx->iyx", pv, r[0]),
             jnp.einsum("ijyx,jyx->iyx", pm, r[1]))
        _, az = jax.jvp(lambda u: res32(u, w, dt), (w,), (z,))
        num = jnp.sum(az[0] * r[0]) + jnp.sum(az[1] * r[1])
        den = jnp.sum(az[0] * az[0]) + jnp.sum(az[1] * az[1])
        alpha = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
        x = (x[0] + alpha * z[0], x[1] + alpha * z[1])
        r = (r[0] - alpha * az[0], r[1] - alpha * az[1])
    return x, r


@pytest.mark.parametrize("n", [1, 3])
def test_sharded_sweep_matches_global(mesh, n):
    pb, w, r, pinv, dt, = _setup(mesh)
    x_ref, r_ref = _reference_sweeps(pb, w, r, pinv, dt, n)

    sweep = make_sharded_lmr_sweep(pb.grid, pb.terms, pb.n_fields, mesh,
                                   dtype=jnp.float32, interpret=True)
    ws = shard_state(w, mesh)
    rs = shard_state(r, mesh)
    x0 = (jnp.zeros_like(r[0]), jnp.zeros_like(r[1]))
    xs = shard_state(x0, mesh)
    x_s, r_s = sweep(xs, rs, ws, ws, pinv, dt, n)

    for a, b in zip(list(x_s) + list(r_s), list(x_ref) + list(r_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_sweep_uses_collectives(mesh):
    """The halo exchange must lower to ppermute + the step size to
    all-reduce — no all-gather fallback to replication."""
    pb, w, r, pinv, dt = _setup(mesh)
    sweep = make_sharded_lmr_sweep(pb.grid, pb.terms, pb.n_fields, mesh,
                                   dtype=jnp.float32, interpret=True)
    ws = shard_state(w, mesh)
    rs = shard_state(r, mesh)
    x0 = shard_state((jnp.zeros_like(r[0]), jnp.zeros_like(r[1])), mesh)

    def run(x, rr, w_):
        return sweep(x, rr, w_, w_, pinv, dt, 2)

    txt = jax.jit(run).lower(x0, rs, ws).compile().as_text()
    assert "collective-permute" in txt
    assert "all-gather" not in txt
