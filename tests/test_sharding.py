"""Multi-device SPMD correctness on the virtual 8-device CPU mesh.

The distributed test the reference never had (it relied on mpirun-by-hand,
SURVEY.md section 4.6): sharded execution must agree with single-device to
floating-point determinism of reductions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from pfhubbenchmarks_tpu.parallel.mesh import (
    make_device_mesh, shard_state, state_sharding)
from pfhubbenchmarks_tpu.solve.newton import make_newton_solver

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_device_mesh(8)


def _problem(mesh):
    my, mx = mesh.devices.shape
    return get_benchmark("bench1", nx=16, ny=16, pad_to=(my, mx))


def test_residual_sharded_matches_single(mesh):
    problem = _problem(mesh)
    res_fn = problem.residual()
    w = problem.initial_state()
    r_single = jax.jit(res_fn)(w, w, 0.1)

    s = state_sharding(mesh)
    ws = shard_state(w, mesh)
    r_shard = jax.jit(res_fn, in_shardings=((s, s), (s, s), None))(ws, ws, 0.1)
    np.testing.assert_allclose(np.asarray(r_shard[0]), np.asarray(r_single[0]),
                               rtol=1e-13, atol=1e-14)
    np.testing.assert_allclose(np.asarray(r_shard[1]), np.asarray(r_single[1]),
                               rtol=1e-13, atol=1e-14)


def test_newton_step_sharded_matches_single(mesh):
    problem = _problem(mesh)
    newton = make_newton_solver(problem.residual(), problem.solver,
                                problem.precond_builder(), jit=False,
                                residual_lowp=problem.residual_lowp())
    w = problem.initial_state()
    single = jax.jit(newton)(w, w, 0.1)

    s = state_sharding(mesh)
    ws = shard_state(w, mesh)
    shard = jax.jit(newton, in_shardings=((s, s), (s, s), None))(ws, ws, 0.1)
    assert int(single.iters) == int(shard.iters)
    assert bool(shard.converged)
    np.testing.assert_allclose(np.asarray(shard.x[0]), np.asarray(single.x[0]),
                               rtol=1e-10, atol=1e-12)


def test_observables_sharded_match(mesh):
    problem = _problem(mesh)
    obs = problem.observable_fns()
    w = problem.initial_state()
    ws = shard_state(w, mesh)
    for name, fn in obs.items():
        a = float(jax.jit(fn)(w))
        b = float(jax.jit(fn)(ws))
        np.testing.assert_allclose(b, a, rtol=1e-12)
