"""Periodic topology: translation equivariance + conservation."""

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.assembly import make_functional, make_residual
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid


def _setup():
    grid = CrossedTriGrid(8, 8, 4.0, 4.0, periodic=True)

    def terms(ctx):  # nonlinear diffusion-ish block
        return [ctx.u[0] ** 3 - ctx.u0[0] / ctx.dt], [ctx.du[0]]

    res = make_residual(grid, terms, 1)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((1, 8, 8)))
    m = jnp.asarray(rng.standard_normal((1, 8, 8)))
    return grid, res, (v, m)


def test_translation_equivariance():
    """residual(roll(w)) == roll(residual(w)) — exact only with wraparound."""
    grid, res, w = _setup()
    r = res(w, w, 0.5)
    w_sh = tuple(jnp.roll(a, (2, 3), axis=(1, 2)) for a in w)
    r_sh = res(w_sh, w_sh, 0.5)
    for a, b in zip(r_sh, r):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(jnp.roll(b, (2, 3), axis=(1, 2))),
                                   rtol=1e-12, atol=1e-12)


def test_flux_residual_sums_to_zero():
    """Pure-flux weak forms conserve: sum_k r_k = integral of div-term = 0."""
    grid, _, w = _setup()

    def terms(ctx):
        return [0.0], [ctx.du[0]]

    r = make_residual(grid, terms, 1)(w, w, 1.0)
    total = float(sum(jnp.sum(a) for a in r))
    assert abs(total) < 1e-12


def test_bench1_periodic_variant_runs():
    """The periodic BM1 the reference authored but never enabled
    (dolfin/pfbase.py:11-37) is a first-class registry benchmark."""
    import numpy as np

    from pfhubbenchmarks_tpu import timeloop
    from pfhubbenchmarks_tpu.benchmarks import get_benchmark

    p = get_benchmark("bench1_periodic", nx=16, ny=16)
    assert p.grid.periodic
    res = timeloop.run(p, max_steps=4, verbose=False)
    solute = res.rows[:, 2]
    np.testing.assert_allclose(solute, solute[0], rtol=1e-10)
    assert (np.diff(res.rows[:, 1]) < 0).all()
    # padding-free storage: every stored node is a real dof
    assert res.state[0].shape == (2, 16, 16)


def test_periodic_area():
    grid, _, w = _setup()
    one = (jnp.ones_like(w[0]), jnp.ones_like(w[1]))
    area = float(make_functional(grid, lambda ctx: ctx.u[0])(one))
    np.testing.assert_allclose(area, 16.0, rtol=1e-13)
