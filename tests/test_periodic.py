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


def test_periodic_transfers_adjoint_and_nested():
    """Periodic prolongation: coarse dofs reproduced at coincident fine
    nodes; restriction is the exact transpose."""
    import jax
    import jax.numpy as jnp

    from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
    from pfhubbenchmarks_tpu.solve.transfer import (
        inject_state_periodic, prolong_periodic, restrict_periodic)

    coarse = CrossedTriGrid(8, 8, 2.0, 2.0, periodic=True)
    fine = CrossedTriGrid(16, 16, 2.0, 2.0, periodic=True)
    rng = np.random.default_rng(0)
    wc = (jnp.asarray(rng.standard_normal((2, 8, 8))),
          jnp.asarray(rng.standard_normal((2, 8, 8))))
    rf = (jnp.asarray(rng.standard_normal((2, 16, 16))),
          jnp.asarray(rng.standard_normal((2, 16, 16))))
    wf = prolong_periodic(coarse, fine)(wc)
    back = inject_state_periodic(coarse, fine)(wf)
    np.testing.assert_allclose(np.asarray(back[0]), np.asarray(wc[0]), atol=1e-14)
    np.testing.assert_allclose(np.asarray(back[1]), np.asarray(wc[1]), atol=1e-14)
    Rrf = restrict_periodic(coarse, fine)(rf)
    lhs = sum(float(jnp.vdot(a, b)) for a, b in zip(wf, rf))
    rhs = sum(float(jnp.vdot(a, b)) for a, b in zip(wc, Rrf))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


def test_bench1_periodic_gmg_newton_converges():
    """The periodic variant now runs the full GMG V-cycle (wraparound
    transfers) instead of falling back to block-Jacobi."""
    from pfhubbenchmarks_tpu.solve.gmg import build_hierarchy
    from pfhubbenchmarks_tpu.solve.newton import make_newton_solver

    from pfhubbenchmarks_tpu.benchmarks import get_benchmark

    pb = get_benchmark("bench1_periodic", nx=32, ny=32)
    assert pb.solver.precond == "gmg"
    sizes = [(h.ny, h.nx) for h in build_hierarchy(pb.grid)]
    assert sizes == [(32, 32), (16, 16), (8, 8)], sizes
    newton = make_newton_solver(pb.residual(), pb.solver,
                                pb.precond_builder(),
                                residual_lowp=pb.residual_lowp())
    w0 = pb.initial_state()
    res = newton(w0, w0, 0.1)
    assert bool(res.converged), float(res.res_norm)
    res2 = newton(res.x, res.x, 0.2)
    assert bool(res2.converged), float(res2.res_norm)
