"""Manufactured-solution validations: the reference's poisson.py /
poisson3d.py / nl.py ground-truth problems (dolfinx/poisson.py:47-121,
poisson3d.py:90, nl.py:50-151), upgraded to proper convergence studies.

P1 elements must converge at O(h^2) in L2 against a known smooth solution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.config import SolverConfig
from pfhubbenchmarks_tpu.fem.assembly import DirichletBC, make_functional, make_residual
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.models import forms
from pfhubbenchmarks_tpu.solve.newton import make_newton_solver
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi


def _solve_poisson(n):
    """-lapl(u) = f on [0,1]^2, u = sin(pi x) sin(2 pi y) (Dirichlet 0)."""
    grid = CrossedTriGrid(n, n, 1.0, 1.0)

    def u_exact(x, y):
        return np.sin(np.pi * x) * np.sin(2 * np.pi * y)

    def terms(ctx):
        # poisson block: div(grad u) = f with f = -5 pi^2 u_exact
        f = -5.0 * np.pi**2 * jnp.sin(jnp.pi * ctx.x) * jnp.sin(2 * jnp.pi * ctx.y)
        s, fl = forms.poisson(ctx.du[0], f, 1.0)
        return [s], [fl]

    zero = lambda c: 0.0 * c
    bcs = tuple(DirichletBC.make(grid, 0, side, zero)
                for side in ("left", "right", "top", "bottom"))
    residual = make_residual(grid, terms, 1, dirichlet=bcs, needs_coords=True)
    pre = make_block_jacobi(grid, terms, 1, dirichlet=bcs, needs_coords=True)
    cfg = SolverConfig(newton_atol=1e-12, newton_rtol=1e-13, krylov_rtol=1e-10,
                       krylov_max_iters=4000, mixed_precision=False,
                       precond="block_jacobi")
    solve = make_newton_solver(residual, cfg, pre)
    w0 = grid.interpolate([lambda x, y: 0.0 * x])
    w0 = (jnp.asarray(w0[0]), jnp.asarray(w0[1]))
    res = solve(w0, w0, 1.0)
    assert bool(res.converged)

    # L2 error via the quadrature machinery
    vx, vy = grid.vertex_coords()
    cx, cy = grid.center_coords()
    ue_v = jnp.asarray(u_exact(vx, vy))[None]
    ue_m = jnp.asarray(u_exact(cx, cy))[None]
    ev = res.x[0] - jnp.zeros_like(res.x[0]).at[:, : n + 1, : n + 1].set(ue_v)
    em = res.x[1] - jnp.zeros_like(res.x[1]).at[:, :n, :n].set(ue_m)
    l2 = make_functional(grid, lambda ctx: ctx.u[0] ** 2)((ev, em))
    return float(jnp.sqrt(l2))


def test_poisson_manufactured_converges_second_order():
    errs = [_solve_poisson(n) for n in (8, 16, 32)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert errs[-1] < 2e-3
    for r in rates:
        assert 1.8 < r < 2.3, (errs, rates)


def test_nonlinear_manufactured():
    """-lapl(u) + u^3 = f, u = cos(pi x) cos(pi y), pure no-flux BCs
    (the nl.py-style nonlinear solver smoke test with an exact answer)."""
    n = 24
    grid = CrossedTriGrid(n, n, 1.0, 1.0)

    def u_exact(x, y):
        return np.cos(np.pi * x) * np.cos(np.pi * y)

    def terms(ctx):
        ue = jnp.cos(jnp.pi * ctx.x) * jnp.cos(jnp.pi * ctx.y)
        f = 2.0 * np.pi**2 * ue + ue**3
        return [ctx.u[0] ** 3 - f], [ctx.du[0]]

    residual = make_residual(grid, terms, 1, needs_coords=True)
    pre = make_block_jacobi(grid, terms, 1, needs_coords=True)
    cfg = SolverConfig(newton_atol=1e-11, krylov_rtol=1e-10,
                       krylov_max_iters=4000, mixed_precision=False,
                       precond="block_jacobi")
    solve = make_newton_solver(residual, cfg, pre)
    w0 = grid.interpolate([lambda x, y: 0.0 * x])
    w0 = (jnp.asarray(w0[0]), jnp.asarray(w0[1]))
    res = solve(w0, w0, 1.0)
    assert bool(res.converged)
    vx, vy = grid.vertex_coords()
    err = np.abs(np.asarray(res.x[0][0, : n + 1, : n + 1]) - u_exact(vx, vy)).max()
    assert err < 5e-3, err
