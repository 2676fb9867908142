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


def _solve_poisson3d(n):
    """The reference's 3D validation (dolfinx/poisson3d.py:90): -lapl(u) = f
    on the unit cube, f = sin(2 pi x) sin(3 pi y) sin(4 pi z), zero Dirichlet
    on all six faces -> exact u = f / (29 pi^2)."""
    from pfhubbenchmarks_tpu.benchmarks.poisson3d import make
    from pfhubbenchmarks_tpu.timeloop import Runner

    problem = make(nx=n, ny=n, nz=n)
    runner = Runner(problem)
    res = runner.newton(problem.initial_state(), problem.initial_state(),
                        jnp.asarray(1.0, jnp.float64))
    assert bool(res.converged)
    l2 = problem.observable_fns()["l2_error_sq"](res.x)
    return float(jnp.sqrt(l2))


def test_poisson3d_manufactured_converges_second_order():
    # the sin(4 pi z) forcing needs ~12 cells/axis to enter the asymptotic
    # range (measured rates: 1.35 @ 6->12, 1.80 @ 12->24, 1.88 @ 16->32)
    errs = [_solve_poisson3d(n) for n in (12, 24)]
    rate = np.log2(errs[0] / errs[1])
    assert errs[-1] < 1e-4, errs
    assert 1.7 < rate < 2.4, (errs, rate)


def test_dirichlet3d_nonzero_faces_exact_for_linear():
    """P1 reproduces a harmonic linear field exactly; exercises nonzero g on
    every face orientation of DirichletBC3D."""
    from pfhubbenchmarks_tpu.fem.assembly3d import (
        DirichletBC3D, make_residual3d)
    from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
    from pfhubbenchmarks_tpu.solve.newton import make_newton_solver
    from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi3d

    n = 6
    grid = TetGrid(n, n, n, 1.0, 1.0, 1.0)
    lin = lambda x, y, z: 1.0 + 2.0 * x + 3.0 * y + 4.0 * z
    face_fns = {
        "x0": lambda y, z: lin(0.0, y, z), "x1": lambda y, z: lin(1.0, y, z),
        "y0": lambda x, z: lin(x, 0.0, z), "y1": lambda x, z: lin(x, 1.0, z),
        "z0": lambda x, y: lin(x, y, 0.0), "z1": lambda x, y: lin(x, y, 1.0),
    }
    bcs = tuple(DirichletBC3D.make(grid, 0, face, fn)
                for face, fn in face_fns.items())

    def terms(ctx):
        s, fl = forms.poisson(ctx.du[0], 0.0, 1.0)
        return [s], [fl]

    residual = make_residual3d(grid, terms, 1, dirichlet=bcs)
    pre = make_block_jacobi3d(grid, terms, 1, dirichlet=bcs)
    cfg = SolverConfig(newton_atol=1e-12, krylov_rtol=1e-11,
                       krylov_max_iters=2000, mixed_precision=False)
    solve = make_newton_solver(residual, cfg, pre)
    w0 = grid.interpolate([lambda x, y, z: 0.0 * x])
    w0 = (jnp.asarray(w0[0]),)
    for bc in bcs:
        w0 = (bc.apply_value(w0[0]),)
    res = solve(w0, w0, 1.0)
    assert bool(res.converged)
    x, y, z = grid.vertex_coords()
    err = np.abs(np.asarray(res.x[0][0, : n + 1, : n + 1, : n + 1])
                 - lin(x, y, z)).max()
    assert err < 1e-8, err


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
