"""Krylov + Newton solver validation against scipy and manufactured problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from pfhubbenchmarks_tpu.config import SolverConfig
from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.krylov import bicgstab, gmres
from pfhubbenchmarks_tpu.solve.newton import make_newton_solver


def _random_spd_system(n=64, seed=0):
    rng = np.random.default_rng(seed)
    # 1D Laplacian + diagonal noise: SPD, nontrivially conditioned
    A = sp.diags([-1, 2.2, -1], [-1, 0, 1], shape=(n, n)).toarray()
    A += np.diag(rng.uniform(0, 0.5, n))
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_gmres_matches_direct():
    A, b = _random_spd_system()
    res = gmres(lambda v: A @ v, b, rtol=1e-12, maxiter=500)
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), expect, rtol=1e-8, atol=1e-10)


def test_gmres_restart_cycles():
    A, b = _random_spd_system(n=128, seed=1)
    res = gmres(lambda v: A @ v, b, restart=10, rtol=1e-10, maxiter=2000)
    assert bool(res.converged)
    assert int(res.iters) > 10  # must have gone through restarts
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), expect, rtol=1e-6, atol=1e-8)


def test_gmres_preconditioned_converges_faster():
    A, b = _random_spd_system(n=128, seed=2)
    d = jnp.diag(A)
    plain = gmres(lambda v: A @ v, b, rtol=1e-10, maxiter=1000)
    pc = gmres(lambda v: A @ v, b, Minv=lambda r: r / d, rtol=1e-10, maxiter=1000)
    assert bool(pc.converged)
    assert int(pc.iters) <= int(plain.iters)


def test_bicgstab_matches_direct():
    A, b = _random_spd_system(seed=3)
    res = bicgstab(lambda v: A @ v, b, rtol=1e-12, maxiter=500)
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), expect, rtol=1e-7, atol=1e-9)


def test_krylov_pytree_vectors():
    A, b = _random_spd_system(n=32, seed=4)

    def mv(x):
        u, v = x
        return (A[:16, :16] @ u + v, A[16:, 16:] @ v + u)

    bb = (b[:16], b[16:])
    res = gmres(mv, bb, rtol=1e-12, maxiter=300)
    # compare vs dense block system
    M = np.zeros((32, 32))
    M[:16, :16] = np.asarray(A[:16, :16])
    M[:16, 16:] = np.eye(16)
    M[16:, 16:] = np.asarray(A[16:, 16:])
    M[16:, :16] = np.eye(16)
    expect = np.linalg.solve(M, np.asarray(b))
    got = np.concatenate([np.asarray(res.x[0]), np.asarray(res.x[1])])
    np.testing.assert_allclose(got, expect, rtol=1e-8, atol=1e-10)


def test_newton_solves_nonlinear_system():
    """u solves A u + u^3 = b (the nl.py-style solver smoke test,
    dolfin/nl.py:37-96 / dolfinx/nl.py:50-151)."""
    A, b = _random_spd_system(n=48, seed=5)

    def residual(u, u_prev, dt):
        return A @ u + u**3 - b

    cfg = SolverConfig(newton_atol=1e-10, newton_max_iters=20, krylov_rtol=1e-10)
    solve = make_newton_solver(residual, cfg, lambda w, w0, dt: (lambda r: r))
    x0 = jnp.zeros_like(b)
    res = solve(x0, x0, 1.0)
    assert bool(res.converged)
    assert int(res.iters) < 15
    final = np.asarray(A @ res.x + res.x**3 - b)
    assert np.linalg.norm(final) < 1e-9


def test_newton_reports_nonconvergence():
    # impossible tolerance within 1 iteration on a strongly nonlinear system
    A, b = _random_spd_system(n=16, seed=6)

    def residual(u, u_prev, dt):
        return A @ u + 50.0 * jnp.sin(u) - b

    cfg = SolverConfig(newton_atol=1e-14, newton_rtol=1e-16, newton_max_iters=1)
    solve = make_newton_solver(residual, cfg, lambda w, w0, dt: (lambda r: r))
    x0 = jnp.zeros_like(b)
    res = solve(x0, x0, 1.0)
    assert not bool(res.converged)
    assert int(res.iters) == 1


def test_cp_line_search_survives_skew_system():
    """Regression: on a near-skew Jacobian <F, d> ~ 0 makes the cp secant
    return lambda ~ 0; with the stol test that froze the state (seen on
    bench2 at t~31). The full-step fallback must keep Newton converging."""
    theta = np.pi / 2 - 1e-3
    R = jnp.asarray([[np.cos(theta), -np.sin(theta)],
                     [np.sin(theta), np.cos(theta)]])
    A = jnp.kron(R, jnp.eye(8))
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(16))

    def residual(u, u_prev, dt):
        return A @ u + 0.01 * u**3 - b

    cfg = SolverConfig(newton_atol=1e-10, newton_max_iters=25,
                       krylov_rtol=1e-10, line_search="cp",
                       mixed_precision=False)
    solve = make_newton_solver(residual, cfg, lambda w, w0, dt: (lambda r: r))
    x0 = jnp.zeros_like(b)
    res = solve(x0, x0, 1.0)
    assert bool(res.converged)
    assert float(res.res_norm) < 1e-7


def test_elast_dense_direct_matches_beam_theory():
    """elast's production solver (dense MXU direct + Newton refinement) on a
    reduced 50x10 beam: converges and matches plane-strain Euler-Bernoulli
    tip deflection within bending-theory accuracy."""
    from pfhubbenchmarks_tpu.benchmarks import get_benchmark
    from pfhubbenchmarks_tpu.fem.sample import eval_at_points

    pb = get_benchmark("elast", nx=50, ny=10, Lx=5.0)
    newton = make_newton_solver(pb.residual(), pb.solver,
                                pb.precond_builder(),
                                residual_lowp=pb.residual_lowp())
    w0 = pb.initial_state()
    res = newton(w0, w0, 1.0)
    assert bool(res.converged), float(res.res_norm)
    tip = float(eval_at_points(pb.grid, res.x, 5.0, 0.5)[1])
    euler = -3 * 1e-3 * 5.0**4 / (2 * 1e5 * 1.0**2) * (1 - 0.3**2)
    # short beam (L/H=5): shear deflection adds ~10% over Euler-Bernoulli
    assert abs(tip / euler - 1.0) < 0.25, (tip, euler)


def test_ew_forcing_converges_with_fewer_krylov_iters():
    """krylov_forcing='ew' (Eisenstat-Walker choice 2) must converge to the
    same root as fixed-rtol Newton while spending fewer (or equal) Krylov
    iterations — early Newton iterations stop their linear solves at
    eta_k ~ gamma*(||F_k||/||F_{k-1}||)^2 instead of 1e-5."""
    rng = np.random.default_rng(11)
    n = 40
    A = jnp.asarray(rng.standard_normal((n, n)) + 4.0 * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))

    def residual(u, u_prev, dt):
        return A @ u + 0.5 * jnp.tanh(u) - b

    results = {}
    for forcing in ("fixed", "ew"):
        cfg = SolverConfig(newton_atol=1e-10, newton_max_iters=30,
                           krylov_rtol=1e-8, krylov_atol_frac=0.0,
                           krylov_forcing=forcing, mixed_precision=False,
                           ew_dt_min=0.0)  # deliberately ungated
        solve = make_newton_solver(residual, cfg,
                                   lambda w, w0, dt: (lambda r: r))
        x0 = jnp.zeros_like(b)
        results[forcing] = solve(x0, x0, 1.0)
        assert bool(results[forcing].converged)
        assert float(results[forcing].res_norm) < 1e-7

    np.testing.assert_allclose(np.asarray(results["ew"].x),
                               np.asarray(results["fixed"].x),
                               rtol=1e-6, atol=1e-8)
    assert int(results["ew"].krylov_iters) <= int(
        results["fixed"].krylov_iters), (
        int(results["ew"].krylov_iters), int(results["fixed"].krylov_iters))


def test_ew_dt_gate_selects_forcing_by_dt():
    """ew_dt_min gates EW by timestep: solves at dt below the gate must be
    BIT-IDENTICAL to fixed-rtol forcing (the controller-parity regime —
    same Krylov counts, same iterates), and solves at dt above the gate
    must match ungated EW. Sized so fixed vs EW genuinely differ."""
    rng = np.random.default_rng(11)
    n = 40
    A = jnp.asarray(rng.standard_normal((n, n)) + 4.0 * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))

    def residual(u, u_prev, dt):
        return dt * (A @ u + 0.5 * jnp.tanh(u)) - b

    def solver(**kw):
        cfg = SolverConfig(newton_atol=1e-10, newton_max_iters=30,
                           krylov_rtol=1e-8, krylov_atol_frac=0.0,
                           mixed_precision=False, **kw)
        return make_newton_solver(residual, cfg,
                                  lambda w, w0, dt: (lambda r: r))

    x0 = jnp.zeros_like(b)
    gated = solver(krylov_forcing="ew", ew_dt_min=1.0)
    fixed = solver(krylov_forcing="fixed")
    ew = solver(krylov_forcing="ew", ew_dt_min=0.0)  # deliberately ungated

    below_g, below_f = gated(x0, x0, 0.5), fixed(x0, x0, 0.5)
    np.testing.assert_array_equal(np.asarray(below_g.x), np.asarray(below_f.x))
    assert int(below_g.krylov_iters) == int(below_f.krylov_iters)

    above_g, above_e = gated(x0, x0, 2.0), ew(x0, x0, 2.0)
    np.testing.assert_array_equal(np.asarray(above_g.x), np.asarray(above_e.x))
    assert int(above_g.krylov_iters) == int(above_e.krylov_iters)
    # sanity: the two regimes actually differ (the gate is doing something)
    assert int(above_e.krylov_iters) != int(fixed(x0, x0, 2.0).krylov_iters)


def test_fgmres_augmented_restart_matches_direct():
    """fgmres(n_aug=k) — LGMRES-style augmented restarts — must converge to
    the direct solution and not take more iterations than plain restarted
    fgmres on a problem that needs several restart cycles (the augmentation
    vectors recover cross-cycle information that restarting discards)."""
    from pfhubbenchmarks_tpu.solve.krylov import fgmres

    rng = np.random.default_rng(7)
    n = 120
    # moderately conditioned nonsymmetric system: several GMRES(8) cycles
    A = jnp.asarray(np.diag(np.linspace(1.0, 80.0, n))
                    + 2.0 * np.triu(rng.standard_normal((n, n)), 1)
                    / np.sqrt(n))
    b = jnp.asarray(rng.standard_normal(n))
    expect = np.linalg.solve(np.asarray(A), np.asarray(b))

    base = fgmres(lambda v: A @ v, b, restart=8, rtol=1e-10, maxiter=2000)
    assert bool(base.converged)
    for k in (1, 2):
        res = fgmres(lambda v: A @ v, b, restart=8, rtol=1e-10, maxiter=2000,
                     n_aug=k)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), expect,
                                   rtol=1e-6, atol=1e-8)
        assert int(res.iters) <= int(base.iters), (
            k, int(res.iters), int(base.iters))


def test_ew_without_gate_warns():
    """krylov_forcing='ew' with ew_dt_min unset (None) must warn loudly:
    ungated EW was measured to break controller parity (round-3 labs).
    Explicit 0.0 means 'deliberately ungated' and stays silent."""
    import warnings

    import jax.numpy as jnp

    from pfhubbenchmarks_tpu.config import SolverConfig
    from pfhubbenchmarks_tpu.solve.newton import make_newton_solver

    def residual(w, w0, dt):
        (x,) = w
        (x0,) = w0
        return (x - x0 + dt * x**3,)

    def precond(w, w0, dt):
        return lambda r: r

    with pytest.warns(UserWarning, match="ew_dt_min"):
        make_newton_solver(residual, SolverConfig(krylov_forcing="ew"),
                           precond, jit=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make_newton_solver(
            residual, SolverConfig(krylov_forcing="ew", ew_dt_min=0.0),
            precond, jit=False)
        solve = make_newton_solver(
            residual, SolverConfig(krylov_forcing="ew", ew_dt_min=5.0,
                                   mixed_precision=False, precond="none"),
            precond, jit=False)
    res = solve((jnp.ones(4) * 0.5,), (jnp.ones(4) * 0.5,), 0.1)
    assert bool(res.converged)


def test_defect_correction_krylov_operator():
    """config.krylov_operator='precond_rule': the Krylov matvec linearizes
    the cheap-rule residual while Newton's staged residual stays true-rule,
    and the solve still converges ||F||_true below atol."""
    import dataclasses

    from pfhubbenchmarks_tpu import timeloop
    from pfhubbenchmarks_tpu.benchmarks.bench1 import make

    pb = make(nx=16, ny=16)
    pb = dataclasses.replace(pb, solver=dataclasses.replace(
        pb.solver, krylov_operator="precond_rule"))
    assert pb.solver.precond_rule == "dunavant2"
    kry = pb.krylov_residual_lowp()
    assert kry is not None
    assert pb._krylov_grid().rule_name == "dunavant2"
    # the true-rule lowp residual is a different operator
    tru = pb.residual_lowp()
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)
    d_true = tru(w, w, dt)
    d_kry = kry(w, w, dt)
    assert max(float(jnp.abs(a - b).max())
               for a, b in zip(d_true, d_kry)) > 1e-8

    runner = timeloop.Runner(pb)
    res = runner.run(end_time=0.25)
    # Newton convergence is judged on the TRUE residual norm
    assert res.stats[-1].res_norm < pb.solver.newton_atol
    assert res.stats[-1].retries == 0
