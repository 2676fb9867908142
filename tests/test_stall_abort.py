"""Early abort of doomed Newton attempts (SolverConfig.newton_stall_abort).

The adaptive controller's rejected dt attempts otherwise walk all
newton_max_iters limit-cycling (dolfin's SNES does the same — the reference
pays the full walk; see ROADMAP round-4 failhist data: 43% of bench2's
Krylov work was rejected attempts). The rule must (a) fire early on a
limit cycle, (b) leave converging solves untouched, (c) never fire once
||F|| has dipped under report_atol (SNES-equivalent acceptance).
"""

import dataclasses

import jax.numpy as jnp

from pfhubbenchmarks_tpu.config import SolverConfig
from pfhubbenchmarks_tpu.solve.newton import make_newton_solver

IDENT_PC = lambda w, w0, dt: (lambda r: r)


def _solve_scalar(f, x0, cfg):
    # residual ignores (w_prev, dt): plain root finding as a Newton harness
    residual = lambda w, w0, dt: f(w)
    solve = make_newton_solver(residual, cfg, IDENT_PC)
    return solve(jnp.asarray([x0]), jnp.asarray([x0]), jnp.asarray(1.0))


def test_limit_cycle_aborts_early():
    # classic Newton 2-cycle: x^3 - 2x + 2 from x0=0 bounces 0 <-> 1
    # (||F||: 2, 1, 2, 1, ...) and never converges
    f = lambda w: w**3 - 2.0 * w + 2.0
    base = SolverConfig(newton_max_iters=10, krylov_rtol=1e-10)
    full = _solve_scalar(f, 0.0, base)
    assert not bool(full.converged)
    assert int(full.iters) == 10  # walked the whole budget

    abort = _solve_scalar(f, 0.0, dataclasses.replace(base,
                                                      newton_stall_abort=3))
    assert not bool(abort.converged)
    assert int(abort.iters) <= 5  # best=1 set at k=1; stalled 3 later
    assert int(abort.krylov_iters) < int(full.krylov_iters)


def test_converging_solve_untouched():
    f = lambda w: w**3 - 1.0
    base = SolverConfig(newton_max_iters=30, krylov_rtol=1e-10)
    full = _solve_scalar(f, 2.0, base)
    abort = _solve_scalar(f, 2.0, dataclasses.replace(base,
                                                      newton_stall_abort=3))
    assert bool(full.converged) and bool(abort.converged)
    assert int(full.iters) == int(abort.iters)
    assert float(jnp.abs(abort.x[0] - 1.0)) < 1e-6


def test_report_atol_floor_blocks_abort():
    # force a stall AFTER the SNES-equivalent threshold is crossed: converge
    # ||F|| to ~1e-7 (< report_atol) then freeze via a residual floor.
    # x^3 - 1 + 1e-7 tanh(100(x-1)): near x=1 the perturbation pins ||F||
    # around 1e-7 — below report_atol=1e-5 but above newton_atol=1e-12, so
    # the solve stalls there. The abort must NOT convert this into a
    # failure: SNES-equivalent acceptance (report_atol) already fired.
    f = lambda w: w**3 - 1.0 + 1e-7 * jnp.tanh(100.0 * (w - 1.0))
    cfg = SolverConfig(newton_max_iters=12, newton_atol=1e-12,
                       newton_rtol=1e-30, newton_stol=0.0,
                       report_atol=1e-5, krylov_rtol=1e-12,
                       newton_stall_abort=2)
    res = _solve_scalar(f, 2.0, cfg)
    assert bool(res.converged)  # resurrected by the report_atol test
