"""Host-orchestrated damped Newton — the robust fallback solve.

The jitted production solver runs basic (full-step) Newton entirely on
device; near a dt-fold (e.g. bench3's t=36.47 -> 41.59 step, where the
implicit-Euler branch turns just below the target dt) full steps
limit-cycle and a damped line search is required. Compiling a bt variant
of the full Newton program is not always possible on the tunneled TPU
worker for the largest grids (observed: the 350^2 bt program reliably
crashes the worker), so this module splits the solve into dispatches no
larger than the production program:

  - ``lin_solve``: residual + preconditioner build + one Krylov solve
    (the body of a Newton iteration, without the outer loop),
  - ``res_norm``: one residual evaluation,

and runs the Armijo backtracking ladder on the host. Each dispatch is
seconds, so the tunnel never sees a multi-minute silent call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.krylov import SOLVERS


def _cast(t, dt_):
    return jtu.tree_map(lambda a: a.astype(dt_), t)


def make_host_damped_newton(problem, *, max_iters: int = 40,
                            lam_min: float = 1e-4):
    """Returns ``solve(w_guess, w_prev, dt) -> (x, converged, norm)``."""
    cfg = problem.solver
    residual = problem.residual()
    lowp = getattr(problem, "residual_lowp", lambda: None)()
    pre_build = problem.precond_builder()
    kry = SOLVERS[cfg.krylov]
    kw = dict(rtol=cfg.krylov_rtol, atol=cfg.krylov_atol,
              maxiter=cfg.krylov_max_iters)
    if cfg.krylov != "bicgstab":
        kw["restart"] = cfg.gmres_restart

    @jax.jit
    def lin_solve(x, w_prev, dt):
        F = residual(x, w_prev, dt)
        nF = tr.norm(F)
        Minv = pre_build(x, w_prev, dt)
        if lowp is not None:
            x32 = _cast(x, jnp.float32)
            wp32 = _cast(w_prev, jnp.float32)
            dt32 = jnp.asarray(dt, jnp.float32)
            _, jvp = jax.linearize(lambda u: lowp(u, wp32, dt32), x32)
            sol = kry(jvp, _cast(tr.neg(F), jnp.float32), Minv=Minv, **kw)
            d = _cast(sol.x, nF.dtype)
        else:
            _, jvp = jax.linearize(lambda u: residual(u, w_prev, dt), x)
            Mc = lambda r: _cast(Minv(r), nF.dtype)
            sol = kry(jvp, tr.neg(F), Minv=Mc, **kw)
            d = sol.x
        return d, nF

    @jax.jit
    def res_norm(x, w_prev, dt):
        return tr.norm(residual(x, w_prev, dt))

    @jax.jit
    def try_step(x, d, lam):
        return tr.axpy(lam, d, x)

    def solve(w_guess, w_prev, dt):
        x = w_guess
        nF = None
        for _ in range(max_iters):
            d, nF = lin_solve(x, w_prev, dt)
            nF = float(nF)
            if not jnp.isfinite(nF):
                return x, False, nF
            if nF < cfg.newton_atol:
                return x, True, nF
            lam, accepted = 1.0, False
            while lam >= lam_min:
                xn = try_step(x, d, lam)
                nn = float(res_norm(xn, w_prev, dt))
                # Armijo on ||F|| (PETSc bt default semantics)
                if jnp.isfinite(nn) and nn <= (1.0 - 1e-4 * lam) * nF:
                    x, accepted = xn, True
                    break
                lam *= 0.5
            if not accepted:
                return x, False, nF
        nF = float(res_norm(x, w_prev, dt))
        return x, nF < cfg.newton_atol, nF

    return solve
