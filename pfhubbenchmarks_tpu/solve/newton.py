"""On-device Newton(-Krylov) with PETSc SNES 'newtonls' semantics.

Replaces DOLFIN's NonlinearVariationalSolver / PETSc SNES
(dolfin/bench1.py:76-111; explicit callbacks in
dolfinx/pfbase/pde_problems.py:113-185). The entire nonlinear solve — Newton
iterations, the inner Krylov solve, line search, convergence control — is one
``lax.while_loop`` under ``jit``: a single device dispatch per solve attempt.

Convergence mirrors SNES defaults as configured by the reference:
  converged: ||F|| < atol (1e-6)  or  ||F|| < rtol * ||F0|| (1e-8)
  diverged:  ||F|| > divtol * ||F0||, NaN, linear-solve failure, or max_it
Iteration counts feed the reference's adaptive-dt rule (timeloop.py).

The Jacobian is never materialized: J·v comes from ``jax.linearize`` of the
assembled residual (the AD counterpart of UFL ``derivative``,
dolfin/bench1.py:68).
"""

from __future__ import annotations

import typing


import jax
import jax.numpy as jnp
from jax import lax

from pfhubbenchmarks_tpu.config import SolverConfig
from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.krylov import SOLVERS


class NewtonResult(typing.NamedTuple):
    x: typing.Any
    iters: jnp.ndarray          # Newton iterations (SNES-equivalent count
                                # when SolverConfig.report_atol is set)
    converged: jnp.ndarray      # bool
    res_norm: jnp.ndarray       # final ||F||
    krylov_iters: jnp.ndarray   # cumulative inner iterations (observability)
    norm_hist: jnp.ndarray = None  # ||F_k|| per Newton iteration (inf-padded)


def _make_line_search(kind: str, res_fn):
    """Returns ls(x, d, F, normF) -> step length lambda.

    'basic': full step (dolfin/bench1.py:93).
    'bt': Armijo backtracking on ||F||^2 with halving (PETSc bt, simplified).
    'cp': one secant step on g(l) = <F(x + l d), d> (PETSc cp default
          max_its=1; dolfin/bench2.py:140, bench6.py:117).

    ``res_fn(x, gate)`` may route through the two-stage precision residual
    (f32 evaluation while ``gate`` — the current ||F|| — is far from the
    convergence thresholds); line-search quantities only steer the step
    length, so f32's ~1e-7 relative error is immaterial at large ||F||.
    """

    if kind == "basic":
        return lambda x, d, F, normF: jnp.asarray(1.0, normF.dtype)

    if kind == "cp":
        def ls(x, d, F, normF):
            # PETSc SNESLineSearchCP, max_its=1 (the default): one secant
            # update for the root of g(l) = <F(x + l d), d> starting from
            # (l, g) pairs (0, g0) and (1, g1).
            #
            # Deviation from PETSc: cp assumes the residual is (close to) a
            # gradient; on the nonsymmetric CH block system <F, d> can vanish
            # with a perfectly good Newton direction, the secant then returns
            # l ~ 0, and the stol test freezes the state (observed on bench2
            # at t~31 — PETSc would freeze identically). A degenerate secant
            # (l ~ 0 or non-finite) falls back to the full Newton step.
            g0 = tr.vdot(F, d)
            F1 = res_fn(tr.add(x, d), normF)
            g1 = tr.vdot(F1, d)
            denom = g1 - g0
            lam = jnp.where(denom != 0, -g0 / jnp.where(denom != 0, denom, 1.0), 1.0)
            bad = (~jnp.isfinite(lam)) | (jnp.abs(lam) < 1e-3)
            return jnp.where(bad, jnp.asarray(1.0, normF.dtype), lam)
        return ls

    if kind == "bt":
        def ls(x, d, F, normF):
            alpha = 1e-4
            f0 = normF * normF

            # up to 10 halvings, stop at first sufficient decrease
            def scan_body(lam, _):
                Ft = res_fn(tr.axpy(lam, d, x), normF)
                ft = tr.vdot(Ft, Ft)
                ok = ft <= (1.0 - 2.0 * alpha * lam) * f0
                new_lam = jnp.where(ok, lam, lam * 0.5)
                return new_lam, ok

            lam = jnp.asarray(1.0, normF.dtype)
            lam, oks = lax.scan(scan_body, lam, None, length=10)
            return lam
        return ls

    raise ValueError(f"unknown line search {kind!r}")


def make_newton_solver(residual, cfg: SolverConfig, precond_build, *, jit=True,
                       residual_lowp=None, lowp_jvp_factory=None,
                       krylov_residual_lowp=None):
    """Build ``solve(w_guess, w_prev, dt) -> NewtonResult``.

    ``residual(w, w_prev, dt)`` is the assembled weak-form residual;
    ``precond_build(w, w_prev, dt) -> Minv`` a preconditioner factory.

    Mixed precision: when ``residual_lowp`` (an f32 build of the same weak
    form) is provided, the entire Krylov solve — J.v products, basis
    operations, preconditioner — runs in float32 while Newton-level residuals
    / norms / convergence tests stay float64. Inexact Newton at KSP rtol 1e-5
    is insensitive to f32's ~1e-6-relative J.v accuracy, and f64 on TPU is
    emulated (~2x slower per op and a far bigger compiled program).

    ``krylov_residual_lowp`` (config.krylov_operator='precond_rule'): an f32
    residual whose LINEARIZATION becomes the Krylov operator instead of
    ``residual_lowp``'s — defect-correction inexact Newton (the Newton-level
    staged residual / line search keep the true-rule ``residual_lowp``).
    """
    krylov = SOLVERS[cfg.krylov]
    if cfg.krylov_forcing == "ew" and cfg.ew_dt_min is None:
        import warnings

        warnings.warn(
            "krylov_forcing='ew' with no ew_dt_min gate: ungated EW was "
            "measured to break adaptive-controller parity (bench1 matched "
            "rows 21->13, bench2 28->13 — round-3 labs). Set ew_dt_min to a "
            "calibrated gate (bench1 uses 5.0) or to 0.0 to silence this "
            "warning and run ungated.", stacklevel=2)
    # inexact-Newton truncation floor (config.SolverConfig.krylov_atol_frac):
    # don't solve linear systems decades below the nonlinear tolerance
    krylov_atol = max(cfg.krylov_atol, cfg.krylov_atol_frac * cfg.newton_atol)
    krylov_kwargs = dict(rtol=cfg.krylov_rtol, atol=krylov_atol,
                         maxiter=cfg.krylov_max_iters, restart=cfg.gmres_restart)
    if cfg.krylov == "bicgstab":
        krylov_kwargs.pop("restart")
    if cfg.krylov == "fgmres" and cfg.fgmres_aug:
        krylov_kwargs["n_aug"] = cfg.fgmres_aug

    import jax.tree_util as jtu

    def _cast(t, dt_):
        return jtu.tree_map(lambda a: a.astype(dt_), t)

    kry_res_lowp = krylov_residual_lowp

    def solve(w_guess, w_prev, dt):
        res_fn = lambda w: residual(w, w_prev, dt)
        if residual_lowp is not None:
            lowp = jnp.float32
            w_prev_lp = _cast(w_prev, lowp)
            dt_lp = jnp.asarray(dt, lowp)
            kry_lowp_fn = kry_res_lowp or residual_lowp

        # Two-stage precision residual: f64 on TPU is EMULATED and the f64
        # assembly dominates per-Newton overhead on the big grids. The f32
        # assembly's error is CANCELLATION noise (residual entries are tiny
        # differences of O(1) element contributions), so its useful range is
        # bounded below by a state-dependent noise floor — measured once per
        # solve as ||F32(w_guess) - F64(w_guess)||. f32 evaluation is used
        # only while ||F|| > margin * floor (margin 1000: RHS relative error
        # <0.1%, which leaves every Newton contraction and hence the
        # controller-visible iteration counts unchanged — verified per
        # benchmark on CPU), and never below 100x atol / 10x report_atol.
        if residual_lowp is not None and cfg.fast_residual:
            F0_32 = residual_lowp(_cast(w_guess, lowp), w_prev_lp, dt_lp)
            F0 = res_fn(w_guess)
            floor = tr.norm(tr.sub(_cast(F0_32, F0[0].dtype), F0))
            switch = jnp.maximum(
                cfg.fast_residual_margin * floor,
                max(cfg.newton_atol * 100.0, (cfg.report_atol or 0.0) * 10.0))

            def res_staged(x, gate):
                F32 = residual_lowp(_cast(x, lowp), w_prev_lp, dt_lp)
                n32 = tr.norm(F32).astype(gate.dtype)
                need64 = (gate < switch) | (n32 < switch)
                return lax.cond(
                    need64, lambda _: res_fn(x),
                    lambda _: _cast(F32, gate.dtype), None)
        else:
            F0 = res_fn(w_guess)

            def res_staged(x, gate):
                return res_fn(x)

        n0 = tr.norm(F0)
        # Line-search residuals only steer the step length (cp's secant /
        # bt's sufficient-decrease test) — they never enter the carry, the
        # Krylov RHS, or a convergence decision — so a two-stage f32 path
        # here is count-safe where fast_residual is not: at large ||F|| the
        # f32 evaluation perturbs lambda by ~the assembly noise floor /
        # ||F|| << 1, and near the thresholds it self-selects f64.
        # bench2 pays one f64 residual per Newton iteration for cp
        # (measured 4.7 ms each, 583 iterations).
        if residual_lowp is not None and cfg.fast_linesearch \
                and cfg.line_search != "basic":
            F0_ls = (residual_lowp(_cast(w_guess, lowp), w_prev_lp, dt_lp)
                     if not cfg.fast_residual else F0_32)
            floor_ls = tr.norm(tr.sub(_cast(F0_ls, F0[0].dtype), F0))
            switch_ls = jnp.maximum(
                cfg.fast_residual_margin * floor_ls,
                max(cfg.newton_atol * 100.0, (cfg.report_atol or 0.0) * 10.0))

            def ls_res(x, gate):
                F32 = residual_lowp(_cast(x, lowp), w_prev_lp, dt_lp)
                n32 = tr.norm(F32).astype(gate.dtype)
                need64 = (gate < switch_ls) | (n32 < switch_ls)
                return lax.cond(
                    need64, lambda _: res_fn(x),
                    lambda _: _cast(F32, gate.dtype), None)

            line_search = _make_line_search(cfg.line_search, ls_res)
        else:
            line_search = _make_line_search(cfg.line_search, res_staged)
        # 'solve' lag: one build at the initial guess, reused across Newton
        # iterations (hoisted out of the while_loop as a loop-invariant).
        # A lagged preconditioner must NOT expose the fused minv_matvec pair
        # (its A z is linearized at the lagged state — using it as the outer
        # matvec would turn Newton into modified-Newton); wrap to a plain
        # preconditioner so FGMRES falls back to the true J.v.
        Minv_lagged = None
        if cfg.precond_lag == "solve":
            _M = precond_build(w_guess, w_prev, dt)
            Minv_lagged = ((lambda r: _M(r))
                           if hasattr(_M, "minv_matvec") else _M)

        hist0 = jnp.full(cfg.newton_max_iters + 1, jnp.inf,
                         n0.dtype).at[0].set(n0)
        state0 = dict(
            x=w_guess, F=F0, normF=n0,
            k=jnp.array(0, jnp.int32),
            kiters=jnp.array(0, jnp.int32),
            converged=n0 < cfg.newton_atol,
            failed=~jnp.isfinite(n0),
            hist=hist0,
        )
        if cfg.krylov_forcing == "ew":
            state0["eta"] = jnp.asarray(cfg.ew_eta0, n0.dtype)
        if cfg.newton_stall_abort:
            state0["best"] = n0
            state0["since"] = jnp.array(0, jnp.int32)

        def cond(s):
            return (~s["converged"]) & (~s["failed"]) & (s["k"] < cfg.newton_max_iters)

        def body(s):
            x, F = s["x"], s["F"]
            if cfg.krylov_forcing == "ew":
                # dt-gated forcing (config.ew_dt_min): below the gate use the
                # fixed KSP rtol (controller-parity regime), above it the EW
                # eta. dt may be traced (fused driver), so select with where.
                eta = s["eta"] if not cfg.ew_dt_min else jnp.where(
                    jnp.asarray(dt, s["eta"].dtype) >= cfg.ew_dt_min,
                    s["eta"], jnp.asarray(cfg.krylov_rtol, s["eta"].dtype))
                kw = dict(krylov_kwargs, rtol=eta)
            else:
                kw = krylov_kwargs
            Minv = (Minv_lagged if Minv_lagged is not None
                    else precond_build(x, w_prev, dt))
            if residual_lowp is not None:
                x_lp = _cast(x, lowp)
                if lowp_jvp_factory is not None:
                    jvp_fn = lowp_jvp_factory(x_lp, w_prev_lp, dt_lp)
                else:
                    _, jvp_fn = jax.linearize(
                        lambda u: kry_lowp_fn(u, w_prev_lp, dt_lp), x_lp)
                sol = krylov(jvp_fn, _cast(tr.neg(F), lowp), Minv=Minv,
                             **kw)
                d = _cast(sol.x, s["normF"].dtype)
                res_norm64 = sol.res_norm.astype(s["normF"].dtype)
            else:
                _, jvp_fn = jax.linearize(res_fn, x)
                # preconditioners may work internally in f32; keep the Krylov
                # vectors in the solver dtype
                Mc = (lambda M: lambda r: _cast(M(r), s["normF"].dtype))(Minv)
                sol = krylov(jvp_fn, tr.neg(F), Minv=Mc, **kw)
                d = sol.x
                res_norm64 = sol.res_norm
            sol = sol._replace(x=d, res_norm=res_norm64)
            lam = line_search(x, sol.x, F, s["normF"])
            xn = tr.axpy(lam, sol.x, x)
            # the staged residual self-selects f64 when its f32 norm lands
            # near the thresholds, so an inf gate maximizes f32 coverage
            Fn = res_staged(xn, jnp.asarray(jnp.inf, s["normF"].dtype))
            nn = tr.norm(Fn)
            k = s["k"] + 1
            # SNESConvergedDefault: atol, rtol vs ||F0||, and the step-size
            # test snorm <= stol * xnorm (stol default 1e-8). The stol test
            # is only meaningful when the linear solve converged — a stalled
            # solve can return a near-zero step, and accepting it freezes the
            # state while time advances (observed on bench2: TFE flatlined
            # from t~31 under a diverging V-cycle + cp line search).
            snorm = jnp.abs(lam) * tr.norm(sol.x)
            xnorm = tr.norm(xn)
            converged = ((nn < cfg.newton_atol) | (nn < cfg.newton_rtol * n0)
                         | ((snorm <= cfg.newton_stol * xnorm) & sol.converged))
            # Linear-solve nonconvergence alone is NOT a Newton failure:
            # PETSc's left-preconditioned GMRES "converges" in the
            # SOR-preconditioned norm on solves where a true-residual
            # criterion stagnates, yet the inexact step still contracts
            # ||F|| (observed: lin res 1e-3 relative, Newton converges in 6).
            # A linear solve that made essentially NO progress (residual
            # still >10% of ||b|| = ||F||) marks genuine Jacobian
            # intractability at this dt -> fail fast, mirroring
            # SNES DIVERGED_LINEAR_SOLVE on a truly stuck KSP.
            lin_useless = (~sol.converged) & (sol.res_norm > 0.1 * s["normF"])
            failed = (~jnp.isfinite(nn)) | (nn > cfg.newton_div_tol * n0) | lin_useless
            if cfg.newton_stall_abort:
                # Doomed-attempt abort (config.newton_stall_abort): no 0.9x
                # improvement of the best ||F|| for `stall_abort` consecutive
                # iterations -> fail now instead of walking to max_iters.
                # Decision-safe gates: never fires once the best ||F|| is
                # under report_atol (the SNES-equivalent acceptance test
                # would already have accepted) or within 10x of newton_atol.
                improved = nn < 0.9 * s["best"]
                since = jnp.where(improved, 0, s["since"] + 1)
                best = jnp.minimum(nn, s["best"])
                floor = max(cfg.report_atol or 0.0, 10.0 * cfg.newton_atol)
                failed = failed | ((since >= cfg.newton_stall_abort)
                                   & (best > floor) & ~converged)
            out = dict(x=xn, F=Fn, normF=nn, k=k,
                       kiters=s["kiters"] + sol.iters,
                       converged=converged, failed=failed,
                       hist=s["hist"].at[k].set(nn))
            if cfg.newton_stall_abort:
                out["best"] = best
                out["since"] = since
            if cfg.krylov_forcing == "ew":
                # EW choice 2 (alpha=2) with the standard safeguard: don't
                # drop eta faster than gamma*eta_{k-1}^2 once that bound is
                # active (>0.1), cap at eta_max, never looser than eta_max
                # and never tighter than the fixed KSP rtol.
                ratio = nn / jnp.maximum(s["normF"], 1e-300)
                eta_raw = cfg.ew_gamma * ratio * ratio
                safe = cfg.ew_gamma * s["eta"] * s["eta"]
                eta_n = jnp.maximum(eta_raw, jnp.where(safe > 0.1, safe, 0.0))
                eta_n = jnp.clip(eta_n, cfg.krylov_rtol, cfg.ew_eta_max)
                out["eta"] = eta_n.astype(s["eta"].dtype)
            return out

        out = lax.while_loop(cond, body, state0)
        converged = out["converged"] & ~out["failed"]
        iters = out["k"]
        if cfg.report_atol is not None:
            # SNES-equivalent iteration count: the committed reference CSVs
            # were produced by SNES whose atol=1e-6 test fires at what is
            # ~report_atol in our identically-assembled residual norm
            # (calibrated per benchmark with tools/parity_lab.py). The state
            # is still solved to the tighter newton_atol; only the count fed
            # to the adaptive-dt controller — and acceptance when the
            # emulated test passed but ours didn't finish in max_iters —
            # follow the reference's effective test.
            hit = out["hist"] < cfg.report_atol
            iters = jnp.where(hit.any(), jnp.argmax(hit).astype(jnp.int32), iters)
            converged = converged | (hit.any() & ~out["failed"])
        return NewtonResult(out["x"], iters, converged, out["normF"],
                            out["kiters"], out["hist"])

    return jax.jit(solve) if jit else solve
