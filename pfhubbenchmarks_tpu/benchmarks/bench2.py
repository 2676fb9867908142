"""PFHub Benchmark 2: Ostwald ripening — CH + 4 Allen-Cahn order parameters.

Reference: dolfin/bench2.py — 200x200 domain, 100x100 crossed mesh, 6-field
mixed element (c, mu, eta1..eta4) (:45-52), params rho=sqrt(2),
kappa_c=kappa_eta=3, M=5, w=1, alpha=5, L=5 (:33-42), two-phase f_chem with
quintic interpolation + 4-well & pairwise penalty (:76-99), ICs
pfbase.py:262-291, dt0=1e-2, dt_min=1e-4, end_time=100 (:220-223),
line search 'cp' (:140).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from pfhubbenchmarks_tpu.benchmarks.base import BenchmarkProblem
from pfhubbenchmarks_tpu.config import SolverConfig, TimeConfig
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.models import forms

NUM_ETA = 4


@dataclasses.dataclass(frozen=True)
class Bench2Params:
    c_alpha: float = 0.3
    c_beta: float = 0.7
    rho: float = math.sqrt(2.0)
    kappa_c: float = 3.0
    kappa_eta: float = 3.0
    M: float = 5.0
    w: float = 1.0
    alpha: float = 5.0
    L: float = 5.0
    c0: float = 0.5
    epsilon: float = 0.05
    epsilon_eta: float = 0.1
    psi: float = 1.5


def ic_c(p: Bench2Params):
    def fn(x, y):
        return p.c0 + p.epsilon * (
            np.cos(0.105 * x) * np.cos(0.11 * y)
            + (np.cos(0.13 * x) * np.cos(0.087 * y)) ** 2
            + np.cos(0.025 * x - 0.15 * y) * np.cos(0.07 * x - 0.02 * y)
        )

    return fn


def ic_eta(p: Bench2Params, i: int):
    """pfbase.py:279-288 — note the reference mixes ``ii = i + 1`` in the
    first two terms with plain ``i`` in the psi term; reproduced exactly."""
    ii = i + 1.0

    def fn(x, y):
        return p.epsilon_eta * (
            np.cos((0.01 * ii) * x - 4.0) * np.cos((0.007 + 0.01 * ii) * y)
            + np.cos((0.11 + 0.01 * ii) * x) * np.cos((0.11 + 0.01 * ii) * y)
            + p.psi * (
                np.cos((0.046 + 0.001 * i) * x - (0.0405 + 0.001 * i) * y)
                * np.cos((0.031 + 0.001 * i) * x - (0.004 + 0.001 * i) * y)
            ) ** 2
        ) ** 2

    return fn


def make(nx: int = 100, ny: int = 100, Lx: float = 200.0, Ly: float = 200.0,
         params: Bench2Params = Bench2Params(), pad_to: tuple = (1, 1),
         num_eta: int = NUM_ETA, **overrides) -> BenchmarkProblem:
    """num_eta < 4 gives the reference's reduced debugging variants
    (dolfin/bench2_eta1.py / bench2_eta2.py) used to isolate instability."""
    p = params
    rho2 = p.rho ** 2

    def hsum(etas):
        return sum(forms.h(e) for e in etas)

    def f_chem(c, etas):
        f_a = rho2 * (c - p.c_alpha) ** 2
        f_b = rho2 * (c - p.c_beta) ** 2
        H = hsum(etas)
        dw = sum(e**2 * (1.0 - e) ** 2 for e in etas)
        pair = 0.0
        for i in range(num_eta):
            for j in range(i + 1, num_eta):
                pair = pair + etas[i] ** 2 * etas[j] ** 2
        return f_a * (1.0 - H) + f_b * H + p.w * (dw + p.alpha * pair)

    def make_terms(split: bool):
        """``split=True`` gives the field-split preconditioner's terms: same
        VALUES (stop_gradient is identity on primals) but cross-group
        couplings — etas seen by the CH rows, (c, other etas) seen by each
        AC row — are differentiation-stopped, so every jvp/linearize of it
        yields the block-diagonal Jacobian diag(J_CH, J_AC1..J_AC4). JAX
        propagates the symbolic-zero tangents, so the preconditioner's
        in-kernel tangent assemblies skip the cross-coupling FLOPs too."""
        import jax

        sg = jax.lax.stop_gradient if split else (lambda v: v)

        def dfdc(c, etas):
            H = hsum([sg(e) for e in etas])
            return 2.0 * rho2 * ((c - p.c_alpha) * (1.0 - H)
                                 + (c - p.c_beta) * H)

        def dfdeta(c, etas, i):
            cc = sg(c)
            f_a = rho2 * (cc - p.c_alpha) ** 2
            f_b = rho2 * (cc - p.c_beta) ** 2
            e = etas[i]
            others_sq = sum(sg(etas[j]) ** 2
                            for j in range(num_eta) if j != i)
            dwell = 2.0 * e * (1.0 - e) * (1.0 - 2.0 * e)
            return ((f_b - f_a) * forms.dh(e)
                    + p.w * (dwell + 2.0 * p.alpha * e * others_sq))

        def terms(ctx):
            c, mu = ctx.u[0], ctx.u[1]
            etas = ctx.u[2:]
            (sc, fc), (smu, fmu) = forms.cahn_hilliard(
                c, mu, ctx.du[1], ctx.du[0], ctx.u0[0], ctx.dt, p.M,
                p.kappa_c, dfdc(c, etas))
            src = [sc, smu]
            flux = [fc, fmu]
            for i in range(num_eta):
                s_i, f_i = forms.allen_cahn(
                    etas[i], ctx.du[2 + i], ctx.u0[2 + i], ctx.dt, p.L,
                    p.kappa_eta, dfdeta(c, etas, i))
                src.append(s_i)
                flux.append(f_i)
            return src, flux

        return terms

    terms = make_terms(False)

    def tfe_density(ctx):
        c = ctx.u[0]
        etas = ctx.u[2:]
        dc = ctx.du[0]
        e = f_chem(c, etas) + p.kappa_c / 2.0 * (dc[0] ** 2 + dc[1] ** 2)
        for i in range(num_eta):
            de = ctx.du[2 + i]
            e = e + p.kappa_eta / 2.0 * (de[0] ** 2 + de[1] ** 2)
        return e

    return BenchmarkProblem(
        name="bench2" if num_eta == NUM_ETA else f"bench2_eta{num_eta}",
        grid=CrossedTriGrid(nx, ny, Lx, Ly, pad_to=pad_to),
        field_names=("c", "mu") + tuple(f"eta{i+1}" for i in range(num_eta)),
        terms=terms,
        # CH (c, mu) block + one scalar block per eta — enabled by
        # SolverConfig.field_split (config.py)
        terms_precond=make_terms(True),
        field_groups=((0, 1),) + tuple((2 + i,) for i in range(num_eta)),
        ic_fns=[ic_c(p), lambda x, y: 0.0] + [ic_eta(p, i) for i in range(num_eta)],
        observables={
            "total_free_energy": tfe_density,
            "total_solute": lambda ctx: ctx.u[0],
        },
        csv_columns=("time", "total_free_energy", "total_solute"),
        time=TimeConfig(dt0=1e-2, dt_min=1e-4, end_time=100.0, grow_threshold=5),
        # precond_rule dunavant1 (1-pt rule): preconditioner-only; measured
        # newton counts identical, krylov 589 -> 593 over 5 steps (r3 lab)
        # Eisenstat–Walker forcing REJECTED here (r3 CPU full-trajectory
        # lab): ungated EW 0.01/0.03 breaks the matched prefix (13 < 28
        # rows); dt-gated 0.1/0.3 at dt>=1 keeps the bounds but the looser
        # early Newton steps push the controller onto a 146-step trajectory
        # with krylov 12142 vs 8729 fixed (+39%) — bench2's cost is spread
        # over many mid-dt steps, not concentrated in a large-dt tail like
        # bench1's (.scratch/ew_gated_chain.log, ew_traj_b2.log).
        solver=SolverConfig(line_search="cp", precond_rule="dunavant1",
                            # 0.1 probed on TPU: identical 126-step / 583-
                            # Newton trajectory, krylov 8729 -> 8042
                            krylov_atol_frac=0.1,
                            # 8 coarse sweeps (r4 chain_r25): wall 11.44 ->
                            # 10.93 s with the identical 126-step trajectory
                            # (prefix 28, interp TFE 2.769e-2 both) — the
                            # 24-sweep 25² 6-field in-kernel coarse was
                            # serial depth for nothing, exactly as bench1
                            # found (bench1.py gmg_coarse_sweeps note).
                            # Deeper hierarchy instead (min_cells=5) was
                            # re-probed and is still a wash (11.90 s).
                            gmg_coarse_sweeps=8,
                            # stall-abort at 5 (failhist envelope over
                            # converged bench2 attempts: max stall 4):
                            # bench2 wastes 35% of krylov_all in doomed
                            # dt-retry attempts — 10.93 -> 10.47 s with the
                            # identical accepted trajectory (chain_r28
                            # b2_sa5: krylov_all 14005 -> 12400).
                            newton_stall_abort=5,
                            # one pre-sweep on the 6-field 100² fine level
                            # (full strength below): 10.47 -> 10.39 s,
                            # krylov_all 12400 -> 12652, trajectory
                            # identical (chain_r29 b2_nf12). Cutting fine
                            # POST-sweeps doubles iterations (CPU lab
                            # nu_fine 1/1: 16165 vs 8036) — bench2's
                            # smoothing sensitivity lives on the fine level.
                            gmg_nu_fine_pre=1,
                            # FGMRES restart 16: the basis dot/combine ops
                            # are fixed (m+1)-wide per iteration and bench2
                            # carries 6-field basis vectors — 10.39 ->
                            # 10.08 s at krylov_all 12652 -> 12578 with the
                            # identical trajectory (chain_r31 b2_rs16; the
                            # round-3 scan at restart 16/20 was neutral on
                            # bench1's 2-field basis).
                            gmres_restart=16,
                            # field-split preconditioner (CH 2x2 block + 4
                            # decoupled AC blocks, the PETSc -pc_fieldsplit
                            # analog; terms_precond below): each smoother
                            # apply pays 8 pinv plane-FMAs + the decoupled
                            # tangent instead of 36 + the full 6-field
                            # coupling. Accepted krylov rises 8336 -> 9433
                            # (the split preconditioner is weaker) but the
                            # cheaper apply nets 10.08 -> 9.50 s with the
                            # IDENTICAL accepted trajectory (chain_r36
                            # b2fs; prefix 28, interp 2.769e-2 both).
                            # Per-group LMR alphas (field_split_alphas,
                            # default True) are part of the win: alphas=0
                            # measured 9.77 s / krylov_all 14085.
                            field_split=True),
        **overrides,
    )


if __name__ == "__main__":
    from pfhubbenchmarks_tpu.benchmarks.registry import main

    main("bench2")
