"""PFHub Benchmark 6: electrochemistry — Cahn-Hilliard + Poisson coupling.

Reference: dolfin/bench6.py — 100x100 domain, 100x100 crossed mesh (:22-24),
fields (c, mu, phi) (:44-46), params kappa=2, rho=5, M=5, k=0.09,
epsilon=90 (:33-39), electromigration via dfdc = f_chem' + k phi (:68),
Poisson source -k c / epsilon (:72), Dirichlet BCs on phi only: phi=0 left,
phi=sin(y/7) right (:77-90), dt0=1e-2, dt_min=1e-4, end_time=3 (:177-181),
line search 'cp' (:117), KSP max_it 5000 (:135).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pfhubbenchmarks_tpu.benchmarks.base import BenchmarkProblem
from pfhubbenchmarks_tpu.config import SolverConfig, TimeConfig

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.models import forms


@dataclasses.dataclass(frozen=True)
class Bench6Params:
    c_alpha: float = 0.3
    c_beta: float = 0.7
    kappa: float = 2.0
    rho: float = 5.0
    M: float = 5.0
    k: float = 0.09
    epsilon: float = 90.0
    cc0: float = 0.5
    cc1: float = 0.04


def ic_c(p: Bench6Params):
    """pfbase.py:332-334 (note the 0.2 frequency vs bench1's 0.105)."""

    def fn(x, y):
        return p.cc0 + p.cc1 * (
            np.cos(0.2 * x) * np.cos(0.11 * y)
            + (np.cos(0.13 * x) * np.cos(0.087 * y)) ** 2
            + np.cos(0.025 * x - 0.15 * y) * np.cos(0.07 * x - 0.02 * y)
        )

    return fn


def make(nx: int = 100, ny: int = 100, Lx: float = 100.0, Ly: float = 100.0,
         params: Bench6Params = Bench6Params(), pad_to: tuple = (1, 1), **overrides) -> BenchmarkProblem:
    p = params

    def f_chem(c):
        return p.rho * (c - p.c_alpha) ** 2 * (p.c_beta - c) ** 2

    def dfdc_chem(c):
        return 2.0 * p.rho * (c - p.c_alpha) * (p.c_beta - c) * (
            (p.c_beta - c) - (c - p.c_alpha))

    def make_terms(split: bool):
        """``split=True``: the field-split preconditioner's terms — same
        VALUES, but the electromigration coupling (phi seen by the CH
        rows via dfdc, c seen by the Poisson source) is differentiation-
        stopped, so preconditioner linearizations are diag(J_CH(c,mu),
        J_Poisson(phi)). This is exactly the coupling the reference's
        monolithic SNES+SOR fails on at dt=0.64 (see the dt_max note
        below); the outer FGMRES operator keeps the true coupling."""
        import jax

        sg = jax.lax.stop_gradient if split else (lambda v: v)

        def terms(ctx):
            c, mu, phi = ctx.u
            (sc, fc), (smu, fmu) = forms.cahn_hilliard(
                c, mu, ctx.du[1], ctx.du[0], ctx.u0[0], ctx.dt, p.M, p.kappa,
                dfdc_chem(c) + p.k * sg(phi))
            sp, fp = forms.poisson(ctx.du[2], -p.k * sg(c) / p.epsilon, 1.0)
            return [sc, smu, sp], [fc, fmu, fp]

        return terms

    terms = make_terms(False)

    def tfe_density(ctx):
        c, _, phi = ctx.u
        dc = ctx.du[0]
        return (f_chem(c) + p.k * c * phi / 2.0
                + p.kappa / 2.0 * (dc[0] ** 2 + dc[1] ** 2))

    grid = CrossedTriGrid(nx, ny, Lx, Ly, pad_to=pad_to)
    dirichlet_spec = (
        (2, "left", lambda y: 0.0 * y),
        (2, "right", lambda y: np.sin(y / 7.0)),
    )

    return BenchmarkProblem(
        name="bench6",
        grid=grid,
        field_names=("c", "mu", "phi"),
        terms=terms,
        # CH (c, mu) block + Poisson (phi) block — enabled by
        # SolverConfig.field_split
        terms_precond=make_terms(True),
        field_groups=((0, 1), (2,)),
        ic_fns=[ic_c(p), lambda x, y: 0.0, lambda x, y: 0.0],
        observables={
            "total_free_energy": tfe_density,
            "total_solute": lambda ctx: ctx.u[0],
        },
        csv_columns=("time", "total_free_energy", "total_solute"),
        # dt_max=0.32: the committed 14-row reference grid
        # (results/bench6_out.csv) is exactly a dt_max=0.32 walk — SNES+SOR
        # fails EVERY dt=0.64 attempt on the CH+Poisson coupling (parity
        # lab: steps 7-14 each imply one failure at 0.64; our FGMRES+GMG
        # converges there in 3 iterations, so without the cap we finish in
        # 10 rows). The cap emulates the reference solver's effective
        # ceiling transparently; on-grid TFE rel-err 4.9e-7.
        time=TimeConfig(dt0=1e-2, dt_min=1e-4, end_time=3.0, grow_threshold=5,
                        dt_max=0.32),
        # Eisenstat–Walker forcing REJECTED here (r3 CPU full-trajectory
        # lab, .scratch/ew_chain_g2.log): dt-gated EW 0.01/0.03 at the 0.32
        # cap walks the same 14/14 rows with Krylov -28%, but degrades the
        # adaptive walk's TFE parity 4.9e-7 -> 4.2e-6 — bench6 is the one
        # benchmark holding the 1e-6-class curve target on BOTH adaptive
        # and replay artifacts, and at 0.76 s wall the ~0.2 s saving isn't
        # worth trading that away (ungated EW is worse still: golden-row
        # 2.3e-6).
        # split_chain + a 25² exact dense coarse (min_cells=25, cap 3000:
        # the 3-field 25² coarse is 2·(26²+25²)·1.5 ≈ 2 kdofs): measured on
        # the v5e (chain_r19 b6_sc25) 0.545 s wall vs 0.76 s for the
        # whole-V-cycle kernel — the shallower cycle drops the in-kernel
        # 12²-level sweep visits, and the trajectory still walks 14/14
        # reference rows at TFE 5.3e-7 (inside the 1e-6-class bound).
        # precond_lag='solve': one preconditioner (re)build per Newton
        # solve instead of per iteration — measured 0.588 -> 0.550 s on the
        # v5e (chain_r26 b6_lag) with the trajectory still walking 14/14
        # reference rows at TFE 5.1e-7 (inside the 1e-6-class bound).
        # precond_rule='dunavant2': 3-pt-rule V-cycle rediscretization on
        # top of lag — 0.550 -> 0.526 s, krylov 1140 -> 1160, and the walk
        # IMPROVES to 14/14 @ 3.46e-7 (chain_r28 b6_dun2). dunavant1
        # rejected: krylov 2470 (2.1x), 0.782 s.
        solver=SolverConfig(line_search="cp", krylov_max_iters=300,
                            fuse_vcycle="split_chain", gmg_min_cells=25,
                            gmg_dense_coarse_max_dofs=3000,
                            precond_lag="solve",
                            precond_rule="dunavant2"),
        dirichlet_spec=dirichlet_spec,
        **overrides,
    )


if __name__ == "__main__":
    from pfhubbenchmarks_tpu.benchmarks.registry import main

    main("bench6")
