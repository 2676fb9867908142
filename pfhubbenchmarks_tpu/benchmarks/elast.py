"""Linear-elasticity cantilever (the reference's solver-validation demo).

Reference: dolfin/elast.py — 25x1 domain, 250x10 crossed mesh (:17-21),
E=1e5, nu=0.3 plane-strain Lame parameters (:37-41), gravity load
f=(0, -1e-3) (:43-44), clamped left edge (:47-52), solved with SNES +
GMRES + AMG ("SOR was causing problems" :83 — the multigrid preconditioner
is our AMG equivalent). Steady problem: one Newton solve (linear => one
iteration + convergence check).

Exercises vector-valued P1 fields (displacement (ux, uy)) whose fluxes
couple through the symmetric gradient.
"""

from __future__ import annotations

import dataclasses

from pfhubbenchmarks_tpu.benchmarks.base import BenchmarkProblem
from pfhubbenchmarks_tpu.config import SolverConfig, TimeConfig
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.fem.sample import eval_at_points


@dataclasses.dataclass(frozen=True)
class ElastParams:
    E: float = 1e5
    nu: float = 0.3
    rho_g: float = 1e-3

    @property
    def mu(self) -> float:
        return self.E / 2.0 / (1.0 + self.nu)

    @property
    def lmda(self) -> float:
        return self.E * self.nu / (1.0 + self.nu) / (1.0 - 2.0 * self.nu)


def make(nx: int = 250, ny: int = 10, Lx: float = 25.0, Ly: float = 1.0,
         params: ElastParams = ElastParams(), pad_to: tuple = (1, 1),
         **overrides) -> BenchmarkProblem:
    p = params
    mu, lmda = p.mu, p.lmda

    def stress(dux, duy):
        exx = dux[0]
        eyy = duy[1]
        exy = 0.5 * (dux[1] + duy[0])
        tr_e = exx + eyy
        sxx = lmda * tr_e + 2.0 * mu * exx
        syy = lmda * tr_e + 2.0 * mu * eyy
        sxy = 2.0 * mu * exy
        return sxx, syy, sxy

    def terms(ctx):
        dux, duy = ctx.du
        sxx, syy, sxy = stress(dux, duy)
        # F = int sigma(u):eps(u_) - f . u_  (dolfin/elast.py:65)
        src = [0.0, p.rho_g]
        flux = [(sxx, sxy), (sxy, syy)]
        return src, flux

    def strain_energy(ctx):
        dux, duy = ctx.du
        sxx, syy, sxy = stress(dux, duy)
        exx, eyy = dux[0], duy[1]
        exy = 0.5 * (dux[1] + duy[0])
        return 0.5 * (sxx * exx + syy * eyy + 2.0 * sxy * exy)

    grid = CrossedTriGrid(nx, ny, Lx, Ly, pad_to=pad_to)

    def tip_deflection(w):
        """u_y at the free-end midline (the reference plots 1e3*u,
        elast.py:126; Euler-Bernoulli check: ~ -3 rho_g L^4 / (2 E H^2))."""
        return eval_at_points(grid, w, Lx, Ly / 2.0)[1]

    return BenchmarkProblem(
        name="elast",
        grid=grid,
        field_names=("ux", "uy"),
        terms=terms,
        ic_fns=[lambda x, y: 0.0 * x, lambda x, y: 0.0 * x],
        observables={"strain_energy": strain_energy},
        custom_observables={"tip_deflection": tip_deflection},
        csv_columns=("time", "strain_energy", "tip_deflection"),
        time=TimeConfig(t0=0.0, dt0=1.0, end_time=0.5, dt_min=1.0),
        # Dense MXU inverse + full-f64 FGMRES: the thin beam is
        # compliance-dominated (||A||·||u||/||b|| ~ 1e6), so (a)
        # smoother-based V-cycles flatline in the residual norm (the
        # reference's SOR did too — "SOR was causing problems",
        # dolfin/elast.py:83 — and it fell back to hypre AMG), and (b) ANY
        # f32 Krylov path floors at eps32·||A||·||u|| ~ 2e-5, far above
        # KSP rtol·||b||. The row-equilibrated dense inverse
        # (solve/precond.make_dense_precond; Newton–Schulz-refined
        # mxu_inverse on TPU) is applied as a PRECONDITIONER under f64
        # FGMRES rather than as a Richardson quasi-direct solve: at
        # cond ~1e6 an f32 factor carries a tail of amplified error modes
        # (measured 1.6e-1 application residual on the v5e pre-refinement,
        # chain_r19 — Newton-as-refinement floored at |F| ~ 1.2e-3 through
        # 61 dt-retries) on which any stationary iteration stalls, while
        # GMRES spends ~one basis vector per outlier mode and converges
        # regardless of M's quality tail. mixed_precision=False: the
        # problem is linear — one emulated-f64 J·v at 10.5k dofs per
        # iteration is negligible — and it removes the f32 Krylov
        # cancellation floor.
        # dense_refine_iters=0: under f64 FGMRES the raw mxu factor's
        # 1.6e-1 application residual is ALREADY a ~0.16-contraction
        # preconditioner (rtol 1e-8 in ~a dozen basis vectors), and each
        # Newton–Schulz pass costs ~40 s of f64-EMULATED n³ matmuls at
        # n=10.5k (measured: the refined run was 126 s warm, chain_r20,
        # ~120 s of it refinement). Refinement is for stationary
        # consumers of M (Richardson/direct-solve use), not for GMRES.
        # precond_lag='solve': the problem is LINEAR — J never changes —
        # so the dense factor is built once per solve, not per Newton
        # iteration.
        solver=SolverConfig(line_search="basic", newton_max_iters=4,
                            precond="dense", krylov="fgmres",
                            mixed_precision=False, krylov_rtol=1e-8,
                            krylov_max_iters=100, gmres_restart=50,
                            precond_lag="solve", dense_refine_iters=0),
        dirichlet_spec=(
            (0, "left", lambda y: 0.0 * y),
            (1, "left", lambda y: 0.0 * y),
        ),
        **overrides,
    )


if __name__ == "__main__":
    from pfhubbenchmarks_tpu.benchmarks.registry import main

    main("elast")
