"""PFHub BM1 in 3D: Cahn-Hilliard on a 100^3 box, 50^3 hex/tet mesh.

Reference: dolfin/b13d.py — BoxMesh 50^3 over 100^3 (:24-26), same CH
parameters and IC as BM1 (the 2D cosine IC applied z-invariantly,
pfbase.py:177-193 evaluated at 3D points which ignore x[2]), end_time=50,
dt0=0.1, dt_min=1e-2 (:118-128), SNES basic + GMRES + SOR with
max_it = Nx*Ny*Nz/10 (:97).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.benchmarks.bench1 import Bench1Params
from pfhubbenchmarks_tpu.config import SolverConfig, TimeConfig
from pfhubbenchmarks_tpu.fem.assembly3d import make_functional3d, make_residual3d
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
from pfhubbenchmarks_tpu.models import forms
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi3d


@dataclasses.dataclass
class Benchmark3DProblem:
    """3D analog of BenchmarkProblem (single vertex grid)."""

    name: str
    grid: TetGrid
    field_names: tuple
    terms: object
    ic_fns: list
    observables: dict
    csv_columns: tuple
    time: TimeConfig
    solver: SolverConfig
    # (field, face, fn(c1, c2)) specs -> DirichletBC3D (see fem/assembly3d.py)
    dirichlet_spec: tuple = ()
    needs_coords: bool = False
    dtype: type = jnp.float64
    abort_condition: object = None
    custom_observables: dict = dataclasses.field(default_factory=dict)
    # see BenchmarkProblem.fused_seg_rows (benchmarks/base.py)
    fused_seg_rows: object = None

    @property
    def n_fields(self) -> int:
        return len(self.field_names)

    def dirichlet_for(self, grid):
        from pfhubbenchmarks_tpu.fem.assembly3d import DirichletBC3D

        return tuple(DirichletBC3D.make(grid, f, face, fn)
                     for (f, face, fn) in self.dirichlet_spec)

    @property
    def dirichlet(self):
        return self.dirichlet_for(self.grid)

    def initial_state(self):
        (v,) = self.grid.interpolate(self.ic_fns)
        v = jnp.asarray(v, self.dtype)
        for bc in self.dirichlet:
            v = bc.apply_value(v)
        return (v,)

    def residual(self, dtype=None):
        return make_residual3d(self.grid, self.terms, self.n_fields,
                               dirichlet=self.dirichlet,
                               needs_coords=self.needs_coords,
                               dtype=dtype or self.dtype)

    @property
    def mixed_precision(self) -> bool:
        return self.solver.mixed_precision and self.dtype == jnp.float64

    def _krylov_grid(self):
        """config.krylov_operator='precond_rule': the outer Krylov J.v
        assembles at the precond rule (keast2: nq 8 -> 4 — the 3D J.v is
        the per-iteration FLOP bulk). Default: the true-rule grid."""
        import dataclasses as _dc

        s = self.solver
        if s.krylov_operator == "precond_rule" and s.precond_rule:
            return _dc.replace(self.grid, rule_name=s.precond_rule)
        return self.grid

    def residual_lowp(self):
        # TRUE-rule f32: the staged (fast_residual) Newton residual rides
        # this even under krylov_operator='precond_rule'
        return self.residual(dtype=jnp.float32) if self.mixed_precision else None

    def krylov_residual_lowp(self):
        """Cheap-rule f32 residual whose linearization is the Krylov
        operator under config.krylov_operator='precond_rule'."""
        kg = self._krylov_grid()
        if not self.mixed_precision or kg is self.grid:
            return None
        return make_residual3d(kg, self.terms, self.n_fields,
                               dirichlet=self.dirichlet,
                               needs_coords=self.needs_coords,
                               dtype=jnp.float32)

    def _pallas_backend_ok(self) -> bool:
        if self.solver.use_pallas == "off" or self.needs_coords:
            return False
        if self.solver.use_pallas == "on":
            return True
        import jax

        return "TPU" in jax.devices()[0].device_kind

    def lowp_jvp_factory(self):
        """z-slab-tiled Pallas J.v for the outer Krylov matvec (true rule,
        or the precond rule under config.krylov_operator='precond_rule').
        The XLA einsum J.v at 50³ measured 5.7 ms (r3 attribution); the
        tiled kernel assembles in-register."""
        if not (self.mixed_precision and self._pallas_backend_ok()
                and not self.dirichlet_spec):
            return None
        import jax.numpy as jnp_

        from pfhubbenchmarks_tpu.ops.pallas3d import (choose_block_zrows,
                                                      make_tiled_jvp3d)

        kg = self._krylov_grid()
        nq = kg.tab().nq
        bc = choose_block_zrows(kg, self.n_fields, nq)
        if bc is None:
            return None
        prep, jv = make_tiled_jvp3d(kg, self.terms, self.n_fields,
                                    dtype=jnp_.float32, block_rows=bc)

        def factory(w_lp, w0_lp, dt_lp):
            staged = prep(w_lp, w0_lp)
            return lambda v: jv(v, staged, dt_lp)

        return factory

    def precond_builder(self):
        kry_dtype = jnp.float32 if self.mixed_precision else self.dtype
        if self.solver.precond == "gmg":
            from pfhubbenchmarks_tpu.solve.gmg3d import make_gmg3d

            s = self.solver
            return make_gmg3d(self.grid, self.terms, self.n_fields,
                              dirichlet_for=self.dirichlet_for,
                              dtype=kry_dtype,
                              needs_coords=self.needs_coords,
                              nu_pre=s.gmg_nu_pre,
                              nu_post=s.gmg_nu_post,
                              nu_fine_pre=s.gmg_nu_fine_pre,
                              nu_fine_post=s.gmg_nu_fine_post,
                              coarse_sweeps=s.gmg_coarse_sweeps,
                              max_levels=s.gmg_max_levels,
                              precond_rule=s.precond_rule,
                              cycle=s.gmg_cycle, inner_mr=s.gmg_inner_mr,
                              kcycle=s.gmg_kcycle,
                              use_pallas=self._pallas_backend_ok(),
                              tiled_nb1=s.tiled_nb1_3d)
        return make_block_jacobi3d(self.grid, self.terms, self.n_fields,
                                   dirichlet=self.dirichlet, dtype=kry_dtype,
                                   needs_coords=self.needs_coords)

    def observable_fns(self):
        out = {name: make_functional3d(self.grid, density,
                                       needs_coords=self.needs_coords,
                                       dtype=self.dtype)
               for name, density in self.observables.items()}
        out.update(self.custom_observables)
        return out


def make(nx: int = 50, ny: int = 50, nz: int = 50, Lx: float = 100.0,
         Ly: float = 100.0, Lz: float = 100.0,
         params: Bench1Params = Bench1Params(), pad_to: tuple = (1, 1, 1),
         **overrides) -> Benchmark3DProblem:
    p = params

    def dfdc(c):
        return 2.0 * p.rho_s * (c - p.c_alpha) * (p.c_beta - c) * (
            (p.c_beta - c) - (c - p.c_alpha))

    def f_chem(c):
        return p.rho_s * (c - p.c_alpha) ** 2 * (p.c_beta - c) ** 2

    def terms(ctx):
        c, mu = ctx.u
        (sc, fc), (smu, fmu) = forms.cahn_hilliard(
            c, mu, ctx.du[1], ctx.du[0], ctx.u0[0], ctx.dt, p.M, p.kappa, dfdc(c))
        return [sc, smu], [fc, fmu]

    def tfe_density(ctx):
        c = ctx.u[0]
        dc = ctx.du[0]
        return f_chem(c) + p.kappa / 2.0 * (dc[0] ** 2 + dc[1] ** 2 + dc[2] ** 2)

    def ic_c(x, y, z):
        return p.c0 + p.epsilon * (
            np.cos(0.105 * x) * np.cos(0.11 * y)
            + (np.cos(0.13 * x) * np.cos(0.087 * y)) ** 2
            + np.cos(0.025 * x - 0.15 * y) * np.cos(0.07 * x - 0.02 * y))

    return Benchmark3DProblem(
        name="bench1_3d",
        grid=TetGrid(nx, ny, nz, Lx, Ly, Lz, pad_to=pad_to),
        field_names=("c", "mu"),
        terms=terms,
        ic_fns=[ic_c, lambda x, y, z: 0.0 * x],
        observables={
            "total_free_energy": tfe_density,
            "total_solute": lambda ctx: ctx.u[0],
        },
        csv_columns=("time", "total_free_energy", "total_solute"),
        time=TimeConfig(dt0=1e-1, dt_min=1e-2, end_time=50.0, grow_threshold=5),
        # precond_rule keast2: the preconditioner hierarchy rediscretizes at
        # 4 pts/tet instead of ffc3's 8 — the V-cycle J.v einsums are the 3D
        # per-iteration bottleneck (r3 attribution: 21.7 ms/apply at nq=8).
        # fast_residual: the f64 Newton residual at 50³ is EMULATION-bound
        # (measured 242 ms vs 3.2 ms f32); the two-stage path evaluates f32
        # while ||F|| is far above the measured cancellation floor. 3D has
        # no reference golden trajectory (dolfin/b13d.py writes none), so
        # the 2D count-parity objection doesn't apply.
        # gmg_kcycle=3: every coarse-level visit is a 3-step MR (GCR)
        # combination of recursive cycles — the fix for the weak ratio-5
        # 25³ -> 5³ coarse jump (CPU diag b13d_diag: dt=1.6 costs 169
        # krylov/Newton on a plain V-cycle). Measured on the v5e
        # (chain_r26/r28): 283.4 s (kcycle=1, committed r4 baseline)
        # -> 142.1 s (kcycle=2, krylov_all 12065) -> 129.6 s (kcycle=3,
        # krylov_all 8836). The controller walks 24 steps instead of 31
        # (the stronger solve converges at larger dt); the first 10 rows
        # match the committed trajectory at TFE 5e-11, the rest is the
        # controller legitimately taking bigger steps (3D has no reference
        # golden; dolfin/b13d.py:24-26 writes none).
        # tiled_nb1_3d: the 25³ level's sweeps otherwise fall through to
        # the XLA einsum path (choose_block_zrows returns bc == nz there),
        # and gmg_kcycle=3 multiplies exactly that level's work. The nb=1
        # z-slab Pallas sweep/J.v kernels cut the full run 123.7 ->
        # **79.7 s** with the bit-identical 24-step trajectory (prefix
        # 24/24, TFE 3.7e-11 — chain_r41 cfg_probe). Mid-level smoothing
        # strength was the measured-rejected alternative: nu=4/4 at L1
        # (fine kept 2/2) costs 150.5 s — krylov_all only -7% for +50%
        # L1 work per visit (chain_r41; CPU counts lab agrees: dt=0.4
        # krylov 76 -> 76).
        solver=SolverConfig(line_search="basic", precond="gmg",
                            precond_rule="keast2", fast_residual=True,
                            gmg_kcycle=3, tiled_nb1_3d=True),
        # one whole-run dispatch at 50³ crashes the remote TPU worker
        # during execution (with AND without Pallas — chain_r19 bisect);
        # a ~48 s dispatch completes, so fused runs go in short segments
        # (timeloop.run_fused_segmented; host pays one ~2 MB state
        # round-trip per segment instead of one dispatch per attempt).
        # Segment size vs the worker's dispatch limit: at kcycle=1 a
        # 4-step segment with dt-retries crashed twice (chain_r20), so r4
        # shipped seg=1 (285.9 / 292.5 s at seg=1/2, chain_r21). The
        # kcycle=3 default walks 24 steps with only 4 retries and much
        # cheaper per-step dispatches: seg=8 completed twice at 123.4 /
        # 123.7 s with identical counts (chain_r32/r36) vs 131.6 s at
        # seg=1 (chain_r31) — per-segment host round-trips were ~6% of
        # wall. seg=16 crashes the worker (chain_r32): stay at 8.
        fused_seg_rows=8,
        **overrides,
    )


if __name__ == "__main__":
    from pfhubbenchmarks_tpu.benchmarks.registry import main

    main("bench1_3d")
