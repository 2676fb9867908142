"""True 3D Benchmark 6: electrochemistry (CH + Poisson) on a box.

The reference's b63d.py advertises a 3D electrochemistry benchmark but is
a 2D near-copy of bench6 (dolfin/b63d.py:23 builds a RectangleMesh); this
module realizes the 3D intent: the bench6 physics (dolfin/bench6.py:33-90)
on a Kuhn-tet box with the 2D IC applied z-invariantly (the b13d
convention, dolfin/b13d.py) and the phi Dirichlet data extended
z-invariantly — phi=0 on the x=0 face, phi=sin(y/7) on the x=Lx face.

No reference golden data exists (the aspiration was never realized);
validation is conservation + BC satisfaction + energy decrease, and the
z-invariance limit: with a z-invariant IC the exact solution is
z-invariant, so thin-z runs must match bench6's 2D trajectory.
"""

from __future__ import annotations

import numpy as np

from pfhubbenchmarks_tpu.benchmarks.bench1_3d import Benchmark3DProblem
from pfhubbenchmarks_tpu.benchmarks.bench6 import Bench6Params, ic_c
from pfhubbenchmarks_tpu.config import SolverConfig, TimeConfig
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
from pfhubbenchmarks_tpu.models import forms


def make(nx: int = 50, ny: int = 50, nz: int = 50, Lx: float = 100.0,
         Ly: float = 100.0, Lz: float = 100.0,
         params: Bench6Params = Bench6Params(), pad_to: tuple = (1, 1, 1),
         **overrides) -> Benchmark3DProblem:
    p = params

    def f_chem(c):
        return p.rho * (c - p.c_alpha) ** 2 * (p.c_beta - c) ** 2

    def dfdc_chem(c):
        return 2.0 * p.rho * (c - p.c_alpha) * (p.c_beta - c) * (
            (p.c_beta - c) - (c - p.c_alpha))

    def terms(ctx):
        c, mu, phi = ctx.u
        (sc, fc), (smu, fmu) = forms.cahn_hilliard(
            c, mu, ctx.du[1], ctx.du[0], ctx.u0[0], ctx.dt, p.M, p.kappa,
            dfdc_chem(c) + p.k * phi)
        sp, fp = forms.poisson(ctx.du[2], -p.k * c / p.epsilon, 1.0)
        return [sc, smu, sp], [fc, fmu, fp]

    def tfe_density(ctx):
        c, _, phi = ctx.u
        dc = ctx.du[0]
        return (f_chem(c) + p.k * c * phi / 2.0
                + p.kappa / 2.0 * (dc[0] ** 2 + dc[1] ** 2 + dc[2] ** 2))

    ic2d = ic_c(p)
    # x faces: fn(c1, c2) receives (y, z) — z-invariant extension of the 2D
    # BC data (dolfin/bench6.py:77-90)
    dirichlet_spec = (
        (2, "x0", lambda y, z: 0.0 * y),
        (2, "x1", lambda y, z: np.sin(y / 7.0)),
    )

    return Benchmark3DProblem(
        name="bench6_3d",
        grid=TetGrid(nx, ny, nz, Lx, Ly, Lz, pad_to=pad_to),
        field_names=("c", "mu", "phi"),
        terms=terms,
        ic_fns=[lambda x, y, z: ic2d(x, y),
                lambda x, y, z: 0.0 * x, lambda x, y, z: 0.0 * x],
        observables={
            "total_free_energy": tfe_density,
            "total_solute": lambda ctx: ctx.u[0],
        },
        csv_columns=("time", "total_free_energy", "total_solute"),
        time=TimeConfig(dt0=1e-2, dt_min=1e-4, end_time=3.0, grow_threshold=5),
        solver=SolverConfig(line_search="cp", krylov_max_iters=300,
                            precond="gmg"),
        dirichlet_spec=dirichlet_spec,
        **overrides,
    )


if __name__ == "__main__":
    from pfhubbenchmarks_tpu.benchmarks.registry import main

    main("bench6_3d")
