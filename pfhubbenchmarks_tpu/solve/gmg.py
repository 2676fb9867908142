"""Geometric multigrid V-cycle preconditioner on the crossed-grid hierarchy.

Replaces the reference's SOR (and its petsc_amg/hypre_amg options,
dolfin/bench1.py:99-108) with the TPU-shaped equivalent: damped pointwise
block-Jacobi smoothing + exact P1 grid transfers (solve/transfer.py) + coarse
rediscretization of the Jacobian at the injected state. Everything is
slices/elementwise/einsums — one V-cycle costs a few fine-grid J.v products
and SPMD-partitions like the rest of the framework.

The V-cycle is a *linear, stationary* operation (damped Jacobi smoothing of
the linearized operator), so it is a valid left preconditioner for standard
GMRES. Each Newton iteration rebuilds the level linearizations at the
current iterate.
"""

from __future__ import annotations

import dataclasses

import jax

from pfhubbenchmarks_tpu.fem.assembly import make_residual
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi
from pfhubbenchmarks_tpu.solve.transfer import inject_state, prolong, restrict


def coarsen_grid(g: CrossedTriGrid) -> CrossedTriGrid:
    return dataclasses.replace(g, nx=g.nx // 2, ny=g.ny // 2)


def build_hierarchy(grid: CrossedTriGrid, max_levels: int = 10,
                    min_cells: int = 8) -> list[CrossedTriGrid]:
    grids = [grid]
    while (len(grids) < max_levels
           and grids[-1].nx % 2 == 0 and grids[-1].ny % 2 == 0
           and grids[-1].nx // 2 >= min_cells and grids[-1].ny // 2 >= min_cells):
        grids.append(coarsen_grid(grids[-1]))
    return grids


def make_gmg(grid: CrossedTriGrid, terms, n_fields: int, dirichlet_for=None,
             dtype=None, needs_coords: bool = False, *, nu_pre: int = 2,
             nu_post: int = 2, omega: float = 0.8, coarse_sweeps: int = 24,
             max_levels: int = 10, coarse_rtol: float = 1e-2):
    """Returns ``build(w, w0, dt) -> Minv`` applying one V-cycle.

    The coarsest level is solved with an inner block-Jacobi-preconditioned
    GMRES (``coarse_sweeps`` = its max iterations). Damped Jacobi smoothing
    alone DIVERGES on the mixed Cahn-Hilliard block system at dt >~ 1 (the
    Jacobian is nonsymmetric/saddle-like), so sweeps cannot be the coarse
    solve; the inner Krylov makes the whole V-cycle a *nonlinear* operation,
    hence the outer solver must be flexible (FGMRES — solve/krylov.py).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float64
    dirichlet_for = dirichlet_for or (lambda g: ())
    grids = build_hierarchy(grid, max_levels=max_levels)
    residuals = []
    bj_builders = []
    for g in grids:
        bcs = dirichlet_for(g)
        residuals.append(make_residual(g, terms, n_fields, dirichlet=bcs,
                                       needs_coords=needs_coords, dtype=dtype))
        bj_builders.append(make_block_jacobi(g, terms, n_fields, dirichlet=bcs,
                                             dtype=dtype, needs_coords=needs_coords))
    Ps = [prolong(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    Rs = [restrict(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    injs = [inject_state(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]

    def build(w, w0, dt):
        ops = []
        wl, w0l = w, w0
        for l in range(len(grids)):
            res_l = residuals[l]
            _, jvp = jax.linearize(lambda u: res_l(u, w0l, dt), wl)
            bj = bj_builders[l](wl, w0l, dt)
            ops.append((jvp, bj))
            if l + 1 < len(grids):
                wl = injs[l](wl)
                w0l = injs[l](w0l)

        from pfhubbenchmarks_tpu.solve.krylov import gmres as _gmres

        def smooth(l, x, r, sweeps):
            """Local minimal-residual smoothing: z = BJ(r), step length
            minimizing ||r - a A z||.

            Damped Jacobi sweeps DIVERGE on the nonsymmetric CH block system
            at dt >~ 1; the residual-minimizing step is non-increasing in
            ||r|| by construction, making the V-cycle robust at a cost of one
            J.v + one block solve per sweep. (Nonlinear in b, hence the
            outer Krylov must be FGMRES.) Maintains r incrementally.
            """
            jvp, bj = ops[l]
            for _ in range(sweeps):
                z = bj(r)
                Az = jvp(z)
                denom = tr.vdot(Az, Az)
                alpha = tr.vdot(Az, r) * tr.safe_inv(denom)
                x = tr.axpy(alpha, z, x)
                r = tr.axpy(-alpha, Az, r)
            return x, r

        def vcycle(l, b):
            jvp, bj = ops[l]
            if l == len(grids) - 1:
                sol = _gmres(jvp, b, Minv=bj,
                             restart=min(coarse_sweeps, 30),
                             rtol=coarse_rtol, maxiter=coarse_sweeps)
                return sol.x
            x, r = smooth(l, tr.zeros_like(b), b, nu_pre)
            x = tr.add(x, Ps[l](vcycle(l + 1, Rs[l](r))))
            r = tr.sub(b, jvp(x))
            x, _ = smooth(l, x, r, nu_post)
            return x

        return lambda r: vcycle(0, r)

    return build
