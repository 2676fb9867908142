"""Geometric multigrid V-cycle for 3D Kuhn-tet grids (see solve/gmg.py).

Same design as the 2D cycle — LMR smoothing on the block-Jacobi
preconditioned operator, coarse rediscretization at the injected state, f32
throughout — over the single-vertex-grid 3D hierarchy.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax, tree_util as jtu

from pfhubbenchmarks_tpu.fem.assembly3d import make_residual3d
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi3d
from pfhubbenchmarks_tpu.solve.transfer3d import inject_state3d, prolong3d, restrict3d


def build_hierarchy3d(grid: TetGrid, max_levels: int = 10,
                      min_cells: int = 4) -> list[TetGrid]:
    grids = [grid]
    while (len(grids) < max_levels
           and all(n % 2 == 0 for n in (grids[-1].nx, grids[-1].ny, grids[-1].nz))
           and min(grids[-1].nx, grids[-1].ny, grids[-1].nz) // 2 >= min_cells):
        g = grids[-1]
        grids.append(dataclasses.replace(g, nx=g.nx // 2, ny=g.ny // 2,
                                         nz=g.nz // 2))
    return grids


def make_gmg3d(grid: TetGrid, terms, n_fields: int, dirichlet_for=None,
               dtype=None, needs_coords: bool = False, *,
               nu_pre: int = 2, nu_post: int = 2, coarse_sweeps: int = 24,
               max_levels: int = 10, precond_dtype=jnp.float32):
    """``dirichlet_for(grid) -> (DirichletBC3D, ...)`` rebuilds face BCs on
    every coarse level (coarse rediscretization keeps BC rows ``u - g``,
    mirroring the 2D cycle)."""
    dtype = dtype or jnp.float64
    dirichlet_for = dirichlet_for or (lambda g: ())
    grids = build_hierarchy3d(grid, max_levels=max_levels)
    level_bcs = [dirichlet_for(g) for g in grids]
    residuals = [make_residual3d(g, terms, n_fields, dirichlet=bcs,
                                 needs_coords=needs_coords,
                                 dtype=precond_dtype)
                 for g, bcs in zip(grids, level_bcs)]
    bj_builders = [make_block_jacobi3d(g, terms, n_fields, dirichlet=bcs,
                                       dtype=precond_dtype,
                                       needs_coords=needs_coords)
                   for g, bcs in zip(grids, level_bcs)]
    Ps = [prolong3d(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    Rs = [restrict3d(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    injs = [inject_state3d(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]

    def _cast(w, dt_):
        return jtu.tree_map(lambda a: a.astype(dt_), w)

    def build(w, w0, dt):
        ops = []
        wl = _cast(w, precond_dtype)
        w0l = _cast(w0, precond_dtype)
        dtl = jnp.asarray(dt, precond_dtype)
        for l in range(len(grids)):
            res_l = residuals[l]
            _, jvp = jax.linearize(lambda u: res_l(u, w0l, dtl), wl)
            bj = bj_builders[l](wl, w0l, dtl)
            ops.append((jvp, bj))
            if l + 1 < len(grids):
                wl = injs[l](wl)
                w0l = injs[l](w0l)

        def smooth(l, x, r, sweeps):
            jvp, bj = ops[l]

            def body(carry, _):
                x, r = carry
                z = bj(r)
                Az = jvp(z)
                alpha = tr.vdot(Az, r) * tr.safe_inv(tr.vdot(Az, Az))
                return (tr.axpy(alpha, z, x), tr.axpy(-alpha, Az, r)), None

            (x, r), _ = lax.scan(body, (x, r), None, length=sweeps)
            return x, r

        def vcycle(l, b):
            jvp, _ = ops[l]
            if l == len(grids) - 1:
                x, _ = smooth(l, tr.zeros_like(b), b, coarse_sweeps)
                return x
            x, r = smooth(l, tr.zeros_like(b), b, nu_pre)
            x = tr.add(x, Ps[l](vcycle(l + 1, Rs[l](r))))
            r = tr.sub(b, jvp(x))
            x, _ = smooth(l, x, r, nu_post)
            return x

        def Minv(r):
            return _cast(vcycle(0, _cast(r, precond_dtype)), dtype)

        return Minv

    return build
