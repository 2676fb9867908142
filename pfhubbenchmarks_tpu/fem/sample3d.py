"""Point evaluation of P1 fields on the 3D Kuhn-tet grid.

The Kuhn/Freudenthal 6-tet split corresponds exactly to the 6 orderings of
the cell-local coordinates, so the P1 interpolant has a closed form: with
local coordinates sorted descending a >= b >= c (axes i, j, k), the value is

    (1 - a) u_000 + (a - b) u_i + (b - c) u_ij + c u_111

where u_i is the corner with 1 on the largest axis and u_ij the corner with
1 on the two largest axes. Fully vectorized, no cell search (structured
grid), matching the 2D machinery in fem/sample.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.grid3d import TetGrid


def eval_at_points3d(grid: TetGrid, w, xs, ys, zs):
    """Evaluate all fields at points: returns [F, n_points]."""
    (v,) = w
    xs, ys, zs = (jnp.asarray(a) for a in (xs, ys, zs))
    gx, gy, gz = xs / grid.hx, ys / grid.hy, zs / grid.hz
    ci = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, grid.nx - 1)
    cj = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, grid.ny - 1)
    ck = jnp.clip(jnp.floor(gz).astype(jnp.int32), 0, grid.nz - 1)
    lx, ly, lz = gx - ci, gy - cj, gz - ck

    def corner(dx, dy, dz):
        return v[:, ck + dz, cj + dy, ci + dx]

    u000 = corner(0, 0, 0)
    u100 = corner(1, 0, 0)
    u010 = corner(0, 1, 0)
    u001 = corner(0, 0, 1)
    u110 = corner(1, 1, 0)
    u101 = corner(1, 0, 1)
    u011 = corner(0, 1, 1)
    u111 = corner(1, 1, 1)

    a = jnp.maximum(jnp.maximum(lx, ly), lz)
    c = jnp.minimum(jnp.minimum(lx, ly), lz)
    b = lx + ly + lz - a - c

    # corner on the largest axis / the two largest axes (smallest axis zero)
    ui = jnp.where((lx >= ly) & (lx >= lz), u100,
                   jnp.where(ly >= lz, u010, u001))
    uij = jnp.where((lz <= lx) & (lz <= ly), u110,
                    jnp.where(ly <= lx, u101, u011))
    return (1.0 - a) * u000 + (a - b) * ui + (b - c) * uij + c * u111


def sample_grid3d(grid: TetGrid, w, nx_s: int, ny_s: int, nz_s: int):
    """Uniform resampling: (xs, ys, zs, values [F, nz_s, ny_s, nx_s])."""
    xs = np.linspace(0.0, grid.Lx, nx_s)
    ys = np.linspace(0.0, grid.Ly, ny_s)
    zs = np.linspace(0.0, grid.Lz, nz_s)
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    vals = eval_at_points3d(grid, w, X.ravel(), Y.ravel(), Z.ravel())
    return xs, ys, zs, np.asarray(vals).reshape(-1, nz_s, ny_s, nx_s)
