"""Point evaluation / line sampling of P1 fields on the crossed grid.

Replaces the reference's MPI eval-anywhere machinery (``peval``
dolfin/pfbase.py:50-63 — each rank tries the eval, failures return +inf,
Allreduce(MIN) picks the owner — and ``sample`` :69-94, which loops peval
over a grid at seconds per 1e4 points). On a structured grid, point
evaluation is closed-form: locate the cell, pick the triangle by region
test, barycentric-interpolate. Fully vectorized; under SPMD the gather is
XLA's problem.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid


def eval_at_points(grid: CrossedTriGrid, w, xs, ys):
    """Evaluate all fields at points (xs, ys): returns [F, n_points].

    xs/ys are arrays of physical coordinates inside [0, Lx] x [0, Ly].
    """
    v, m = w
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    gx = xs / grid.hx
    gy = ys / grid.hy
    ci = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, grid.nx - 1)
    cj = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, grid.ny - 1)
    xi = gx - ci   # cell-local in [0, 1]
    eta = gy - cj

    u00 = v[:, cj, ci]
    u10 = v[:, cj, ci + 1]
    u11 = v[:, cj + 1, ci + 1]
    u01 = v[:, cj + 1, ci]
    uc = m[:, cj, ci]

    # Triangle regions in the unit cell (diagonals cross at the center):
    #   S: eta <= xi and eta <= 1-xi      N: eta >= xi and eta >= 1-xi
    #   E: xi >= 1/2 band between         W: xi <= 1/2 band between
    # Barycentric interpolation per triangle (closed form):
    south = u00 + (u10 - u00) * xi + (2.0 * uc - u00 - u10) * eta
    north = u01 + (u11 - u01) * xi + (u01 + u11 - 2.0 * uc) * (eta - 1.0)
    west = u00 + (u01 - u00) * eta + (2.0 * uc - u00 - u01) * xi
    east = u10 + (u11 - u10) * eta + (u10 + u11 - 2.0 * uc) * (xi - 1.0)

    in_s = (eta <= xi) & (eta <= 1.0 - xi)
    in_n = (eta >= xi) & (eta >= 1.0 - xi)
    in_w = (xi <= eta) & (xi <= 1.0 - eta)
    out = jnp.where(in_s, south, jnp.where(in_n, north, jnp.where(in_w, west, east)))
    return out


def sample_grid(grid: CrossedTriGrid, w, nx_s: int, ny_s: int):
    """Uniform [nx_s, ny_s] resampling of all fields (pfbase.sample parity).

    Returns (xs [nx_s], ys [ny_s], values [F, ny_s, nx_s]).
    """
    xs = np.linspace(0.0, grid.Lx, nx_s)
    ys = np.linspace(0.0, grid.Ly, ny_s)
    X, Y = np.meshgrid(xs, ys)
    vals = eval_at_points(grid, w, X.ravel(), Y.ravel())
    return xs, ys, np.asarray(vals).reshape(-1, ny_s, nx_s)
