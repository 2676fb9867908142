"""Matrix-free structured P1 assembly in 3D (tets) — see fem/assembly.py.

Same design as 2D: gather 8 corner slices, evaluate physics at tet
quadrature points, scatter with shifted pads. The model ``terms`` interface
is identical (``ctx.du[i]`` is now a 3-tuple), so every weak-form builder in
models/forms.py works unchanged.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from pfhubbenchmarks_tpu.fem.assembly import QPContext
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid, _SLOT_XYZ


def local_values3d(w, nz: int, ny: int, nx: int):
    (v,) = w
    slots = [
        v[:, dz : nz + dz, dy : ny + dy, dx : nx + dx]
        for (dx, dy, dz) in _SLOT_XYZ
    ]
    return jnp.stack(slots, axis=0)  # [8, F, nz, ny, nx]


def scatter_add3d(r_loc, vshape, nz: int, ny: int, nx: int):
    """[8, F, nz, ny, nx] -> (rv,) padded to vshape."""
    Z, Y, X = vshape
    out = 0.0
    for s, (dx, dy, dz) in enumerate(_SLOT_XYZ):
        out = out + jnp.pad(
            r_loc[s],
            ((0, 0),
             (dz, Z - nz - dz), (dy, Y - ny - dy), (dx, X - nx - dx)),
        )
    return (out,)


def make_residual3d(grid: TetGrid, terms: Callable, n_fields: int,
                    dtype=jnp.float64):
    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    WB = jnp.asarray(tab.wq[:, :, None] * tab.Bq, dtype)
    WG = [jnp.asarray(tab.wq[:, :, None] * tab.Gs[:, None, :, d], dtype)
          for d in range(3)]
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    full_shape = (6, tab.nq, nz, ny, nx)

    def eval_qp(loc):
        uq = jnp.einsum("tqs,sfzyx->ftqzyx", Bq, loc)
        du = jnp.einsum("tsd,sfzyx->fdtzyx", Gs, loc)[:, :, :, None]
        u_t = tuple(uq[i] for i in range(n_fields))
        du_t = tuple((du[i, 0], du[i, 1], du[i, 2]) for i in range(n_fields))
        return u_t, du_t

    def residual(w, w0, dt):
        u_t, du_t = eval_qp(local_values3d(w, nz, ny, nx))
        u0_t, du0_t = eval_qp(local_values3d(w0, nz, ny, nx))
        ctx = QPContext(u=u_t, du=du_t, u0=u0_t, du0=du0_t, dt=dt)
        source, flux = terms(ctx)
        src = jnp.stack([jnp.broadcast_to(s, full_shape) for s in source], axis=0)
        r_loc = jnp.einsum("tqs,ftqzyx->sfzyx", WB, src)
        for d in range(3):
            fd = jnp.stack([jnp.broadcast_to(f[d], full_shape) for f in flux], axis=0)
            r_loc = r_loc + jnp.einsum("tqs,ftqzyx->sfzyx", WG[d], fd)
        return scatter_add3d(r_loc, grid.vshape, nz, ny, nx)

    return residual


def make_functional3d(grid: TetGrid, density: Callable, dtype=jnp.float64):
    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    wq = jnp.asarray(tab.wq, dtype)
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    full_shape = (6, tab.nq, nz, ny, nx)

    def eval_qp(loc):
        uq = jnp.einsum("tqs,sfzyx->ftqzyx", Bq, loc)
        du = jnp.einsum("tsd,sfzyx->fdtzyx", Gs, loc)[:, :, :, None]
        n = uq.shape[0]
        return (tuple(uq[i] for i in range(n)),
                tuple((du[i, 0], du[i, 1], du[i, 2]) for i in range(n)))

    def value(w):
        u_t, du_t = eval_qp(local_values3d(w, nz, ny, nx))
        ctx = QPContext(u=u_t, du=du_t, u0=None, du0=None, dt=None)
        e = jnp.broadcast_to(density(ctx), full_shape)
        return jnp.einsum("tq,tqzyx->", wq, e)

    return value
