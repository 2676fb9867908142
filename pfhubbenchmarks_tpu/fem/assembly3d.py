"""Matrix-free structured P1 assembly in 3D (tets) — see fem/assembly.py.

Same design as 2D: gather 8 corner slices, evaluate physics at tet
quadrature points, scatter with shifted pads. The model ``terms`` interface
is identical (``ctx.du[i]`` is now a 3-tuple), so every weak-form builder in
models/forms.py works unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.assembly import QPContext
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid, _SLOT_XYZ


@dataclasses.dataclass(frozen=True)
class DirichletBC3D:
    """Strong BC on one boundary FACE of the vertex grid, one field.

    3D analog of assembly.DirichletBC (the reference's face-located
    dirichletbc, dolfinx/poisson3d.py:59-86). ``face`` is one of
    'x0'/'x1'/'y0'/'y1'/'z0'/'z1' (the plane where that coordinate is 0/L).
    ``g`` holds nodal boundary values over the stored face shape
    (padding entries 0). Residual rows become ``u - g``.
    """

    field: int
    face: str      # 'x0' | 'x1' | 'y0' | 'y1' | 'z0' | 'z1'
    g: np.ndarray  # x faces: [Z, Y]; y faces: [Z, X]; z faces: [Y, X]
    index: int     # grid-plane index along the face normal

    @staticmethod
    def make(grid: TetGrid, field: int, face: str, fn) -> "DirichletBC3D":
        """``fn(c1, c2)`` maps the two in-face coordinates to boundary data:
        x faces get (y, z), y faces (x, z), z faces (x, y)."""
        Z, Y, X = grid.vshape
        ax = face[0]
        if ax == "x":
            c1 = np.arange(grid.ny + 1) * grid.hy
            c2 = np.arange(grid.nz + 1) * grid.hz
            stored, n1, n2 = (Z, Y), grid.ny + 1, grid.nz + 1
            index = 0 if face == "x0" else grid.nx
        elif ax == "y":
            c1 = np.arange(grid.nx + 1) * grid.hx
            c2 = np.arange(grid.nz + 1) * grid.hz
            stored, n1, n2 = (Z, X), grid.nx + 1, grid.nz + 1
            index = 0 if face == "y0" else grid.ny
        else:
            c1 = np.arange(grid.nx + 1) * grid.hx
            c2 = np.arange(grid.ny + 1) * grid.hy
            stored, n1, n2 = (Y, X), grid.nx + 1, grid.ny + 1
            index = 0 if face == "z0" else grid.nz
        C1, C2 = np.meshgrid(c1, c2, indexing="xy")  # [n2, n1]
        g = np.zeros(stored)
        g[:n2, :n1] = np.broadcast_to(np.asarray(fn(C1, C2), np.float64),
                                      (n2, n1))
        return DirichletBC3D(field=field, face=face, g=g, index=index)

    def apply_residual(self, rv, v):
        gj = jnp.asarray(self.g, rv.dtype)
        f, i, ax = self.field, self.index, self.face[0]
        if ax == "x":
            return rv.at[f, :, :, i].set(v[f, :, :, i] - gj)
        if ax == "y":
            return rv.at[f, :, i, :].set(v[f, :, i, :] - gj)
        return rv.at[f, i, :, :].set(v[f, i, :, :] - gj)

    def apply_value(self, v):
        gj = jnp.asarray(self.g, v.dtype)
        f, i, ax = self.field, self.index, self.face[0]
        if ax == "x":
            return v.at[f, :, :, i].set(gj)
        if ax == "y":
            return v.at[f, :, i, :].set(gj)
        return v.at[f, i, :, :].set(gj)


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
                    dirichlet=(), needs_coords: bool = False,
                    dtype=jnp.float64):
    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    WB = jnp.asarray(tab.wq[:, :, None] * tab.Bq, dtype)
    WG = [jnp.asarray(tab.wq[:, :, None] * tab.Gs[:, None, :, d], dtype)
          for d in range(3)]
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    full_shape = (6, tab.nq, nz, ny, nx)
    if needs_coords:
        gx, gy, gz = (jnp.asarray(a, dtype) for a in grid.qpoint_coords())

    def eval_qp(loc):
        uq = jnp.einsum("tqs,sfzyx->ftqzyx", Bq, loc)
        du = jnp.einsum("tsd,sfzyx->fdtzyx", Gs, loc)[:, :, :, None]
        u_t = tuple(uq[i] for i in range(n_fields))
        du_t = tuple((du[i, 0], du[i, 1], du[i, 2]) for i in range(n_fields))
        return u_t, du_t

    def residual(w, w0, dt):
        u_t, du_t = eval_qp(local_values3d(w, nz, ny, nx))
        u0_t, du0_t = eval_qp(local_values3d(w0, nz, ny, nx))
        ctx = QPContext(u=u_t, du=du_t, u0=u0_t, du0=du0_t, dt=dt,
                        x=gx if needs_coords else None,
                        y=gy if needs_coords else None,
                        z=gz if needs_coords else None)
        source, flux = terms(ctx)
        src = jnp.stack([jnp.broadcast_to(s, full_shape) for s in source], axis=0)
        r_loc = jnp.einsum("tqs,ftqzyx->sfzyx", WB, src)
        for d in range(3):
            fd = jnp.stack([jnp.broadcast_to(f[d], full_shape) for f in flux], axis=0)
            r_loc = r_loc + jnp.einsum("tqs,ftqzyx->sfzyx", WG[d], fd)
        (rv,) = scatter_add3d(r_loc, grid.vshape, nz, ny, nx)
        for bc in dirichlet:
            rv = bc.apply_residual(rv, w[0])
        return (rv,)

    return residual


def make_functional3d(grid: TetGrid, density: Callable,
                      needs_coords: bool = False, dtype=jnp.float64):
    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    wq = jnp.asarray(tab.wq, dtype)
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    full_shape = (6, tab.nq, nz, ny, nx)
    if needs_coords:
        gx, gy, gz = (jnp.asarray(a, dtype) for a in grid.qpoint_coords())

    def eval_qp(loc):
        uq = jnp.einsum("tqs,sfzyx->ftqzyx", Bq, loc)
        du = jnp.einsum("tsd,sfzyx->fdtzyx", Gs, loc)[:, :, :, None]
        n = uq.shape[0]
        return (tuple(uq[i] for i in range(n)),
                tuple((du[i, 0], du[i, 1], du[i, 2]) for i in range(n)))

    def value(w):
        u_t, du_t = eval_qp(local_values3d(w, nz, ny, nx))
        ctx = QPContext(u=u_t, du=du_t, u0=None, du0=None, dt=None,
                        x=gx if needs_coords else None,
                        y=gy if needs_coords else None,
                        z=gz if needs_coords else None)
        e = jnp.broadcast_to(density(ctx), full_shape)
        return jnp.einsum("tq,tqzyx->", wq, e)

    return value
