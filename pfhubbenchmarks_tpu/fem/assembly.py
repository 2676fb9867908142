"""Matrix-free structured P1 assembly as dense XLA ops.

Replaces the FFC-generated per-cell C kernels + DOLFIN assembly loops + ghost
accumulation of the reference (SURVEY.md section 2.3; call stack
dolfin/bench1.py:145-198). The weak-form residual

    r_k = sum_cells sum_tris sum_q  w * ( s(u) * lambda_k + f(u, grad u) . grad lambda_k )

is evaluated as a handful of small einsums over per-cell slot arrays gathered
by slicing, followed by shifted adds (the 'scatter'). Everything is static
shape and fuses into a few passes over the ``[F, Y, X]`` grids; under
``jax.sharding`` the shifted adds become XLA-inserted halo exchanges — the
TPU-native counterpart of PETSc ghost updates.

State pytree: ``w = (v, m)`` with v ``[F, ny+1, nx+1]`` (vertices) and
m ``[F, ny, nx]`` (cell centers).

Model interface (the UFL replacement): a *system* provides pointwise physics

    terms(ctx) -> (source, flux)

where ``ctx.u[i]`` is field i at quadrature points ``[4, nq, ny, nx]``,
``ctx.du[i] = (dudx, dudy)`` its per-triangle constant gradient
``[4, 1, ny, nx]``, similarly ``ctx.u0/du0`` for the previous time level, and
``source[i]`` / ``flux[i] = (fx, fy)`` are broadcastable to
``[4, nq, ny, nx]``. Jacobians come free via ``jax.jvp`` of the assembled
residual — the counterpart of UFL's ``derivative`` (dolfin/bench1.py:68).
"""

from __future__ import annotations

import dataclasses

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid


# ---------------------------------------------------------------------------
# gather / scatter between grids and per-cell slot arrays
# ---------------------------------------------------------------------------

def local_values(w, ny: int, nx: int, periodic: bool = False):
    """Gather cell-local slot values: (v, m) -> [5, F, ny, nx].

    Slices the logical region out of (possibly padded) storage; under SPMD
    sharding the shifted slices become XLA-inserted halo reads. Periodic
    grids gather with wraparound rolls.
    """
    v, m = w
    if periodic:
        return jnp.stack(
            [
                v,
                jnp.roll(v, -1, axis=2),
                jnp.roll(v, -1, axis=(1, 2)),
                jnp.roll(v, -1, axis=1),
                m,
            ],
            axis=0,
        )
    return jnp.stack(
        [
            v[:, :ny, :nx],
            v[:, :ny, 1 : nx + 1],
            v[:, 1 : ny + 1, 1 : nx + 1],
            v[:, 1 : ny + 1, :nx],
            m[:, :ny, :nx],
        ],
        axis=0,
    )


def scatter_add(r_loc, vshape, mshape, ny: int, nx: int, periodic: bool = False):
    """Scatter per-cell slot contributions back: [5, F, ny, nx] -> (rv, rm).

    Implemented as pad-and-add so XLA's SPMD partitioner turns shard-edge
    contributions into halo exchanges (the ghostUpdate(ADD, REVERSE)
    equivalent, cf. dolfinx/pfbase/pde_problems.py:161). Output arrays are
    padded to the stored shapes; padding stays exactly zero. Periodic grids
    scatter with wraparound rolls (the transpose of the periodic gather).
    """
    if periodic:
        rv = (r_loc[0]
              + jnp.roll(r_loc[1], 1, axis=2)
              + jnp.roll(r_loc[2], 1, axis=(1, 2))
              + jnp.roll(r_loc[3], 1, axis=1))
        return rv, r_loc[4]
    pad = jnp.pad
    ey, ex = vshape[0] - (ny + 1), vshape[1] - (nx + 1)
    rv = (
        pad(r_loc[0], ((0, 0), (0, 1 + ey), (0, 1 + ex)))
        + pad(r_loc[1], ((0, 0), (0, 1 + ey), (1, ex)))
        + pad(r_loc[2], ((0, 0), (1, ey), (1, ex)))
        + pad(r_loc[3], ((0, 0), (1, ey), (0, 1 + ex)))
    )
    rm = jnp.pad(r_loc[4], ((0, 0), (0, mshape[0] - ny), (0, mshape[1] - nx)))
    return rv, rm


# ---------------------------------------------------------------------------
# pointwise evaluation context handed to model physics
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class QPContext:
    """Field data at quadrature points, per field as tuples (UFL-like access)."""

    u: tuple          # field i -> [4, nq, ny, nx]
    du: tuple         # field i -> (ddx, ddy), each [4, 1, ny, nx]
    u0: tuple | None
    du0: tuple | None
    dt: jnp.ndarray | float | None
    x: jnp.ndarray | None = None   # [4, nq, ny, nx] global coords (optional)
    y: jnp.ndarray | None = None
    z: jnp.ndarray | None = None   # 3D only ([6, nq, nz, ny, nx])


def _eval_qp(tab_Bq, tab_Gs, loc):
    """loc [5, F, ny, nx] -> (u_q [F, 4, nq, ny, nx], du [F, 2, 4, 1, ny, nx])."""
    uq = jnp.einsum("tqs,sfyx->ftqyx", tab_Bq, loc)
    du = jnp.einsum("tsd,sfyx->fdtyx", tab_Gs, loc)[:, :, :, None]
    return uq, du


def _as_tuples(uq, du):
    n_fields = uq.shape[0]
    u_t = tuple(uq[i] for i in range(n_fields))
    du_t = tuple((du[i, 0], du[i, 1]) for i in range(n_fields))
    return u_t, du_t


# ---------------------------------------------------------------------------
# residual / functional builders
# ---------------------------------------------------------------------------

def make_residual(
    grid: CrossedTriGrid,
    terms: Callable[[QPContext], tuple[Sequence, Sequence]],
    n_fields: int,
    dirichlet=(),
    needs_coords: bool = False,
    dtype=jnp.float64,
):
    """Build ``residual(w, w0, dt) -> (rv, rm)`` for a system's weak form.

    ``dirichlet`` is a sequence of ``DirichletBC``; their rows are replaced by
    ``u - g`` exactly as DOLFIN's ``set_bc`` does (dolfinx/pde_problems.py:88).
    """
    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    # precombined weights: WB[t,q,s] = w * basis, WG[d][t,q,s] = w * grad basis
    WB = jnp.asarray(tab.wq[:, :, None] * tab.Bq, dtype)
    WGx = jnp.asarray(tab.wq[:, :, None] * tab.Gs[:, None, :, 0], dtype)
    WGy = jnp.asarray(tab.wq[:, :, None] * tab.Gs[:, None, :, 1], dtype)
    if needs_coords:
        gx, gy = grid.qpoint_coords()
        gx = jnp.asarray(gx, dtype)
        gy = jnp.asarray(gy, dtype)

    full_shape = (4, tab.nq, grid.ny, grid.nx)
    ny, nx = grid.ny, grid.nx
    vshape, mshape = grid.vshape, grid.mshape
    periodic = grid.periodic
    if periodic:
        assert grid.pad_to == (1, 1), "periodic grids do not support padding"
        assert not dirichlet, "periodic topology excludes Dirichlet sides"

    def residual(w, w0, dt):
        loc = local_values(w, ny, nx, periodic)
        uq, du = _eval_qp(Bq, Gs, loc)
        u_t, du_t = _as_tuples(uq, du)
        loc0 = local_values(w0, ny, nx, periodic)
        u0q, du0 = _eval_qp(Bq, Gs, loc0)
        u0_t, du0_t = _as_tuples(u0q, du0)
        ctx = QPContext(
            u=u_t, du=du_t, u0=u0_t, du0=du0_t, dt=dt,
            x=gx if needs_coords else None, y=gy if needs_coords else None,
        )
        source, flux = terms(ctx)
        src = jnp.stack([jnp.broadcast_to(s, full_shape) for s in source], axis=0)
        fx = jnp.stack([jnp.broadcast_to(f[0], full_shape) for f in flux], axis=0)
        fy = jnp.stack([jnp.broadcast_to(f[1], full_shape) for f in flux], axis=0)
        r_loc = (
            jnp.einsum("tqs,ftqyx->sfyx", WB, src)
            + jnp.einsum("tqs,ftqyx->sfyx", WGx, fx)
            + jnp.einsum("tqs,ftqyx->sfyx", WGy, fy)
        )
        rv, rm = scatter_add(r_loc, vshape, mshape, ny, nx, periodic)
        for bc in dirichlet:
            rv = bc.apply_residual(rv, w[0])
        return rv, rm

    return residual


def make_functional(
    grid: CrossedTriGrid,
    density: Callable[[QPContext], jnp.ndarray],
    needs_coords: bool = False,
    dtype=jnp.float64,
):
    """Build ``value(w) -> scalar`` for an integral functional (observables).

    Replaces ``df.assemble(expr * dx)`` (dolfin/bench1.py:121-125); the global
    sum becomes a ``psum``-style all-reduce under SPMD sharding.
    """
    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    wq = jnp.asarray(tab.wq, dtype)
    if needs_coords:
        gx, gy = grid.qpoint_coords()
        gx = jnp.asarray(gx, dtype)
        gy = jnp.asarray(gy, dtype)

    full_shape = (4, tab.nq, grid.ny, grid.nx)
    ny, nx = grid.ny, grid.nx

    def value(w):
        loc = local_values(w, ny, nx, grid.periodic)
        uq, du = _eval_qp(Bq, Gs, loc)
        u_t, du_t = _as_tuples(uq, du)
        ctx = QPContext(
            u=u_t, du=du_t, u0=None, du0=None, dt=None,
            x=gx if needs_coords else None, y=gy if needs_coords else None,
        )
        e = jnp.broadcast_to(density(ctx), full_shape)
        return jnp.einsum("tq,tqyx->", wq, e)

    return value


# ---------------------------------------------------------------------------
# Dirichlet boundary conditions (bench6 phi, elasticity clamp)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DirichletBC:
    """Strong BC on a vertex-grid boundary line of one field.

    side: 'left' (x=0), 'right' (x=Lx), 'bottom' (y=0), 'top' (y=Ly).
    value: callable g(coord) -> nodal values along the edge (host numpy),
    evaluated once at construction against the grid.
    Residual rows become ``u - g`` (FEniCS DirichletBC semantics,
    dolfin/bench6.py:77-90).
    """

    field: int
    side: str
    g: np.ndarray   # boundary values, padded to the stored edge length
    index: int      # logical row/col index of the boundary line

    @staticmethod
    def make(grid: CrossedTriGrid, field: int, side: str, fn) -> "DirichletBC":
        if side in ("left", "right"):
            coord = np.arange(grid.ny + 1) * grid.hy
            stored = grid.vshape[0]
            index = 0 if side == "left" else grid.nx
        else:
            coord = np.arange(grid.nx + 1) * grid.hx
            stored = grid.vshape[1]
            index = 0 if side == "bottom" else grid.ny
        g = np.zeros(stored)
        g[: coord.size] = np.broadcast_to(np.asarray(fn(coord), dtype=np.float64),
                                          coord.shape)
        return DirichletBC(field=field, side=side, g=g, index=index)

    def apply_residual(self, rv, v):
        """Replace the BC rows with ``u - g`` (padding rows stay 0 - 0 = 0)."""
        gj = jnp.asarray(self.g, rv.dtype)
        f, i = self.field, self.index
        if self.side in ("left", "right"):
            return rv.at[f, :, i].set(v[f, :, i] - gj)
        return rv.at[f, i, :].set(v[f, i, :] - gj)

    def apply_value(self, v):
        """Set the BC values into a state array (used for initial guesses)."""
        gj = jnp.asarray(self.g, v.dtype)
        f, i = self.field, self.index
        if self.side in ("left", "right"):
            return v.at[f, :, i].set(gj)
        return v.at[f, i, :].set(gj)
