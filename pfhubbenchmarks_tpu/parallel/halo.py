"""Explicit-halo SPMD residual via ``shard_map`` + ``lax.ppermute``.

The production path (parallel/mesh.py) lets XLA's SPMD partitioner derive
the halo exchanges from the shifted slices/pads in fem/assembly.py. This
module is the hand-scheduled counterpart — the direct TPU-native analog of
PETSc's ghostUpdate pair (SURVEY.md section 2.2:
``ghostUpdate(INSERT, FORWARD)`` before assembly,
``ghostUpdate(ADD, REVERSE)`` after): each shard

1. pulls a 1-deep halo (next shard's first vertex row/col + the diagonal
   corner) with ``lax.ppermute`` over the ('y', 'x') device mesh axes,
2. assembles its local cells with the same element tabulations as
   fem/assembly.make_residual,
3. pushes the seam contributions back to their owners with the reverse
   ``ppermute`` and adds.

Why it exists: the auto-partitioner is the production backend (zero
communication code, fuses freely), but its collective schedule is opaque —
this variant pins the communication pattern (exactly 6 ppermutes per
residual: 3 forward pulls x 2 states for gather, 3 reverse pushes for
scatter — the JVP adds the tangent's own pulls/pushes) so halo-exchange
cost can be measured and compared against the auto-partitioned program on
real multi-chip hardware. Equivalence against the single-device assembly is
CI-tested on the virtual 8-device mesh (tests/test_halo.py).

Layout requirement: vertex and cell blocks must align shard-for-shard, i.e.
``grid.vshape == grid.mshape`` with both divisible by the mesh shape — use
``aligned_pad_to`` to construct such a grid. Cell row j then lives on the
shard owning vertex row j, and the only remote data any cell needs is the
+1 vertex line (the halo). Periodic topology and coordinate-dependent terms
are not supported here (the production path handles both).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pfhubbenchmarks_tpu.fem.assembly import QPContext, _as_tuples, _eval_qp
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid


def aligned_pad_to(ny: int, nx: int, mesh_shape: tuple[int, int]):
    """pad_to making vshape == mshape and divisible by the device mesh.

    Rounding both grids' stored dims up to the same multiple of the mesh
    shape that fits the (larger) vertex grid aligns vertex row/col j with
    cell row/col j on the same shard.
    """
    my, mx = mesh_shape

    def up(n, m):
        return -(-n // m) * m

    return (up(ny + 1, my), up(nx + 1, mx))


def _pull_next(x, axis_name, n_shards):
    """Halo pull: every shard receives its +1 neighbor's first line.

    ``x`` is the local first row/col (length-1 along ``axis``); shards with
    no +1 neighbor receive zeros (matches the zero padding of the global
    storage past the logical region).
    """
    if n_shards == 1:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis_name,
                        [(i, i - 1) for i in range(1, n_shards)])


def _push_next(x, axis_name, n_shards):
    """Reverse add: send seam partial sums to the +1 neighbor (the owner)."""
    if n_shards == 1:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis_name,
                        [(i, i + 1) for i in range(n_shards - 1)])


def make_halo_residual(
    grid: CrossedTriGrid,
    terms: Callable[[QPContext], tuple[Sequence, Sequence]],
    n_fields: int,
    mesh: Mesh,
    dirichlet=(),
    dtype=jnp.float64,
):
    """Build ``residual(w, w0, dt) -> (rv, rm)`` with explicit halo exchange.

    Same signature and output as fem/assembly.make_residual; inputs/outputs
    are sharded ``P(None, 'y', 'x')`` over ``mesh``. Differentiable (the
    ppermutes transpose to the reverse exchanges under jvp/linearize).
    """
    assert not grid.periodic, "halo variant: periodic uses the XLA path"
    assert grid.vshape == grid.mshape, (
        "halo variant needs vertex/cell shard alignment: construct the grid "
        f"with pad_to=aligned_pad_to(...) (got vshape={grid.vshape} "
        f"mshape={grid.mshape})")
    my, mx = mesh.devices.shape
    Y, X = grid.vshape
    assert Y % my == 0 and X % mx == 0, (grid.vshape, mesh.devices.shape)
    ly, lx = Y // my, X // mx
    ny, nx = grid.ny, grid.nx

    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    WB = jnp.asarray(tab.wq[:, :, None] * tab.Bq, dtype)
    WGx = jnp.asarray(tab.wq[:, :, None] * tab.Gs[:, None, :, 0], dtype)
    WGy = jnp.asarray(tab.wq[:, :, None] * tab.Gs[:, None, :, 1], dtype)
    full_shape = (4, tab.nq, ly, lx)

    bc_data = []
    for bc in dirichlet:
        g = jnp.asarray(bc.g, dtype)
        if bc.side in ("left", "right"):
            shard_ix, local_i = divmod(bc.index, lx)
            bc_data.append(("col", bc.field, shard_ix, local_i, g))
        else:
            shard_iy, local_i = divmod(bc.index, ly)
            bc_data.append(("row", bc.field, shard_iy, local_i, g))

    def _extend(vb):
        """[F, ly, lx] local vertex block -> [F, ly+1, lx+1] with halo."""
        row = _pull_next(vb[:, 0:1, :], "y", my)        # from (iy+1, ix)
        col = _pull_next(vb[:, :, 0:1], "x", mx)        # from (iy, ix+1)
        cor = _pull_next(_pull_next(vb[:, 0:1, 0:1], "y", my), "x", mx)
        top = jnp.concatenate([vb, row], axis=1)           # [F, ly+1, lx]
        side = jnp.concatenate([col, cor], axis=1)         # [F, ly+1, 1]
        return jnp.concatenate([top, side], axis=2)

    def _local_slots(vext, mb):
        return jnp.stack([
            vext[:, :ly, :lx],
            vext[:, :ly, 1:lx + 1],
            vext[:, 1:ly + 1, 1:lx + 1],
            vext[:, 1:ly + 1, :lx],
            mb,
        ], axis=0)

    def local_residual(vb, mb, v0b, m0b, dt):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        oy, ox = iy * ly, ix * lx

        loc = _local_slots(_extend(vb), mb)
        uq, du = _eval_qp(Bq, Gs, loc)
        u_t, du_t = _as_tuples(uq, du)
        loc0 = _local_slots(_extend(v0b), m0b)
        u0q, du0 = _eval_qp(Bq, Gs, loc0)
        u0_t, du0_t = _as_tuples(u0q, du0)
        ctx = QPContext(u=u_t, du=du_t, u0=u0_t, du0=du0_t, dt=dt)
        source, flux = terms(ctx)
        src = jnp.stack([jnp.broadcast_to(s, full_shape) for s in source], 0)
        fx = jnp.stack([jnp.broadcast_to(f[0], full_shape) for f in flux], 0)
        fy = jnp.stack([jnp.broadcast_to(f[1], full_shape) for f in flux], 0)
        r_loc = (jnp.einsum("tqs,ftqyx->sfyx", WB, src)
                 + jnp.einsum("tqs,ftqyx->sfyx", WGx, fx)
                 + jnp.einsum("tqs,ftqyx->sfyx", WGy, fy))
        # padding cells (beyond the logical ny x nx region) contribute zero —
        # the global assembly guarantees this by slicing; here by masking.
        cell_valid = (((oy + jnp.arange(ly)) < ny)[:, None]
                      & ((ox + jnp.arange(lx)) < nx)[None, :])
        r_loc = jnp.where(cell_valid, r_loc, 0.0)

        # scatter within the extended block, then push the seam line back
        pad = jnp.pad
        rv_ext = (pad(r_loc[0], ((0, 0), (0, 1), (0, 1)))
                  + pad(r_loc[1], ((0, 0), (0, 1), (1, 0)))
                  + pad(r_loc[2], ((0, 0), (1, 0), (1, 0)))
                  + pad(r_loc[3], ((0, 0), (1, 0), (0, 1))))
        rv = rv_ext[:, :ly, :lx]
        rv = rv.at[:, 0:1, :].add(
            _push_next(rv_ext[:, ly:, :lx], "y", my))
        rv = rv.at[:, :, 0:1].add(
            _push_next(rv_ext[:, :ly, lx:], "x", mx))
        rv = rv.at[:, 0:1, 0:1].add(
            _push_next(_push_next(rv_ext[:, ly:, lx:], "y", my), "x", mx))
        rm = r_loc[4]

        # Dirichlet rows: u - g on the owning shard's boundary line
        for kind, f, shard_i, li, g in bc_data:
            if kind == "col":
                seg = lax.dynamic_slice(g, (oy,), (ly,))
                line = jnp.where(ix == shard_i, vb[f, :, li] - seg,
                                 rv[f, :, li])
                rv = rv.at[f, :, li].set(line)
            else:
                seg = lax.dynamic_slice(g, (ox,), (lx,))
                line = jnp.where(iy == shard_i, vb[f, li, :] - seg,
                                 rv[f, li, :])
                rv = rv.at[f, li, :].set(line)
        return rv, rm

    spec = P(None, "y", "x")
    mapped = jax.shard_map(
        local_residual, mesh=mesh,
        in_specs=(spec, spec, spec, spec, P()),
        out_specs=(spec, spec))

    def residual(w, w0, dt):
        v, m = w
        v0, m0 = w0
        return mapped(v, m, v0, m0, jnp.asarray(dt, dtype))

    return residual


def make_halo_functional(
    grid: CrossedTriGrid,
    density: Callable[[QPContext], jnp.ndarray],
    mesh: Mesh,
    dtype=jnp.float64,
):
    """Integral functional with an explicit ``psum`` over the device mesh
    (the allreduce(SUM) of the reference's observables,
    dolfinx/bench1.py:153-158)."""
    assert not grid.periodic and grid.vshape == grid.mshape
    my, mx = mesh.devices.shape
    Y, X = grid.vshape
    ly, lx = Y // my, X // mx
    ny, nx = grid.ny, grid.nx
    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    wq = jnp.asarray(tab.wq, dtype)
    full_shape = (4, tab.nq, ly, lx)

    def _extend(vb):
        row = _pull_next(vb[:, 0:1, :], "y", my)
        col = _pull_next(vb[:, :, 0:1], "x", mx)
        cor = _pull_next(_pull_next(vb[:, 0:1, 0:1], "y", my), "x", mx)
        top = jnp.concatenate([vb, row], axis=1)
        side = jnp.concatenate([col, cor], axis=1)
        return jnp.concatenate([top, side], axis=2)

    def local_value(vb, mb):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        oy, ox = iy * ly, ix * lx
        vext = _extend(vb)
        loc = jnp.stack([
            vext[:, :ly, :lx], vext[:, :ly, 1:lx + 1],
            vext[:, 1:ly + 1, 1:lx + 1], vext[:, 1:ly + 1, :lx], mb], axis=0)
        uq, du = _eval_qp(Bq, Gs, loc)
        u_t, du_t = _as_tuples(uq, du)
        ctx = QPContext(u=u_t, du=du_t, u0=None, du0=None, dt=None)
        e = jnp.broadcast_to(density(ctx), full_shape)
        cell_valid = (((oy + jnp.arange(ly)) < ny)[:, None]
                      & ((ox + jnp.arange(lx)) < nx)[None, :])
        e = jnp.where(cell_valid, e, 0.0)
        part = jnp.einsum("tq,tqyx->", wq, e)
        return lax.psum(lax.psum(part, "y"), "x")

    spec = P(None, "y", "x")
    mapped = jax.shard_map(local_value, mesh=mesh, in_specs=(spec, spec),
                           out_specs=P())

    def value(w):
        return mapped(w[0], w[1])

    return value


def make_halo_residual3d(
    grid,
    terms: Callable,
    n_fields: int,
    mesh: Mesh,
    dtype=jnp.float64,
):
    """3D explicit-halo residual: [F, Z, Y, X] blocks over ('y', 'x'), z
    local (parallel/mesh.state_sharding3d). Single vertex grid, so there is
    no vertex/cell alignment constraint — only Y/X divisibility. Same
    ppermute schedule as 2D (3 forward pulls per state, 3 reverse pushes),
    each line carrying a full z-pencil. Dirichlet faces are not handled
    here (the 2D variant demonstrates owner-shard BC application; the
    production auto-partitioned path covers 3D BCs).
    """
    from pfhubbenchmarks_tpu.fem.grid3d import _SLOT_XYZ

    my, mx = mesh.devices.shape
    Z, Y, X = grid.vshape
    assert Y % my == 0 and X % mx == 0, (grid.vshape, mesh.devices.shape)
    ly, lx = Y // my, X // mx
    nz, ny, nx = grid.nz, grid.ny, grid.nx

    tab = grid.tab()
    Bq = jnp.asarray(tab.Bq, dtype)
    Gs = jnp.asarray(tab.Gs, dtype)
    WB = jnp.asarray(tab.wq[:, :, None] * tab.Bq, dtype)
    WG = [jnp.asarray(tab.wq[:, :, None] * tab.Gs[:, None, :, d], dtype)
          for d in range(3)]
    full_shape = (len(tab.Bq), tab.nq, nz, ly, lx)

    def _extend(vb):
        """[F, Z, ly, lx] -> [F, Z, ly+1, lx+1] with y/x halo pencils."""
        row = _pull_next(vb[:, :, 0:1, :], "y", my)
        col = _pull_next(vb[:, :, :, 0:1], "x", mx)
        cor = _pull_next(_pull_next(vb[:, :, 0:1, 0:1], "y", my), "x", mx)
        top = jnp.concatenate([vb, row], axis=2)
        side = jnp.concatenate([col, cor], axis=2)
        return jnp.concatenate([top, side], axis=3)

    def _slots(vext):
        return jnp.stack([
            vext[:, dz:nz + dz, dy:ly + dy, dx:lx + dx]
            for (dx, dy, dz) in _SLOT_XYZ], axis=0)  # [8, F, nz, ly, lx]

    def _eval(loc):
        uq = jnp.einsum("tqs,sfzyx->ftqzyx", Bq, loc)
        du = jnp.einsum("tsd,sfzyx->fdtzyx", Gs, loc)[:, :, :, None]
        u_t = tuple(uq[i] for i in range(n_fields))
        du_t = tuple((du[i, 0], du[i, 1], du[i, 2]) for i in range(n_fields))
        return u_t, du_t

    def local_residual(vb, v0b, dt):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        oy, ox = iy * ly, ix * lx

        u_t, du_t = _eval(_slots(_extend(vb)))
        u0_t, du0_t = _eval(_slots(_extend(v0b)))
        ctx = QPContext(u=u_t, du=du_t, u0=u0_t, du0=du0_t, dt=dt)
        source, flux = terms(ctx)
        src = jnp.stack([jnp.broadcast_to(s, full_shape) for s in source], 0)
        r_loc = jnp.einsum("tqs,ftqzyx->sfzyx", WB, src)
        for d in range(3):
            fd = jnp.stack([jnp.broadcast_to(f[d], full_shape)
                            for f in flux], 0)
            r_loc = r_loc + jnp.einsum("tqs,ftqzyx->sfzyx", WG[d], fd)
        cell_valid = (((oy + jnp.arange(ly)) < ny)[:, None]
                      & ((ox + jnp.arange(lx)) < nx)[None, :])
        r_loc = jnp.where(cell_valid, r_loc, 0.0)

        rv_ext = 0.0
        for s, (dx, dy, dz) in enumerate(_SLOT_XYZ):
            rv_ext = rv_ext + jnp.pad(
                r_loc[s],
                ((0, 0), (dz, Z - nz - dz), (dy, 1 - dy), (dx, 1 - dx)))
        rv = rv_ext[:, :, :ly, :lx]
        rv = rv.at[:, :, 0:1, :].add(
            _push_next(rv_ext[:, :, ly:, :lx], "y", my))
        rv = rv.at[:, :, :, 0:1].add(
            _push_next(rv_ext[:, :, :ly, lx:], "x", mx))
        rv = rv.at[:, :, 0:1, 0:1].add(
            _push_next(_push_next(rv_ext[:, :, ly:, lx:], "y", my), "x", mx))
        return rv

    spec = P(None, None, "y", "x")
    mapped = jax.shard_map(
        local_residual, mesh=mesh, in_specs=(spec, spec, P()),
        out_specs=spec)

    def residual(w, w0, dt):
        return (mapped(w[0], w0[0], jnp.asarray(dt, dtype)),)

    return residual
