"""Pallas TPU kernels for the 3D (Kuhn-tet) assembly hot path.

3D J.v products are the bench1_3d per-iteration bottleneck: the XLA einsum
assembly (fem/assembly3d.py) materializes [F, 6, nq, nz, ny, nx]
intermediates (48 MB at 50³/nq=4) per evaluation — measured 3.2 ms per f32
residual and 21.7 ms per V-cycle at 50³ (r3 attribution,
.scratch/prof_r5b.log). These kernels unroll the (tet, quad-point)
contractions into scalar-coefficient FMAs over [F, nz, ny, nx] volumes —
the 3D analog of ops/pallas_residual.py — so live intermediates stay ~one
field volume regardless of nq and HBM traffic drops to the state itself.

Two tilings:
- whole-array kernels for volumes inside the scoped-VMEM envelope
  (coarse levels: 25³ and below at 2 fields);
- z-slab-tiled kernels for the 50³ fine level: blocks of ``bc`` cell
  z-planes with one halo plane each side, unrolled static launches over
  static slab slices (the known-good shape of ops/pallas_tiled.py — a
  grid=(nb,) variant of in-kernel jvp SIGABRTs the remote Mosaic
  compiler, bisected r2).

State is a single vertex grid ``(v,)`` (fem/grid3d.py) — no center grid,
so slots/scatter are the 8 cell corners only.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfhubbenchmarks_tpu.fem.assembly import QPContext
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid, _SLOT_XYZ
from pfhubbenchmarks_tpu.ops.pallas_residual import (_compiler_params,
                                                     VMEM_LIMIT_BYTES)

_ZERO_TOL = 1e-300


def _scalar_assembly3d(grid: TetGrid, terms, n_fields: int):
    """3D residual with all element contractions unrolled to scalar FMAs.

    Returns ``residual(w, w0, dt) -> acc_loc`` where ``acc_loc[s][f]`` is
    the [nz, ny, nx] per-corner-slot contribution plane (8 slots), to be
    scattered by the caller (shifted slice adds into refs)."""
    tab = grid.tab()
    Bq = np.asarray(tab.Bq)                      # [6, nq, 8]
    Gs = np.asarray(tab.Gs)                      # [6, 8, 3]
    WB = tab.wq[:, :, None] * tab.Bq             # [6, nq, 8]
    WG = [tab.wq[:, :, None] * tab.Gs[:, None, :, d] for d in range(3)]
    nq = tab.nq
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    F = n_fields

    def local(w):
        (v,) = w
        return [v[:, dz:nz + dz, dy:ny + dy, dx:nx + dx]
                for (dx, dy, dz) in _SLOT_XYZ]

    def _combine(vols, coeffs):
        acc = None
        for p, c in zip(vols, coeffs):
            c = float(c)
            if abs(c) < _ZERO_TOL:
                continue
            acc = c * p if acc is None else acc + c * p
        return acc if acc is not None else 0.0 * vols[0]

    def residual(w, w0, dt):
        locs = local(w)
        locs0 = local(w0)
        acc_loc = [[None] * F for _ in range(8)]
        for t in range(6):
            du_t = tuple(
                (_combine([locs[s][f] for s in range(8)], Gs[t, :, 0]),
                 _combine([locs[s][f] for s in range(8)], Gs[t, :, 1]),
                 _combine([locs[s][f] for s in range(8)], Gs[t, :, 2]))
                for f in range(F))
            du0_t = tuple(
                (_combine([locs0[s][f] for s in range(8)], Gs[t, :, 0]),
                 _combine([locs0[s][f] for s in range(8)], Gs[t, :, 1]),
                 _combine([locs0[s][f] for s in range(8)], Gs[t, :, 2]))
                for f in range(F))
            for q in range(nq):
                u_q = tuple(_combine([locs[s][f] for s in range(8)],
                                     Bq[t, q]) for f in range(F))
                u0_q = tuple(_combine([locs0[s][f] for s in range(8)],
                                      Bq[t, q]) for f in range(F))
                ctx = QPContext(u=u_q, du=du_t, u0=u0_q, du0=du0_t, dt=dt)
                source, flux = terms(ctx)
                for s in range(8):
                    wb = float(WB[t, q, s])
                    wgs = [float(WG[d][t, q, s]) for d in range(3)]
                    if abs(wb) < _ZERO_TOL and all(abs(g) < _ZERO_TOL
                                                   for g in wgs):
                        continue
                    for f in range(F):
                        term = wb * jnp.broadcast_to(source[f], (nz, ny, nx))
                        for d in range(3):
                            if abs(wgs[d]) >= _ZERO_TOL:
                                term = term + wgs[d] * jnp.broadcast_to(
                                    flux[f][d], (nz, ny, nx))
                        if acc_loc[s][f] is None:
                            acc_loc[s][f] = term
                        else:
                            acc_loc[s][f] = acc_loc[s][f] + term
        return acc_loc

    return residual


def _scatter_refs3d(acc_loc, out_v, n_fields, nz, ny, nx, mask=None):
    """Accumulate per-slot volumes into the padded output ref (slice adds;
    Mosaic rejects value-level scatter-add). ``mask`` (optional [nz, ny, nx])
    zeroes fake halo cell planes in the tiled kernels."""
    out_v[:] = jnp.zeros_like(out_v)
    for s, (dx, dy, dz) in enumerate(_SLOT_XYZ):
        for f in range(n_fields):
            a = acc_loc[s][f]
            if mask is not None:
                a = a * mask
            out_v[f, dz:nz + dz, dy:ny + dy, dx:nx + dx] = (
                out_v[f, dz:nz + dz, dy:ny + dy, dx:nx + dx] + a)


def _tiled_vol_bytes(grid: TetGrid, dtype_bytes: int = 4) -> int:
    """Bytes of one field volume under (8, 128) tiling of the last two dims."""
    z = grid.vshape[0]
    y = -(-grid.vshape[1] // 8) * 8
    x = -(-grid.vshape[2] // 128) * 128
    return z * y * x * dtype_bytes


def fits_vmem3d(grid: TetGrid, n_fields: int, nq: int,
                budget: int = 60 * 2**20, kernel: str = "jvp") -> bool:
    """Whole-array feasibility vs the 110 MB raised VMEM cap (conservative
    60 MB budget until calibrated — 3D volumes lane-pad heavily)."""
    T = _tiled_vol_bytes(grid)
    if kernel == "sweep_loop":
        return ((25 + 12 * nq) * n_fields + 5 * n_fields ** 2) * T < budget
    return (20 + 12 * nq) * n_fields * T < budget


def make_pallas_jvp3d(grid: TetGrid, terms, n_fields: int,
                      dtype=jnp.float32):
    """Fused whole-array 3D J.v: one pallas_call. BC rows are the caller's
    concern (cheap face writes)."""
    residual = _scalar_assembly3d(grid, terms, n_fields)
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    F = n_fields
    Z, Y, X = grid.vshape

    def kernel(w_v, w0_v, v_v, dt_ref, out_v):
        dt = dt_ref[0, 0]
        _, jv = jax.jvp(lambda u: residual(u, (w0_v[:],), dt),
                        ((w_v[:],),), (((v_v[:],)),))
        _scatter_refs3d(jv, out_v, F, nz, ny, nx)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, Z, Y, X), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )

    @partial(jax.jit, static_argnames=())
    def jv_fn(w, w0, dt, v):
        dt_arr = jnp.asarray([[dt]], dtype)
        return (call(w[0], w0[0], v[0], dt_arr),)

    return jv_fn


def make_pallas_lmr_sweep_loop3d(grid: TetGrid, terms, n_fields: int,
                                 dtype=jnp.float32, n_sweeps: int = 1,
                                 interpret: bool = False):
    """Whole smoothing phase (n LMR sweeps under fori_loop) as ONE kernel —
    the 3D analog of make_pallas_lmr_sweep_loop. ``pinv`` is the [F, F, ...]
    node-block inverse volume. Dirichlet-free levels only."""
    residual = _scalar_assembly3d(grid, terms, n_fields)
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    F = n_fields
    Z, Y, X = grid.vshape

    def kernel(x_v, r_v, w_v, w0_v, pv, dt_ref, ox_v, or_v, az_v):
        dt = dt_ref[0, 0]
        w = (w_v[:],)
        w0 = (w0_v[:],)

        def body(_, carry):
            x, r = carry
            zs = []
            for i in range(F):
                acc = None
                for j in range(F):
                    t = pv[i, j] * r[j]
                    acc = t if acc is None else acc + t
                zs.append(acc)
            z = jnp.stack(zs)
            _, planes = jax.jvp(lambda u: residual(u, w0, dt), (w,),
                                ((z,),))
            _scatter_refs3d(planes, az_v, F, nz, ny, nx)
            Az = az_v[:]
            num = jnp.sum(Az * r)
            den = jnp.sum(Az * Az)
            alpha = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                              0.0)
            return (x + alpha * z, r - alpha * Az)

        x, r = lax.fori_loop(0, n_sweeps, body, (x_v[:], r_v[:]))
        ox_v[:] = x
        or_v[:] = r

    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((F, Z, Y, X), dtype),
                   jax.ShapeDtypeStruct((F, Z, Y, X), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((F, Z, Y, X), dtype)],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    def sweep(x, r, w, w0, dt, pinv_v):
        dt_arr = jnp.asarray([[dt]], dtype)
        ox, orr = call(x[0], r[0], w[0], w0[0], pinv_v, dt_arr)
        return (ox,), (orr,)

    return sweep


# ---------------------------------------------------------------------------
# z-slab tiling for the 50³ fine level
# ---------------------------------------------------------------------------


def choose_block_zrows(grid: TetGrid, n_fields: int, nq: int,
                       budget: int = 60 * 2**20) -> int | None:
    """Largest divisor-of-nz cell-z-block whose slab kernel fits VMEM."""
    F = n_fields
    y = -(-grid.vshape[1] // 8) * 8
    x = -(-grid.vshape[2] // 128) * 128
    for bc in (d for d in range(grid.nz, 1, -1) if grid.nz % d == 0):
        T_b = (bc + 3) * y * x * 4
        if ((18 + 10 * nq) * F + 4 * F * F) * T_b < budget:
            return bc
    return None


def _slab_views3d(a, nb, bc, rows):
    """[..., Z, Y, X] -> nb slabs of ``rows`` z-planes; block b covers
    global z-planes [b*bc - 1, b*bc - 1 + rows). Zero-pad + static slices
    (see ops/pallas_tiled._slab_views for the measured gather/lax.map
    rationale)."""
    Z = a.shape[-3]
    pad_bot = max(0, (nb - 1) * bc - 1 + rows - Z)
    ap = jnp.pad(a, [(0, 0)] * (a.ndim - 3) + [(1, pad_bot), (0, 0), (0, 0)])
    return [ap[..., b * bc: b * bc + rows, :, :] for b in range(nb)]


def _edge_masks3d(nb, rows_c, ny, nx, Ym, Xm, dtype):
    """Per-block cell-plane masks zeroing fake halo z-planes at domain
    edges (host-precomputed; [rows_c, ny, nx] logical inside [rows_c, Ym,
    Xm] storage)."""
    m = np.zeros((nb, rows_c, Ym, Xm), np.float32)
    m[:, :, :ny, :nx] = 1.0
    m[0, 0] = 0.0
    m[nb - 1, rows_c - 1] = 0.0
    return [jnp.asarray(m[b], dtype) for b in range(nb)]


def _unstack_blocks3d(blocks, bc, Z, pad_shape):
    parts = [b[..., :bc, :, :] for b in blocks]
    parts.append(blocks[-1][..., bc: bc + 1, :, :])
    body = jnp.concatenate(parts, axis=-3)
    pad = Z - body.shape[-3]
    if pad:
        body = jnp.pad(body, [(0, 0)] * (body.ndim - 3)
                       + [(0, pad), (0, 0), (0, 0)])
    return body


def make_tiled_jvp3d(grid: TetGrid, terms, n_fields: int,
                     dtype=jnp.float32, block_rows: int | None = None,
                     interpret: bool = False):
    """z-slab-tiled 3D J.v. Returns ``(prepare, jv)``: ``prepare(w, w0)``
    stages slab views once per linearization; ``jv(v, staged, dt) -> (av,)``."""
    F = n_fields
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    Z, Y, X = grid.vshape
    bc = block_rows or choose_block_zrows(grid, F, grid.tab().nq)
    assert bc is not None and nz % bc == 0, (nz, bc)
    nb = nz // bc
    rows_c = bc + 2
    rows_v = bc + 3
    blk_grid = dataclasses.replace(grid, nz=rows_c, Lz=grid.hz * rows_c,
                                   pad_to=(1, 1, 1))
    resid_blk = _scalar_assembly3d(blk_grid, terms, F)

    def kernel(v_v, w_v, w0_v, mask_ref, dt_ref, az_o, av_s):
        dt = dt_ref[0, 0]
        _, acc = jax.jvp(lambda u: resid_blk(u, (w0_v[:],), dt),
                         ((w_v[:],),), (((v_v[:],)),))
        mask = mask_ref[:, :ny, :nx]
        _scatter_refs3d(acc, av_s, F, rows_c, ny, nx, mask=mask)
        az_o[:] = av_s[:, 1:bc + 2, :, :]

    blk_call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, bc + 1, Y, X), dtype),
        scratch_shapes=[pltpu.VMEM((F, rows_v, Y, X), dtype)],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    masks = _edge_masks3d(nb, rows_c, ny, nx, Y, X, dtype)

    def prepare(w, w0):
        return (_slab_views3d(w[0].astype(dtype), nb, bc, rows_v),
                _slab_views3d(w0[0].astype(dtype), nb, bc, rows_v))

    def jv(v, staged, dt):
        wv_s, w0v_s = staged
        vv_s = _slab_views3d(v[0].astype(dtype), nb, bc, rows_v)
        dt_arr = jnp.asarray([[dt]], dtype)
        outs = [blk_call(vv_s[b], wv_s[b], w0v_s[b], masks[b], dt_arr)
                for b in range(nb)]
        return (_unstack_blocks3d(outs, bc, Z, None),)

    return prepare, jv


def make_tiled_lmr_sweep3d(grid: TetGrid, terms, n_fields: int,
                           dtype=jnp.float32, block_rows: int | None = None,
                           interpret: bool = False):
    """z-slab-tiled LMR sweep (3D analog of make_tiled_lmr_sweep).
    Returns ``(prepare, sweep)``; ``prepare(w, w0, pinv)`` once per build,
    ``sweep(x, r, n, staged, dt)`` runs n sweeps."""
    F = n_fields
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    Z, Y, X = grid.vshape
    bc = block_rows or choose_block_zrows(grid, F, grid.tab().nq)
    assert bc is not None and nz % bc == 0, (nz, bc)
    nb = nz // bc
    rows_c = bc + 2
    rows_v = bc + 3
    blk_grid = dataclasses.replace(grid, nz=rows_c, Lz=grid.hz * rows_c,
                                   pad_to=(1, 1, 1))
    resid_blk = _scalar_assembly3d(blk_grid, terms, F)

    def kernel(r_v, w_v, w0_v, pv, mask_ref, dt_ref, z_o, az_o, av_s):
        dt = dt_ref[0, 0]
        zs = []
        for i in range(F):
            acc = None
            for j in range(F):
                t = pv[i, j] * r_v[j]
                acc = t if acc is None else acc + t
            zs.append(acc)
        z = jnp.stack(zs)
        _, acc = jax.jvp(lambda u: resid_blk(u, (w0_v[:],), dt),
                         ((w_v[:],),), (((z,),)))
        mask = mask_ref[:, :ny, :nx]
        _scatter_refs3d(acc, av_s, F, rows_c, ny, nx, mask=mask)
        z_o[:] = z[:, 1:bc + 2, :, :]
        az_o[:] = av_s[:, 1:bc + 2, :, :]

    blk_call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((F, bc + 1, Y, X), dtype),
                   jax.ShapeDtypeStruct((F, bc + 1, Y, X), dtype)),
        scratch_shapes=[pltpu.VMEM((F, rows_v, Y, X), dtype)],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    masks = _edge_masks3d(nb, rows_c, ny, nx, Y, X, dtype)

    def prepare(w, w0, pinv):
        (pv,) = (pinv,) if not isinstance(pinv, tuple) else pinv
        return (_slab_views3d(w[0].astype(dtype), nb, bc, rows_v),
                _slab_views3d(w0[0].astype(dtype), nb, bc, rows_v),
                _slab_views3d(pv.astype(dtype), nb, bc, rows_v))

    def _kernel_z_az(r, staged, dt):
        wv_s, w0v_s, pv_s = staged
        rv_s = _slab_views3d(r[0].astype(dtype), nb, bc, rows_v)
        dt_arr = jnp.asarray([[dt]], dtype)
        outs = [blk_call(rv_s[b], wv_s[b], w0v_s[b], pv_s[b], masks[b],
                         dt_arr) for b in range(nb)]
        z = (_unstack_blocks3d([o[0] for o in outs], bc, Z, None),)
        az = (_unstack_blocks3d([o[1] for o in outs], bc, Z, None),)
        num = jnp.sum(az[0] * r[0].astype(dtype))
        den = jnp.sum(az[0] * az[0])
        return z, az, num, den

    def sweep(x, r, n, staged, dt):
        def body(carry, _):
            x, r = carry
            z, az, num, den = _kernel_z_az(r, staged, dt)
            alpha = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                              0.0)
            x = (x[0] + alpha * z[0],)
            r = (r[0] - alpha * az[0],)
            return (x, r), None

        (x, r), _ = lax.scan(body, (x, r), None, length=n)
        return x, r

    return prepare, sweep
