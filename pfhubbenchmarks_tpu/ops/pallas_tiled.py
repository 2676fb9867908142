"""Row-block-tiled LMR smoothing kernel — fused sweeps for grids that
exceed the whole-array VMEM envelope.

The whole-array sweep kernels (ops/pallas_residual.py) hold every operand
in VMEM, which caps them at ~2-field 100^2 grids (16 MB scoped stack);
bench2's 6-field fine level and bench3's 350^2 levels fall back to ~25
unfused XLA ops per sweep. This kernel tiles the sweep over row blocks:

- the grid axis walks ``nb = ny // block_rows`` blocks; every block loads a
  (block_rows + halo)-row slab of each operand (inputs are pre-staged into
  non-overlapping stacked slabs by XLA gathers, so standard BlockSpecs
  apply — no in-kernel DMA choreography);
- per block: z = P^-1 r pointwise on the full slab, A z by ``jax.jvp`` of
  the block-local scalar-FMA assembly (halo cell rows are re-evaluated, ~2
  rows per block of duplicated work), plus the block's partial <Az,r> and
  <Az,Az> sums over OWNED rows only;
- outside: alpha = sum(num)/sum(den), then two fused axpys.

One sweep = one pallas_call + a handful of cheap XLA reshape/axpy ops.
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

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.ops.pallas_residual import _scalar_assembly


def choose_block_rows(ny: int, target: int = 32) -> int | None:
    """Largest divisor of ny that is <= target (None if only trivial)."""
    for bc in range(min(target, ny), 3, -1):
        if ny % bc == 0:
            return bc
    return None


def choose_block_rows_vmem(grid: CrossedTriGrid, n_fields: int, nq: int,
                           budget: int = 15 * 2**20) -> int | None:
    """Largest divisor-of-ny block whose slab kernel fits scoped VMEM.

    Bigger blocks mean fewer per-sweep kernel launches (the dominant tiled
    overhead — lax.map serializes them); the reduced preconditioner
    quadrature (nq=1/3) shrinks the in-kernel jvp trace, so blocks can be
    far taller than the fixed target=32 heuristic allowed. Coefficients
    calibrated by TPU compile probes (r3, .scratch/vmem_calib.log: 2F/350²
    nq=3 compiles at bc=70; 6F/100² nq=1 at bc=50)."""
    F = n_fields
    for bc in (d for d in range(grid.ny // 2, 3, -1) if grid.ny % d == 0):
        y = -(-(bc + 3) // 8) * 8
        x = -(-(grid.nx + 1) // 128) * 128
        T_b = y * x * 4
        if ((20 + 10 * nq) * F + 4 * F * F) * T_b < budget:
            return bc
    return None


def make_tiled_jvp(grid: CrossedTriGrid, terms, n_fields: int,
                   dtype=jnp.float32, block_rows: int | None = None,
                   interpret: bool = False):
    """Row-block-tiled J.v — the fused matvec for grids past the whole-array
    VMEM envelope (bench3's 350², bench2's 6-field 100²).

    The XLA einsum J.v at 350² measured 1.6-2.2 ms on TPU (op-count bound,
    ~20 unfused kernels) and is paid TWICE per Krylov iteration (outer
    matvec + the V-cycle's post-correction residual); this kernel does one
    gather + nb slab launches + one unstack. Returns ``(prepare, jv)``:
    ``prepare(w, w0)`` stages the linearization state once per Newton
    iteration; ``jv(v, staged, dt) -> (av, am)``.
    """
    F = n_fields
    ny, nx = grid.ny, grid.nx
    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape
    bc = block_rows or choose_block_rows(ny)
    assert bc is not None and ny % bc == 0, (ny, bc)
    nb = ny // bc
    rows_c = bc + 2
    rows_v = bc + 3
    rows_m = bc + 2
    blk_grid = dataclasses.replace(grid, ny=rows_c, Ly=grid.hy * rows_c,
                                   pad_to=(1, 1))
    resid_blk = _scalar_assembly(blk_grid, terms, F)

    gather_v = partial(_row_gather, nb=nb, bc=bc, rows=rows_v,
                       nrows_logical=ny + 1)
    gather_m = partial(_row_gather, nb=nb, bc=bc, rows=rows_m,
                       nrows_logical=ny)

    def kernel(v_v, v_m, w_v, w_m, w0_v, w0_m, mask_ref, dt_ref,
               az_v_o, az_m_o, av_s, am_s):
        dt = dt_ref[0, 0]
        _, acc = jax.jvp(lambda u: resid_blk(u, (w0_v[:], w0_m[:]), dt),
                         ((w_v[:], w_m[:]),), ((v_v[:], v_m[:]),))
        mask = mask_ref[:, :nx]
        av_s[:] = jnp.zeros_like(av_s)
        am_s[:] = jnp.zeros_like(am_s)
        shifts = [(0, 0), (0, 1), (1, 1), (1, 0)]  # SW, SE, NE, NW
        for f in range(F):
            for s_i, (dy, dx) in enumerate(shifts):
                av_s[f, dy:rows_c + dy, dx:nx + dx] = (
                    av_s[f, dy:rows_c + dy, dx:nx + dx] + acc[s_i][f] * mask)
            am_s[f, :rows_c, :nx] = acc[4][f] * mask
        az_v_o[:] = av_s[:, 1:bc + 2, :]
        az_m_o[:] = am_s[:, 1:bc + 1, :]

    blk_call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(2)),
        out_shape=(jax.ShapeDtypeStruct((F, bc + 1, Xv), dtype),
                   jax.ShapeDtypeStruct((F, bc, Xm), dtype)),
        scratch_shapes=[pltpu.VMEM((F, rows_v, Xv), dtype),
                        pltpu.VMEM((F, rows_m, Xm), dtype)],
        interpret=interpret,
    )

    _masks = np.ones((nb, rows_c, Xm), np.float32)
    _masks[0, 0, :] = 0.0
    _masks[nb - 1, rows_c - 1, :] = 0.0
    _masks = jnp.asarray(_masks, dtype)

    def _unstack(stack, rows_owned, Y, X):
        body = jnp.moveaxis(stack[:, :, :bc, :], 0, 1).reshape(F, nb * bc, X)
        if rows_owned == bc + 1:
            lastrow = stack[nb - 1, :, bc, :][:, None, :]
            body = jnp.concatenate([body, lastrow], axis=1)
        pad = Y - body.shape[1]
        if pad:
            body = jnp.concatenate(
                [body, jnp.zeros((F, pad, X), stack.dtype)], axis=1)
        return body

    def prepare(w, w0):
        return (gather_v(w[0].astype(dtype)), gather_m(w[1].astype(dtype)),
                gather_v(w0[0].astype(dtype)), gather_m(w0[1].astype(dtype)))

    def jv(v, staged, dt):
        wv_s, wm_s, w0v_s, w0m_s = staged
        vv_s = gather_v(v[0].astype(dtype))
        vm_s = gather_m(v[1].astype(dtype))
        dt_arr = jnp.asarray([[dt]], dtype)

        def per_block(args):
            vv, vm, wv, wm, w0v, w0m, mk = args
            return blk_call(vv, vm, wv, wm, w0v, w0m, mk, dt_arr)

        avs, ams = lax.map(per_block, (vv_s, vm_s, wv_s, wm_s,
                                       w0v_s, w0m_s, _masks))
        return (_unstack(avs, bc + 1, Yv, Xv), _unstack(ams, bc, Ym, Xm))

    return prepare, jv


def _row_gather(a, nb, bc, rows, nrows_logical):
    """[F, Y, X] -> [nb, F, rows, X]; block b covers global rows
    [b*bc - 1, b*bc - 1 + rows); out-of-range rows are zeros."""
    idx = np.arange(nb)[:, None] * bc - 1 + np.arange(rows)[None, :]
    valid = (idx >= 0) & (idx < nrows_logical)
    idxc = np.clip(idx, 0, a.shape[1] - 1)
    out = a[:, jnp.asarray(idxc), :]            # [F, nb, rows, X]
    out = jnp.where(jnp.asarray(valid)[None, :, :, None], out, 0.0)
    return jnp.moveaxis(out, 1, 0)


def make_tiled_lmr_sweep(grid: CrossedTriGrid, terms, n_fields: int,
                         dtype=jnp.float32, block_rows: int | None = None,
                         interpret: bool = False):
    """Returns ``(prepare, sweep)``:

    ``prepare(w, w0, pinv)`` stages the sweep-invariant operands (block
    stacks of the linearization state and node-block inverses) once per
    preconditioner build; ``sweep(x, r, n, staged, dt)`` runs n LMR sweeps.
    """
    F = n_fields
    ny, nx = grid.ny, grid.nx
    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape
    bc = block_rows or choose_block_rows(ny)
    assert bc is not None and ny % bc == 0, (ny, bc)
    nb = ny // bc
    rows_c = bc + 2           # cell rows evaluated per block
    rows_v = bc + 3           # vertex slab rows
    rows_m = bc + 2           # center slab rows
    # block-local tabulation: same element geometry, rows_c cell rows
    blk_grid = dataclasses.replace(grid, ny=rows_c, Ly=grid.hy * rows_c,
                                   pad_to=(1, 1))
    resid_blk = _scalar_assembly(blk_grid, terms, F)

    gather_v = partial(_row_gather, nb=nb, bc=bc, rows=rows_v,
                       nrows_logical=ny + 1)
    gather_m = partial(_row_gather, nb=nb, bc=bc, rows=rows_m,
                       nrows_logical=ny)

    # The kernel is a PLAIN whole-slab pallas_call (the known-good shape of
    # ops/pallas_residual.py); the block loop runs as a host-level lax.map
    # over the stacked slabs. A grid=(nb,) version of the same kernel
    # SIGABRTs the remote Mosaic compiler (in-kernel jax.jvp under a grid —
    # bisected r2); sequential per-block launches cost ~nb kernel-launch
    # overheads per sweep, still far below the ~25 unfused XLA ops they
    # replace. The block index arrives as an SMEM scalar.
    def kernel(r_v, r_m, w_v, w_m, w0_v, w0_m, pv, pm, mask_ref, dt_ref,
               z_v_o, z_m_o, az_v_o, az_m_o, av_s, am_s):
        dt = dt_ref[0, 0]

        def bj(pref, rref):
            out = []
            for i in range(F):
                acc = None
                for j in range(F):
                    t = pref[i, j] * rref[j]
                    acc = t if acc is None else acc + t
                out.append(acc)
            return jnp.stack(out)

        zv = bj(pv, r_v)      # [F, rows_v, Xv]
        zm = bj(pm, r_m)

        w_blk = (w_v[:], w_m[:])
        z_blk = (zv, zm)
        _, acc = jax.jvp(lambda u: resid_blk(u, (w0_v[:], w0_m[:]), dt),
                         (w_blk,), (z_blk,))
        # acc: [5][F] planes of [rows_c, nx] tangent contributions.
        # The fake halo cell rows at the domain edges (block 0's local cell
        # row 0, the last block's local row bc+1) are zeroed by a
        # host-precomputed per-block mask plane (in-kernel iota/bool masking
        # is another Mosaic-fragility surface).
        mask = mask_ref[:, :nx]
        # scatter into slab scratch refs (read-modify-write slice updates;
        # Mosaic rejects value-level scatter-add)
        av_s[:] = jnp.zeros_like(av_s)
        am_s[:] = jnp.zeros_like(am_s)
        shifts = [(0, 0), (0, 1), (1, 1), (1, 0)]  # SW, SE, NE, NW
        for f in range(F):
            for s_i, (dy, dx) in enumerate(shifts):
                av_s[f, dy:rows_c + dy, dx:nx + dx] = (
                    av_s[f, dy:rows_c + dy, dx:nx + dx] + acc[s_i][f] * mask)
            am_s[f, :rows_c, :nx] = acc[4][f] * mask
        av = av_s[:]
        am = am_s[:]

        # owned slices: vertex local rows [1, bc+2), center [1, bc+1)
        z_v_o[:] = zv[:, 1:bc + 2, :]
        z_m_o[:] = zm[:, 1:bc + 1, :]
        az_v_o[:] = av[:, 1:bc + 2, :]
        az_m_o[:] = am[:, 1:bc + 1, :]

        # (the <Az,r>/<Az,Az> reductions run in XLA on the reassembled
        # arrays — keeping them out of the kernel keeps the Mosaic surface
        # minimal)

    blk_call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        out_shape=(jax.ShapeDtypeStruct((F, bc + 1, Xv), dtype),
                   jax.ShapeDtypeStruct((F, bc, Xm), dtype),
                   jax.ShapeDtypeStruct((F, bc + 1, Xv), dtype),
                   jax.ShapeDtypeStruct((F, bc, Xm), dtype)),
        scratch_shapes=[pltpu.VMEM((F, rows_v, Xv), dtype),
                        pltpu.VMEM((F, rows_m, Xm), dtype)],
        interpret=interpret,
    )

    # per-block edge masks, host-precomputed
    _masks = np.ones((nb, rows_c, Xm), np.float32)
    _masks[0, 0, :] = 0.0
    _masks[nb - 1, rows_c - 1, :] = 0.0
    _masks = jnp.asarray(_masks, dtype)

    def call(rv_s, rm_s, wv_s, wm_s, w0v_s, w0m_s, pv_s, pm_s, dt_arr):
        def per_block(args):
            rv, rm, wv, wm, w0v, w0m, pvb, pmb, mk = args
            return blk_call(rv, rm, wv, wm, w0v, w0m, pvb, pmb, mk, dt_arr)

        return lax.map(per_block, (rv_s, rm_s, wv_s, wm_s, w0v_s, w0m_s,
                                   pv_s, pm_s, _masks))

    def _unstack(stack, rows_owned, Y, X):
        """[nb, F, rows_owned, X] -> [F, Y, X]; blocks own rows [0, bc),
        plus the final logical row from the last block (vertex only)."""
        body = jnp.moveaxis(stack[:, :, :bc, :], 0, 1).reshape(F, nb * bc, X)
        if rows_owned == bc + 1:   # vertex: add the last shared row
            lastrow = stack[nb - 1, :, bc, :][:, None, :]
            body = jnp.concatenate([body, lastrow], axis=1)
        pad = Y - body.shape[1]
        if pad:
            body = jnp.concatenate(
                [body, jnp.zeros((F, pad, X), stack.dtype)], axis=1)
        return body

    def _kernel_jvp_z(r, staged, dt):
        (wv_s, wm_s, w0v_s, w0m_s, pv_s, pm_s) = staged
        rv_s = gather_v(r[0].astype(dtype))
        rm_s = gather_m(r[1].astype(dtype))
        dt_arr = jnp.asarray([[dt]], dtype)
        zvs, zms, avs, ams = call(
            rv_s, rm_s, wv_s, wm_s, w0v_s, w0m_s, pv_s, pm_s, dt_arr)
        z = (_unstack(zvs, bc + 1, Yv, Xv), _unstack(zms, bc, Ym, Xm))
        az = (_unstack(avs, bc + 1, Yv, Xv), _unstack(ams, bc, Ym, Xm))
        num = (jnp.sum(az[0] * r[0].astype(dtype))
               + jnp.sum(az[1] * r[1].astype(dtype)))
        den = jnp.sum(az[0] * az[0]) + jnp.sum(az[1] * az[1])
        return z, az, num, den

    def prepare(w, w0, pinv):
        """Stage sweep-invariant block stacks (once per Newton iteration)."""
        pv, pm = pinv   # [F, F, Yv, Xv], [F, F, Ym, Xm]
        pv_s = gather_v(pv.reshape(F * F, Yv, Xv).astype(dtype)) \
            .reshape(nb, F, F, rows_v, Xv)
        pm_s = gather_m(pm.reshape(F * F, Ym, Xm).astype(dtype)) \
            .reshape(nb, F, F, rows_m, Xm)
        return (gather_v(w[0].astype(dtype)), gather_m(w[1].astype(dtype)),
                gather_v(w0[0].astype(dtype)), gather_m(w0[1].astype(dtype)),
                pv_s, pm_s)

    def sweep(x, r, n, staged, dt):
        def body(carry, _):
            x, r = carry
            z, az, num, den = _kernel_jvp_z(r, staged, dt)
            alpha = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                              0.0)
            x = (x[0] + alpha * z[0], x[1] + alpha * z[1])
            r = (r[0] - alpha * az[0], r[1] - alpha * az[1])
            return (x, r), None

        (x, r), _ = lax.scan(body, (x, r), None, length=n)
        return x, r

    return prepare, sweep
