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
from pfhubbenchmarks_tpu.ops.pallas_residual import (_compiler_params,
                                                     _scalar_assembly)


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
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    masks = _edge_masks(nb, rows_c, Xm, dtype)

    def prepare(w, w0):
        return (_slab_views(w[0].astype(dtype), nb, bc, rows_v),
                _slab_views(w[1].astype(dtype), nb, bc, rows_m),
                _slab_views(w0[0].astype(dtype), nb, bc, rows_v),
                _slab_views(w0[1].astype(dtype), nb, bc, rows_m))

    def jv(v, staged, dt):
        wv_s, wm_s, w0v_s, w0m_s = staged
        vv_s = _slab_views(v[0].astype(dtype), nb, bc, rows_v)
        vm_s = _slab_views(v[1].astype(dtype), nb, bc, rows_m)
        dt_arr = jnp.asarray([[dt]], dtype)
        outs = [blk_call(vv_s[b], vm_s[b], wv_s[b], wm_s[b],
                         w0v_s[b], w0m_s[b], masks[b], dt_arr)
                for b in range(nb)]
        return (_unstack_blocks([o[0] for o in outs], bc, bc + 1, Yv, Xv),
                _unstack_blocks([o[1] for o in outs], bc, bc, Ym, Xm))

    return prepare, jv


def _slab_views(a, nb, bc, rows):
    """[..., Y, X] -> list of nb [..., rows, X] slabs; block b covers global
    rows [b*bc - 1, b*bc - 1 + rows).

    Zero-pad once + STATIC slices. The round-2 version built a stacked
    [nb, ...] array with an advanced-indexing row gather and drove the
    blocks through lax.map — the r3 profiler trace showed each gather at
    ~280 us and each lax.map dynamic-update-slice at ~120 us on TPU
    (gathers serialize; DUS with dynamic starts copies). Static slices are
    contiguous copies (~5 us) and the unrolled block loop has no loop
    machinery at all. Storage padding rows are zero by invariant, so
    out-of-logical rows need no masking here (the kernel's edge mask
    handles fake halo cell rows).
    """
    Y = a.shape[-2]
    pad_bot = max(0, (nb - 1) * bc - 1 + rows - Y)
    ap = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(1, pad_bot), (0, 0)])
    return [ap[..., b * bc : b * bc + rows, :] for b in range(nb)]


def _edge_masks(nb, rows_c, Xm, dtype):
    """Per-block cell-row masks zeroing the fake halo rows at domain edges
    (host-precomputed: in-kernel iota/bool masking is a Mosaic-fragility
    surface)."""
    m = np.ones((nb, rows_c, Xm), np.float32)
    m[0, 0, :] = 0.0
    m[nb - 1, rows_c - 1, :] = 0.0
    return [jnp.asarray(m[b], dtype) for b in range(nb)]


def _unstack_blocks(blocks, bc, rows_owned, Y, X):
    """Concatenate per-block owned rows back to [..., Y, X]."""
    parts = [b[..., :bc, :] for b in blocks]
    if rows_owned == bc + 1:   # vertex grids: last logical row from last block
        parts.append(blocks[-1][..., bc : bc + 1, :])
    body = jnp.concatenate(parts, axis=-2)
    pad = Y - body.shape[-2]
    if pad:
        body = jnp.pad(body, [(0, 0)] * (body.ndim - 2) + [(0, pad), (0, 0)])
    return body


def make_tiled_lmr_sweep(grid: CrossedTriGrid, terms, n_fields: int,
                         dtype=jnp.float32, block_rows: int | None = None,
                         field_groups=None, alpha_groups=None,
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

    # The kernel is a PLAIN whole-slab pallas_call (the known-good shape of
    # ops/pallas_residual.py); the block loop is UNROLLED into nb static
    # launches over static slab slices (see _slab_views — the r2 lax.map +
    # gather staging dominated the trace). A grid=(nb,) version of the same
    # kernel SIGABRTs the remote Mosaic compiler (in-kernel jax.jvp under a
    # grid — bisected r2).
    # SolverConfig.field_split: cross-group pinv planes are exactly zero
    # (tests/test_field_split.py) — skip them statically
    from pfhubbenchmarks_tpu.ops.pallas_vcycle import _group_of

    partners = _group_of(field_groups, F)

    def kernel(r_v, r_m, w_v, w_m, w0_v, w0_m, pv, pm, mask_ref, dt_ref,
               z_v_o, z_m_o, az_v_o, az_m_o, av_s, am_s):
        dt = dt_ref[0, 0]

        def bj(pref, rref):
            out = []
            for i in range(F):
                acc = None
                for j in range(F):
                    if j not in partners[i]:
                        continue
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
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    masks = _edge_masks(nb, rows_c, Xm, dtype)

    def _kernel_jvp_z(r, staged, dt):
        (wv_s, wm_s, w0v_s, w0m_s, pv_s, pm_s) = staged
        rv_s = _slab_views(r[0].astype(dtype), nb, bc, rows_v)
        rm_s = _slab_views(r[1].astype(dtype), nb, bc, rows_m)
        dt_arr = jnp.asarray([[dt]], dtype)
        outs = [blk_call(rv_s[b], rm_s[b], wv_s[b], wm_s[b],
                         w0v_s[b], w0m_s[b], pv_s[b], pm_s[b],
                         masks[b], dt_arr)
                for b in range(nb)]
        z = (_unstack_blocks([o[0] for o in outs], bc, bc + 1, Yv, Xv),
             _unstack_blocks([o[1] for o in outs], bc, bc, Ym, Xm))
        az = (_unstack_blocks([o[2] for o in outs], bc, bc + 1, Yv, Xv),
              _unstack_blocks([o[3] for o in outs], bc, bc, Ym, Xm))
        return z, az

    def prepare(w, w0, pinv):
        """Stage sweep-invariant per-block slabs (once per build)."""
        pv, pm = pinv   # [F, F, Yv, Xv], [F, F, Ym, Xm]
        return (_slab_views(w[0].astype(dtype), nb, bc, rows_v),
                _slab_views(w[1].astype(dtype), nb, bc, rows_m),
                _slab_views(w0[0].astype(dtype), nb, bc, rows_v),
                _slab_views(w0[1].astype(dtype), nb, bc, rows_m),
                _slab_views(pv.astype(dtype), nb, bc, rows_v),
                _slab_views(pm.astype(dtype), nb, bc, rows_m))

    def sweep(x, r, n, staged, dt):
        from pfhubbenchmarks_tpu.ops.pallas_vcycle import (_alpha_mul, _lmr_alpha)

        def body(carry, _):
            x, r = carry
            z, az = _kernel_jvp_z(r, staged, dt)
            alpha = _lmr_alpha(az[0], az[1], r[0].astype(dtype),
                               r[1].astype(dtype), alpha_groups)
            x = (x[0] + _alpha_mul(alpha, z[0]),
                 x[1] + _alpha_mul(alpha, z[1]))
            r = (r[0] - _alpha_mul(alpha, az[0]),
                 r[1] - _alpha_mul(alpha, az[1]))
            return (x, r), None

        (x, r), _ = lax.scan(body, (x, r), None, length=n)
        return x, r

    return prepare, sweep
