"""Grid-form row-block-tiled kernels: ONE ``pallas_call`` with
``grid=(nb,)`` per J.v / sweep, retiring the Mosaic grid+jvp SIGABRT.

ops/pallas_tiled.py works around a remote-Mosaic abort (bisected round 3:
``jax.jvp`` of the WHOLE block scalar-FMA assembly under a Pallas grid) by
unrolling the blocks into nb separate plain kernel launches. The round-5
bisect (tools/probes/gridjvp_probe.py) split the hypothesis further: the
gather/interpolate/scatter ladder is LINEAR — only the pointwise physics
``terms(ctx)`` needs differentiation. These kernels therefore hand-write
the tangent assembly: gather the tangent operands with the same fixed
tabulation ladder as the primal, ``jax.jvp`` ONLY the per-quadrature-point
physics closure (no refs, no assembly inside the jvp), and scatter the
tangent planes with the weighted shifts. That keeps the jvp trace free of
ref indexing under the grid — the shape the probe compiles and runs on the
TPU.

Differences from the unrolled-launch kernels (same math):

- one launch per J.v / per sweep instead of nb;
- halo cell rows are NOT re-evaluated: each block evaluates only its own
  ``bc`` cell rows and emits PARTIAL sums at its bc+1 vertex rows; the
  seam row is add-folded on the host (cheap strided XLA adds) — the
  ghostUpdate(ADD, REVERSE) pattern instead of recompute;
- vertex operands are pre-staged into non-overlapping 8-row-aligned slab
  stacks (standard BlockSpecs need disjoint blocks; the +1-row overlap
  between neighbors is materialized once per operand).

Replaces the FFC-generated per-cell tangent kernels of the reference's
assembly path (dolfin/bench1.py:14-16) for VMEM-exceeding grids
(bench3's 350², bench2's 6-field levels).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfhubbenchmarks_tpu.fem.assembly import QPContext
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.ops.pallas_residual import _compiler_params

_ZERO_TOL = 1e-300


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _combine(planes, coeffs):
    acc = None
    for p, c in zip(planes, coeffs):
        c = float(c)
        if abs(c) < _ZERO_TOL:
            continue
        acc = c * p if acc is None else acc + c * p
    return acc if acc is not None else 0.0 * planes[0]


def _local_slots(v, m, rows, nx):
    """The 5 slot planes (SW, SE, NE, NW, C) for ``rows`` cell rows."""
    return [v[:, :rows, :nx], v[:, :rows, 1 : nx + 1],
            v[:, 1 : rows + 1, 1 : nx + 1], v[:, 1 : rows + 1, :nx],
            m[:, :rows, :nx]]


def _stage_rows(a, nb, bc, rows, height):
    """[..., Y, X] -> [..., nb*height, X]: block i's rows
    [i*bc, i*bc+rows), zero-padded to the 8-aligned slab ``height``
    (Pallas requires blocked sublane dims divisible by 8). Static slices +
    one concat (the cheap staging shape, see ops/pallas_tiled._slab_views)."""
    need = (nb - 1) * bc + rows
    pad = max(0, need - a.shape[-2])
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, pad), (0, 0)])
    slabs = [jnp.pad(a[..., i * bc : i * bc + rows, :],
                     [(0, 0)] * (a.ndim - 2) + [(0, height - rows), (0, 0)])
             for i in range(nb)]
    return jnp.concatenate(slabs, axis=-2)


def _stage_v(a, nb, bc, va):
    return _stage_rows(a, nb, bc, bc + 1, va)


def _fold_v(stacked, nb, bc, va, Yv, Xv, *, seam_add: bool):
    """[F, nb*va, Xv] partial slabs -> [F, Yv, Xv].

    Owned rows are block-local rows [0, bc); the seam row ``bc`` either
    ADD-folds into the next block's row 0 (tangent partial sums) or is the
    identical duplicate (pointwise z values, ``seam_add=False``)."""
    F = stacked.shape[0]
    body = stacked.reshape(F, nb, va, Xv)
    owned = body[:, :, :bc, :].reshape(F, nb * bc, Xv)
    last = body[:, nb - 1, bc : bc + 1, :]
    full = jnp.concatenate([owned, last], axis=1)       # rows [0, nb*bc]
    if seam_add and nb > 1:
        seams = body[:, : nb - 1, bc, :]                # -> rows bc, 2bc, ..
        idx = np.arange(1, nb) * bc
        full = full.at[:, idx, :].add(seams)
    pad = Yv - full.shape[1]
    if pad > 0:
        full = jnp.pad(full, ((0, 0), (0, pad), (0, 0)))
    return full[:, :Yv, :]


def _tab_arrays(grid: CrossedTriGrid):
    tab = grid.tab()
    Bq = np.asarray(tab.Bq)
    Gs = np.asarray(tab.Gs)
    WB = tab.wq[:, :, None] * tab.Bq
    WG = [tab.wq[:, :, None] * tab.Gs[:, None, :, d] for d in range(2)]
    return Bq, Gs, WB, WG, tab.nq


def _tangent_accumulate(terms, F, bc, nx, Bq, Gs, WB, WG, nq,
                        locs, locs0, locz, dt):
    """Hand-written tangent assembly: gather primal/tangent with the fixed
    tabulations, ``jax.jvp`` ONLY the pointwise physics, scatter with the
    weighted shifts. Returns [5][F] planes of [bc, nx]."""
    acc_loc = [[None] * F for _ in range(5)]
    for t in range(4):
        du_t = tuple((_combine([locs[s][f] for s in range(5)], Gs[t, :, 0]),
                      _combine([locs[s][f] for s in range(5)], Gs[t, :, 1]))
                     for f in range(F))
        du0_t = tuple(
            (_combine([locs0[s][f] for s in range(5)], Gs[t, :, 0]),
             _combine([locs0[s][f] for s in range(5)], Gs[t, :, 1]))
            for f in range(F))
        dz_t = tuple((_combine([locz[s][f] for s in range(5)], Gs[t, :, 0]),
                      _combine([locz[s][f] for s in range(5)], Gs[t, :, 1]))
                     for f in range(F))
        for q in range(nq):
            u_q = tuple(_combine([locs[s][f] for s in range(5)], Bq[t, q])
                        for f in range(F))
            u0_q = tuple(_combine([locs0[s][f] for s in range(5)], Bq[t, q])
                         for f in range(F))
            z_q = tuple(_combine([locz[s][f] for s in range(5)], Bq[t, q])
                        for f in range(F))

            def phys(u, du, u0_q=u0_q, du0_t=du0_t):
                ctx = QPContext(u=u, du=du, u0=u0_q, du0=du0_t, dt=dt)
                return terms(ctx)

            _, (tsrc, tflx) = jax.jvp(phys, (u_q, du_t), (z_q, dz_t))
            for s in range(5):
                wb = float(WB[t, q, s])
                wgx = float(WG[0][t, q, s])
                wgy = float(WG[1][t, q, s])
                if abs(wb) < _ZERO_TOL and abs(wgx) < _ZERO_TOL \
                        and abs(wgy) < _ZERO_TOL:
                    continue
                for f in range(F):
                    term = (wb * jnp.broadcast_to(tsrc[f], (bc, nx))
                            + wgx * jnp.broadcast_to(tflx[f][0], (bc, nx))
                            + wgy * jnp.broadcast_to(tflx[f][1], (bc, nx)))
                    acc_loc[s][f] = (term if acc_loc[s][f] is None
                                     else acc_loc[s][f] + term)
    return acc_loc


def _scatter_slab(acc_loc, av_ref, am_ref, F, bc, nx):
    """Write the [5][F] cell planes into the block's vertex/center output
    refs (read-modify-write slice updates; no value-level scatter)."""
    av_ref[:] = jnp.zeros_like(av_ref)
    am_ref[:] = jnp.zeros_like(am_ref)
    shifts = [(0, 0), (0, 1), (1, 1), (1, 0)]           # SW, SE, NE, NW
    for f in range(F):
        for s_i, (dy, dx) in enumerate(shifts):
            av_ref[f, dy : bc + dy, dx : nx + dx] = (
                av_ref[f, dy : bc + dy, dx : nx + dx] + acc_loc[s_i][f])
        am_ref[f, :bc, :nx] = acc_loc[4][f]


def make_grid_tiled_jvp(grid: CrossedTriGrid, terms, n_fields: int,
                        dtype=jnp.float32, block_rows: int | None = None,
                        interpret: bool = False):
    """Row-block-tiled J.v as ONE ``grid=(nb,)`` kernel. Same contract as
    ops/pallas_tiled.make_tiled_jvp: returns ``(prepare, jv)``."""
    from pfhubbenchmarks_tpu.ops.pallas_tiled import choose_block_rows

    F = n_fields
    ny, nx = grid.ny, grid.nx
    Yv, Xv = grid.vshape
    bc = block_rows or choose_block_rows(ny)
    assert bc is not None and ny % bc == 0, (ny, bc)
    nb = ny // bc
    va = _round8(bc + 1)
    ma = _round8(bc)       # center slab height (blocked dims need 8-align)
    Bq, Gs, WB, WG, nq = _tab_arrays(grid)

    def kernel(z_v, z_m, w_v, w_m, w0_v, w0_m, dt_ref, av_o, am_o):
        dt = dt_ref[0, 0]
        locs = _local_slots(w_v[:], w_m[:], bc, nx)
        locs0 = _local_slots(w0_v[:], w0_m[:], bc, nx)
        locz = _local_slots(z_v[:], z_m[:], bc, nx)
        acc = _tangent_accumulate(terms, F, bc, nx, Bq, Gs, WB, WG, nq,
                                  locs, locs0, locz, dt)
        _scatter_slab(acc, av_o, am_o, F, bc, nx)

    def vmap3(i):
        return (0, i, 0)

    spec_v = pl.BlockSpec((F, va, Xv), vmap3)
    spec_m = pl.BlockSpec((F, ma, nx), vmap3)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec_v, spec_m, spec_v, spec_m, spec_v, spec_m,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec_v, spec_m),
        out_shape=(jax.ShapeDtypeStruct((F, nb * va, Xv), dtype),
                   jax.ShapeDtypeStruct((F, nb * ma, nx), dtype)),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    def prepare(w, w0):
        return (_stage_v(w[0].astype(dtype), nb, bc, va),
                _stage_rows(w[1].astype(dtype), nb, bc, bc, ma),
                _stage_v(w0[0].astype(dtype), nb, bc, va),
                _stage_rows(w0[1].astype(dtype), nb, bc, bc, ma))

    Ym, Xm = grid.mshape

    def _fold_m(am):
        body = am.reshape(F, nb, ma, nx)[:, :, :bc, :].reshape(F, ny, nx)
        return jnp.pad(body, ((0, 0), (0, Ym - ny), (0, Xm - nx)))

    def jv(v, staged, dt):
        wv_s, wm_s, w0v_s, w0m_s = staged
        vv_s = _stage_v(v[0].astype(dtype), nb, bc, va)
        vm_s = _stage_rows(v[1].astype(dtype), nb, bc, bc, ma)
        dt_arr = jnp.asarray([[dt]], dtype)
        av, am = call(vv_s, vm_s, wv_s, wm_s, w0v_s, w0m_s, dt_arr)
        av = _fold_v(av, nb, bc, va, Yv, Xv, seam_add=True)
        return av, _fold_m(am)

    return prepare, jv


def make_grid_tiled_lmr_sweep(grid: CrossedTriGrid, terms, n_fields: int,
                              dtype=jnp.float32,
                              block_rows: int | None = None,
                              field_groups=None, alpha_groups=None,
                              interpret: bool = False):
    """Row-block-tiled LMR sweep as ONE ``grid=(nb,)`` kernel per sweep.
    Same contract as ops/pallas_tiled.make_tiled_lmr_sweep: returns
    ``(prepare, sweep)``; ``field_groups`` statically skips the
    exactly-zero cross-group pinv planes (SolverConfig.field_split)."""
    from pfhubbenchmarks_tpu.ops.pallas_tiled import choose_block_rows
    from pfhubbenchmarks_tpu.ops.pallas_vcycle import _group_of

    F = n_fields
    ny, nx = grid.ny, grid.nx
    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape
    bc = block_rows or choose_block_rows(ny)
    assert bc is not None and ny % bc == 0, (ny, bc)
    nb = ny // bc
    va = _round8(bc + 1)
    ma = _round8(bc)
    Bq, Gs, WB, WG, nq = _tab_arrays(grid)
    partners = _group_of(field_groups, F)

    def kernel(r_v, r_m, w_v, w_m, w0_v, w0_m, pv, pm, dt_ref,
               zv_o, zm_o, av_o, am_o):
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

        zv = bj(pv[:], r_v[:])             # [F, va, Xv]
        zm = bj(pm[:], r_m[:])             # [F, bc, nx]
        locs = _local_slots(w_v[:], w_m[:], bc, nx)
        locs0 = _local_slots(w0_v[:], w0_m[:], bc, nx)
        locz = _local_slots(zv, zm, bc, nx)
        acc = _tangent_accumulate(terms, F, bc, nx, Bq, Gs, WB, WG, nq,
                                  locs, locs0, locz, dt)
        zv_o[:] = zv
        zm_o[:] = zm
        _scatter_slab(acc, av_o, am_o, F, bc, nx)

    def vmap3(i):
        return (0, i, 0)

    def vmap4(i):
        return (0, 0, i, 0)

    spec_v = pl.BlockSpec((F, va, Xv), vmap3)
    spec_m = pl.BlockSpec((F, ma, nx), vmap3)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec_v, spec_m, spec_v, spec_m, spec_v, spec_m,
                  pl.BlockSpec((F, F, va, Xv), vmap4),
                  pl.BlockSpec((F, F, ma, nx), vmap4),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec_v, spec_m, spec_v, spec_m),
        out_shape=(jax.ShapeDtypeStruct((F, nb * va, Xv), dtype),
                   jax.ShapeDtypeStruct((F, nb * ma, nx), dtype),
                   jax.ShapeDtypeStruct((F, nb * va, Xv), dtype),
                   jax.ShapeDtypeStruct((F, nb * ma, nx), dtype)),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    def prepare(w, w0, pinv):
        pv, pm = pinv
        return (_stage_v(w[0].astype(dtype), nb, bc, va),
                _stage_rows(w[1].astype(dtype), nb, bc, bc, ma),
                _stage_v(w0[0].astype(dtype), nb, bc, va),
                _stage_rows(w0[1].astype(dtype), nb, bc, bc, ma),
                _stage_v(pv.astype(dtype), nb, bc, va),
                _stage_rows(pm.astype(dtype), nb, bc, bc, ma))

    def _fold_m(am):
        body = am.reshape(F, nb, ma, nx)[:, :, :bc, :].reshape(F, ny, nx)
        return jnp.pad(body, ((0, 0), (0, Ym - ny), (0, Xm - nx)))

    def _one(r, staged, dt):
        wv_s, wm_s, w0v_s, w0m_s, pv_s, pm_s = staged
        rv_s = _stage_v(r[0].astype(dtype), nb, bc, va)
        rm_s = _stage_rows(r[1].astype(dtype), nb, bc, bc, ma)
        dt_arr = jnp.asarray([[dt]], dtype)
        zv, zm, av, am = call(rv_s, rm_s, wv_s, wm_s, w0v_s, w0m_s,
                              pv_s, pm_s, dt_arr)
        z = (_fold_v(zv, nb, bc, va, Yv, Xv, seam_add=False), _fold_m(zm))
        az = (_fold_v(av, nb, bc, va, Yv, Xv, seam_add=True), _fold_m(am))
        return z, az

    def sweep(x, r, n, staged, dt):
        from jax import lax

        from pfhubbenchmarks_tpu.ops.pallas_vcycle import (_alpha_mul, _lmr_alpha)

        def body(carry, _):
            x, r = carry
            z, az = _one(r, staged, dt)
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
