"""Pallas TPU kernels for the assembly hot path.

The XLA einsum assembly (fem/assembly.py) lowers to ~15-20 separate TPU
kernels per residual / J.v evaluation; inside the Krylov loop that op-count
overhead dominates for PFHub-sized grids (the whole state is ~100 KB — far
below VMEM). These kernels fuse one entire evaluation into a single
``pallas_call`` with every operand resident in VMEM: one kernel launch per
J.v instead of ~20.

Mosaic cannot lower multi-axis einsum contractions, so the tiny element
contractions (4 triangles x nq points x 3 nonzero basis entries) are
unrolled into scalar-coefficient fused multiply-adds over ``[F, ny, nx]``
planes — the tabulation scalars bake into the kernel as immediates, which is
exactly the shape of code the VPU wants. The pointwise ``terms`` physics is
traced *inside* the kernel, and J.v comes from tracing ``jax.jvp`` of the
assembly in-kernel — no hand-derived linearization.
"""

from __future__ import annotations

from functools import partial

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfhubbenchmarks_tpu.fem.assembly import QPContext
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid

_ZERO_TOL = 1e-300

# Mosaic's DEFAULT scoped-VMEM budget is 16 MB — but v5e has 128 MiB of
# physical VMEM, and CompilerParams(vmem_limit_bytes=...) raises the cap
# per kernel. Probed on TPU (r3, .scratch/vmem_probe2.log): the 6-field
# 100² and 2-field 350² whole-phase sweep kernels — far beyond the 16 MB
# stack — compile at a 110 MB limit and run in 0.03-0.04 ms (VMEM-resident
# VPU), vs ~0.5-1 ms for the multi-launch tiled path they replace.
# PFHUB_VMEM_MB overrides the cap for probes (bench3's split_chain kernel
# missed the 110 MB cap by 7.9 MB, chain_r25); fits_vmem scales with it.
VMEM_LIMIT_BYTES = int(os.environ.get("PFHUB_VMEM_MB", "110")) * 2**20


def _compiler_params(interpret: bool):
    return (None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES))


def _scalar_assembly(grid: CrossedTriGrid, terms, n_fields: int):
    """Residual with all element contractions unrolled to scalar FMAs."""
    tab = grid.tab()
    Bq = np.asarray(tab.Bq)          # [4, nq, 5]
    Gs = np.asarray(tab.Gs)          # [4, 5, 2]
    WB = tab.wq[:, :, None] * tab.Bq             # [4, nq, 5]
    WG = [tab.wq[:, :, None] * tab.Gs[:, None, :, d] for d in range(2)]
    nq = tab.nq
    ny, nx = grid.ny, grid.nx

    def local(w):
        v, m = w
        return [v[:, :ny, :nx], v[:, :ny, 1:nx + 1], v[:, 1:ny + 1, 1:nx + 1],
                v[:, 1:ny + 1, :nx], m[:, :ny, :nx]]

    def _combine(planes, coeffs):
        acc = None
        for p, c in zip(planes, coeffs):
            c = float(c)
            if abs(c) < _ZERO_TOL:
                continue
            acc = c * p if acc is None else acc + c * p
        return acc if acc is not None else 0.0 * planes[0]

    def residual(w, w0, dt):
        """Loop over (triangle, quad point): the physics is evaluated on
        [ny, nx] planes one point at a time, so live intermediates stay
        ~F x ny x nx regardless of nq — this is what lets 6-field and 350^2
        problems fit the 16 MB VMEM scoped stack."""
        locs = local(w)
        locs0 = local(w0)
        acc_loc = [[None] * n_fields for _ in range(5)]
        for t in range(4):
            du_t = tuple(
                (_combine([locs[s][f] for s in range(5)], Gs[t, :, 0]),
                 _combine([locs[s][f] for s in range(5)], Gs[t, :, 1]))
                for f in range(n_fields))
            du0_t = tuple(
                (_combine([locs0[s][f] for s in range(5)], Gs[t, :, 0]),
                 _combine([locs0[s][f] for s in range(5)], Gs[t, :, 1]))
                for f in range(n_fields))
            for q in range(nq):
                u_q = tuple(_combine([locs[s][f] for s in range(5)], Bq[t, q])
                            for f in range(n_fields))
                u0_q = tuple(_combine([locs0[s][f] for s in range(5)], Bq[t, q])
                             for f in range(n_fields))
                ctx = QPContext(u=u_q, du=du_t, u0=u0_q, du0=du0_t, dt=dt)
                source, flux = terms(ctx)
                for s in range(5):
                    wb = float(WB[t, q, s])
                    wgx = float(WG[0][t, q, s])
                    wgy = float(WG[1][t, q, s])
                    if abs(wb) < _ZERO_TOL and abs(wgx) < _ZERO_TOL \
                            and abs(wgy) < _ZERO_TOL:
                        continue
                    for f in range(n_fields):
                        term = (wb * jnp.broadcast_to(source[f], (ny, nx))
                                + wgx * jnp.broadcast_to(flux[f][0], (ny, nx))
                                + wgy * jnp.broadcast_to(flux[f][1], (ny, nx)))
                        if acc_loc[s][f] is None:
                            acc_loc[s][f] = term
                        else:
                            acc_loc[s][f] = acc_loc[s][f] + term
        return acc_loc  # [5][F] planes of [ny, nx]

    return residual


def _tiled_slab_bytes(grid: CrossedTriGrid, dtype_bytes: int = 4) -> int:
    """Bytes of ONE field slab under TPU (8, 128) tiling — small arrays pad
    heavily, and Mosaic's VMEM accounting is in tiled units."""
    y = -(-(grid.ny + 1) // 8) * 8
    x = -(-(grid.nx + 1) // 128) * 128
    return y * x * dtype_bytes


def fits_vmem(grid: CrossedTriGrid, n_fields: int, nq: int = 4,
              dtype_bytes: int = 4, budget: int = 100 * 2**20,
              kernel: str = "jvp") -> bool:
    """Feasibility guard for whole-array kernels vs the 16 MB scoped VMEM.

    Calibrated against Mosaic's measured stack usage (in TILED plane units
    T = one (8,128)-padded field slab); the nq-dependent parts scale with
    the quadrature point count (4 for the ffc3 residual rule, 1 for the
    'dunavant1' reduced preconditioner rule, config.SolverConfig.precond_rule):

      jvp kernel:   ~(25 + 15 nq) * F * T   (nq=4 -> 85 F T:
                    6F/100^2: 26.2 MB; 2F/100^2: 8.7 MB — both measured)
      sweep kernel: unrolled-chunk variant; measured OOMs don't fit a clean
                    model (3F/100^2: 17.6 MB, 6F/50^2: 26.6 MB,
                    6F/25^2: 22.4 MB); conservative: 2-field only
      sweep_loop:   single fori_loop body: ~(30 + 14 nq) F T + 6 F^2 T
                    (r3 calibration: see .scratch/vmem_calib results)
    """
    T = _tiled_slab_bytes(grid, dtype_bytes)
    if kernel == "vcycle":
        # whole-V-cycle kernel (ops/pallas_vcycle.py): smoothing sweeps run
        # under fori_loop (one traced body), so the stack is ~one sweep body
        # at the fine level + persistent level arrays; the lane-padded
        # coarser levels add ~60% of the fine footprint. Initial estimate,
        # tightened against measurement on TPU.
        return ((30 + 9 * nq) * n_fields + 15 * n_fields ** 2) * T * 1.3 < budget
    if kernel == "sweep":
        return n_fields <= 2 and (25 + 15 * nq) * n_fields * T < budget
    if kernel == "sweep_loop":
        need = (30 + 14 * nq) * n_fields * T + 6 * n_fields ** 2 * T
        return need < budget
    need = (25 + 15 * nq) * n_fields * T
    return need < budget


def _pallas_call(grid, n_fields, dtype, kernel, n_vmem_inputs, interpret):
    F = n_fields
    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
            jax.ShapeDtypeStruct((F, Ym, Xm), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem_inputs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )


def _scatter_refs(acc_loc, out_v, out_m, n_fields, ny, nx):
    """Accumulate per-slot planes into the padded output refs.

    Read-modify-write slice updates instead of pad+stack: Mosaic rejects the
    concat-of-shifted-pads pattern for >2 fields ("offset mismatch on
    non-concat dimension")."""
    out_v[:] = jnp.zeros_like(out_v)
    out_m[:] = jnp.zeros_like(out_m)
    shifts = [(0, 0), (0, 1), (1, 1), (1, 0)]  # SW, SE, NE, NW
    for f in range(n_fields):
        for s_i, (dy, dx) in enumerate(shifts):
            out_v[f, dy:ny + dy, dx:nx + dx] = (
                out_v[f, dy:ny + dy, dx:nx + dx] + acc_loc[s_i][f])
        out_m[f, :ny, :nx] = acc_loc[4][f]


def make_pallas_jvp(grid: CrossedTriGrid, terms, n_fields: int,
                    dtype=jnp.float32):
    """Fused J.v at linearization point (w, w0, dt): one pallas_call.

    Returns ``jv(w, w0, dt, v) -> (Jv_v, Jv_m)``. Dirichlet rows are the
    caller's concern (cheap row writes).
    """
    residual = _scalar_assembly(grid, terms, n_fields)

    ny, nx = grid.ny, grid.nx

    def kernel(w_v, w_m, w0_v, w0_m, v_v, v_m, dt_ref, out_v, out_m):
        dt = dt_ref[0, 0]
        w = (w_v[:], w_m[:])
        w0 = (w0_v[:], w0_m[:])
        v = (v_v[:], v_m[:])
        _, jv = jax.jvp(lambda u: residual(u, w0, dt), (w,), (v,))
        _scatter_refs(jv, out_v, out_m, n_fields, ny, nx)

    @partial(jax.jit, static_argnames=("interpret",))
    def jv_fn(w, w0, dt, v, interpret=False):
        dt_arr = jnp.asarray([[dt]], dtype)
        return _pallas_call(grid, n_fields, dtype, kernel, 6, interpret)(
            w[0], w[1], w0[0], w0[1], v[0], v[1], dt_arr)

    return jv_fn


def make_pallas_residual(grid: CrossedTriGrid, terms, n_fields: int,
                         dtype=jnp.float32):
    """Fused residual evaluation as a single pallas_call."""
    residual = _scalar_assembly(grid, terms, n_fields)

    ny, nx = grid.ny, grid.nx

    def kernel(w_v, w_m, w0_v, w0_m, dt_ref, out_v, out_m):
        dt = dt_ref[0, 0]
        r = residual((w_v[:], w_m[:]), (w0_v[:], w0_m[:]), dt)
        _scatter_refs(r, out_v, out_m, n_fields, ny, nx)

    @partial(jax.jit, static_argnames=("interpret",))
    def res_fn(w, w0, dt, interpret=False):
        dt_arr = jnp.asarray([[dt]], dtype)
        return _pallas_call(grid, n_fields, dtype, kernel, 4, interpret)(
            w[0], w[1], w0[0], w0[1], dt_arr)

    return res_fn


def make_pallas_lmr_sweep_loop(grid: CrossedTriGrid, terms, n_fields: int,
                               dtype=jnp.float32, n_sweeps: int = 1,
                               field_groups=None, alpha_groups=None):
    """Whole smoothing phase as ONE kernel with the sweeps under
    ``lax.fori_loop`` — a single traced J.v body regardless of sweep count
    (the unrolled-chunk variant ``make_pallas_lmr_sweep`` grows the Mosaic
    scoped-VMEM stack with every unrolled sweep, capping it at 2-field
    systems; the loop form is what lets 6-field coarse levels run their full
    24-sweep coarse solve in one launch instead of ~600 unfused XLA ops).

    Same contract as ``make_pallas_lmr_sweep``.
    """
    residual = _scalar_assembly(grid, terms, n_fields)
    ny, nx = grid.ny, grid.nx
    F = n_fields
    from pfhubbenchmarks_tpu.ops.pallas_vcycle import (_alpha_mul, _group_of, _lmr_alpha)

    partners = _group_of(field_groups, F)

    from jax import lax

    def kernel(x_v, x_m, r_v, r_m, w_v, w_m, w0_v, w0_m, pv, pm, dt_ref,
               ox_v, ox_m, or_v, or_m, az_v, az_m):
        dt = dt_ref[0, 0]
        w = (w_v[:], w_m[:])
        w0 = (w0_v[:], w0_m[:])

        def body(_, carry):
            xv, xm, rv, rm = carry
            z_v, z_m = [], []
            for i in range(F):
                av = am = None
                for j in range(F):
                    if j not in partners[i]:
                        continue  # cross-group P^-1 plane is exactly zero
                    tv = pv[i, j] * rv[j]
                    tm = pm[i, j] * rm[j]
                    av = tv if av is None else av + tv
                    am = tm if am is None else am + tm
                z_v.append(av)
                z_m.append(am)
            z = (jnp.stack(z_v), jnp.stack(z_m))
            _, az_planes = jax.jvp(lambda u: residual(u, w0, dt), (w,), (z,))
            _scatter_refs(az_planes, az_v, az_m, F, ny, nx)
            Az_v = az_v[:]
            Az_m = az_m[:]
            alpha = _lmr_alpha(Az_v, Az_m, rv, rm, alpha_groups)
            return (xv + _alpha_mul(alpha, z[0]), xm + _alpha_mul(alpha, z[1]),
                    rv - _alpha_mul(alpha, Az_v), rm - _alpha_mul(alpha, Az_m))

        xv, xm, rv, rm = lax.fori_loop(
            0, n_sweeps, body, (x_v[:], x_m[:], r_v[:], r_m[:]))
        ox_v[:] = xv
        ox_m[:] = xm
        or_v[:] = rv
        or_m[:] = rm

    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape

    @partial(jax.jit, static_argnames=("interpret",))
    def sweep(x, r, w, w0, dt, pinv_v, pinv_m, interpret=False):
        dt_arr = jnp.asarray([[dt]], dtype)
        ox_v, ox_m, or_v, or_m = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                jax.ShapeDtypeStruct((F, Ym, Xm), dtype),
                jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                jax.ShapeDtypeStruct((F, Ym, Xm), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(4)),
            scratch_shapes=[pltpu.VMEM((F, Yv, Xv), dtype),
                            pltpu.VMEM((F, Ym, Xm), dtype)],
            compiler_params=_compiler_params(interpret),
            interpret=interpret,
        )(x[0], x[1], r[0], r[1], w[0], w[1], w0[0], w0[1], pinv_v, pinv_m,
          dt_arr)
        return (ox_v, ox_m), (or_v, or_m)

    return sweep


def make_pallas_lmr_sweep(grid: CrossedTriGrid, terms, n_fields: int,
                          dtype=jnp.float32, n_sweeps: int = 1,
                          field_groups=None, alpha_groups=None):
    """Fully fused local-minimal-residual smoothing sweep.

    One pallas_call computes z = blockJacobi(r), Az = J z (linearized at
    (w, w0, dt)), the two step-length reductions, and the (x, r) updates —
    eliminating ~10 kernel-launch/reduction-latency boundaries per sweep,
    which dominate V-cycle cost on PFHub-sized grids.

    P_inv is passed as [F, F, Y, X] planes (node-wise block inverse, built
    once per Newton iteration by solve/precond.py); Dirichlet handling is
    baked into P_inv rows, but the J.v row replacement is NOT done here —
    gate usage on Dirichlet-free problems.

    Returns ``sweep(x, r, w, w0, dt, Pinv_v, Pinv_m) -> (x', r')``.
    """
    residual = _scalar_assembly(grid, terms, n_fields)
    ny, nx = grid.ny, grid.nx
    F = n_fields
    from pfhubbenchmarks_tpu.ops.pallas_vcycle import (_alpha_mul, _group_of, _lmr_alpha)

    partners = _group_of(field_groups, F)

    def kernel(x_v, x_m, r_v, r_m, w_v, w_m, w0_v, w0_m, pv, pm, dt_ref,
               ox_v, ox_m, or_v, or_m, az_v, az_m):
        dt = dt_ref[0, 0]
        w = (w_v[:], w_m[:])
        w0 = (w0_v[:], w0_m[:])
        xv, xm = x_v[:], x_m[:]
        rv, rm = r_v[:], r_m[:]
        for _ in range(n_sweeps):
            # z = P^-1 r, unrolled F x F plane FMAs (Mosaic can't do einsum)
            z_v = []
            z_m = []
            for i in range(F):
                av = None
                am = None
                for j in range(F):
                    if j not in partners[i]:
                        continue  # cross-group plane is exactly zero
                    tv = pv[i, j] * rv[j]
                    tm = pm[i, j] * rm[j]
                    av = tv if av is None else av + tv
                    am = tm if am is None else am + tm
                z_v.append(av)
                z_m.append(am)
            z = (jnp.stack(z_v), jnp.stack(z_m))
            _, az_planes = jax.jvp(lambda u: residual(u, w0, dt), (w,), (z,))
            # assemble Az via VMEM scratch refs (value-level .at[].add lowers
            # to an unsupported scatter-add; ref slice updates are fine)
            _scatter_refs(az_planes, az_v, az_m, F, ny, nx)
            Az_v = az_v[:]
            Az_m = az_m[:]
            alpha = _lmr_alpha(Az_v, Az_m, rv, rm, alpha_groups)
            xv = xv + _alpha_mul(alpha, z[0])
            xm = xm + _alpha_mul(alpha, z[1])
            rv = rv - _alpha_mul(alpha, Az_v)
            rm = rm - _alpha_mul(alpha, Az_m)
        ox_v[:] = xv
        ox_m[:] = xm
        or_v[:] = rv
        or_m[:] = rm

    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape

    @partial(jax.jit, static_argnames=("interpret",))
    def sweep(x, r, w, w0, dt, pinv_v, pinv_m, interpret=False):
        dt_arr = jnp.asarray([[dt]], dtype)
        ox_v, ox_m, or_v, or_m = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                jax.ShapeDtypeStruct((F, Ym, Xm), dtype),
                jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                jax.ShapeDtypeStruct((F, Ym, Xm), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(4)),
            scratch_shapes=[pltpu.VMEM((F, Yv, Xv), dtype),
                            pltpu.VMEM((F, Ym, Xm), dtype)],
            compiler_params=_compiler_params(interpret),
            interpret=interpret,
        )(x[0], x[1], r[0], r[1], w[0], w[1], w0[0], w0[1], pinv_v, pinv_m,
          dt_arr)
        return (ox_v, ox_m), (or_v, or_m)

    return sweep
