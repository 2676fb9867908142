"""Sharded fused LMR smoother: per-shard Pallas sweep + ppermute halos.

Closes the round-4 gap (benchmarks/base.py gate): under a >1-device mesh
the whole-array Pallas kernels are OFF, so a pod run fell back to the pure
XLA V-cycle and lost all kernel fusion. This module keeps the fused
smoother under SPMD: each shard runs ONE whole-slab ``pallas_call`` (the
known-good Mosaic shape of ops/pallas_tiled.py — no Pallas grid, no
in-kernel collectives) on its local block extended by a 1-deep halo pulled
with ``lax.ppermute`` (the ghostUpdate pattern of parallel/halo.py; PETSc
analog: dolfinx/pfbase/pde_problems.py:150-161 degrades gracefully under
partitioning — this is the TPU-native equivalent).

Per smoothing phase (n sweeps), inside one ``shard_map``:

1. pull sweep-invariant halos once: w, w0 (linearization state), pinv
   planes, and the logical-cell mask (edge shards receive ZEROS for the
   missing neighbor, which also zeroes the fake halo cells — no special
   casing);
2. per sweep: pull the residual halo (2-phase y-then-x exchange so corner
   data rides the second phase), run the per-shard kernel
   (z = P^-1 r pointwise, A z = in-kernel jvp of the block scalar-FMA
   assembly over owned+halo cells — halo cells are re-evaluated, ~1
   row/col of duplicated work per shard), ``lax.psum`` the <Az,r> and
   <Az,Az> partials over the mesh, then the two axpys locally.

Layout requirement (as parallel/halo.py): ``grid.vshape == grid.mshape``
divisible by the mesh — build grids with ``aligned_pad_to``. The LMR step
size is computed from GLOBAL reductions, so the sharded sweep is
numerically the single-device sweep modulo f32 reduction order
(tests/test_halo_smoother.py asserts equivalence on the virtual 8-device
CPU mesh in interpret mode).
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.ops.pallas_residual import (_compiler_params,
                                                     _scalar_assembly)


def _pull_prev_line(x, axis_name, n):
    """Every shard receives its -1 neighbor's LAST line (zeros at shard 0)."""
    if n == 1:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis_name, [(i, i + 1) for i in range(n - 1)])


def _pull_next_line(x, axis_name, n):
    """Every shard receives its +1 neighbor's FIRST line (zeros at last)."""
    if n == 1:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis_name, [(i, i - 1) for i in range(1, n)])


def _extend(a, my, mx, *, lo=1, hi=1):
    """[..., by, bx] local block -> [..., by+lo+hi, bx+lo+hi] with halos
    pulled from the y/x mesh neighbors. Rows first, then columns OF THE
    ROW-EXTENDED array, so corners arrive via the x neighbor's own pulled
    rows (the standard 2-phase exchange)."""
    if lo:
        top = _pull_prev_line(a[..., -lo:, :], "y", my)
        a = jnp.concatenate([top, a], axis=-2)
    if hi:
        bot = _pull_next_line(a[..., lo : lo + hi, :], "y", my)
        a = jnp.concatenate([a, bot], axis=-2)
    if lo:
        left = _pull_prev_line(a[..., :, -lo:], "x", mx)
        a = jnp.concatenate([left, a], axis=-1)
    if hi:
        right = _pull_next_line(a[..., :, lo : lo + hi], "x", mx)
        a = jnp.concatenate([a, right], axis=-1)
    return a


def make_sharded_lmr_sweep(grid: CrossedTriGrid, terms, n_fields: int,
                           mesh: Mesh, dtype=jnp.float32,
                           interpret: bool = False):
    """Returns ``sweep(x, r, w, w0, pinv, dt, n) -> (x, r)`` over GLOBAL
    (sharded or single-device) padded arrays; runs ``n`` LMR sweeps with the
    per-shard fused kernel. ``pinv = (pv, pm)`` as [F, F, Y, X] plane
    stacks (solve/precond.py)."""
    F = n_fields
    my = int(mesh.shape.get("y", 1))
    mx = int(mesh.shape.get("x", 1))
    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape
    assert (Yv, Xv) == (Ym, Xm), (
        "sharded fused smoother needs aligned vertex/center storage "
        f"(parallel.halo.aligned_pad_to); got vshape={grid.vshape} "
        f"mshape={grid.mshape}")
    assert Yv % my == 0 and Xv % mx == 0, (grid.vshape, dict(mesh.shape))
    by, bx = Yv // my, Xv // mx

    # per-shard evaluated cells: owned rows/cols plus the -1 halo row/col
    # (cell rows [a-1, a+by) for owned vertex rows [a, a+by) — the halo
    # cells are re-evaluated instead of push-reduced, same trade as
    # ops/pallas_tiled.py)
    blk = dataclasses.replace(grid, ny=by + 1, nx=bx + 1,
                              Ly=grid.hy * (by + 1), Lx=grid.hx * (bx + 1),
                              pad_to=(1, 1), periodic=False)
    resid_blk = _scalar_assembly(blk, terms, F)

    def kernel(rv, rm, wv, wm, w0v, w0m, pv, pm, mask, dt_ref,
               zv_o, zm_o, av_o, am_o, av_s, am_s):
        # rv/wv/w0v/pv: [(F,) F, by+2, bx+2] vertex slabs (halo lo=1, hi=1)
        # rm/wm/w0m/pm/mask: [..., by+1, bx+1] center slabs (halo lo=1)
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

        zv = bj(pv, rv[:])            # [F, by+2, bx+2]
        zm = bj(pm, rm[:])            # [F, by+1, bx+1]

        _, acc = jax.jvp(lambda u: resid_blk(u, (w0v[:], w0m[:]), dt),
                         ((wv[:], wm[:]),), ((zv, zm),))
        # acc: [5][F] planes of [by+1, bx+1]; mask zeroes non-logical cells
        # (padding AND the fake halo at domain edges — zero pulls)
        m = mask[:]
        av_s[:] = jnp.zeros_like(av_s)
        am_s[:] = jnp.zeros_like(am_s)
        shifts = [(0, 0), (0, 1), (1, 1), (1, 0)]   # SW, SE, NE, NW
        for f in range(F):
            for s_i, (dy, dx) in enumerate(shifts):
                av_s[f, dy : by + 1 + dy, dx : bx + 1 + dx] = (
                    av_s[f, dy : by + 1 + dy, dx : bx + 1 + dx]
                    + acc[s_i][f] * m)
            am_s[f, : by + 1, : bx + 1] = acc[4][f] * m
        # owned windows: slab row/col 1 = first owned line
        zv_o[:] = zv[:, 1 : by + 1, 1 : bx + 1]
        zm_o[:] = zm[:, 1 : by + 1, 1 : bx + 1]
        av_o[:] = av_s[:, 1 : by + 1, 1 : bx + 1]
        am_o[:] = am_s[:, 1 : by + 1, 1 : bx + 1]

    blk_call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((F, by, bx), dtype)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((F, by + 2, bx + 2), dtype),
                        pltpu.VMEM((F, by + 1, bx + 1), dtype)],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    # logical-cell mask on the center storage (1 inside [ny, nx), 0 in
    # padding); the halo extension pulls neighbor values, edge shards get 0
    cmask = np.zeros((Ym, Xm), np.float32)
    cmask[: grid.ny, : grid.nx] = 1.0
    cmask = jnp.asarray(cmask, dtype)

    spec_v = P(None, "y", "x")
    spec_p = P(None, None, "y", "x")
    spec_m = P("y", "x")

    def local_phase(n, xv, xm, rv, rm, wv, wm, w0v, w0m, pv, pm, mask, dt):
        # invariant halos: vertex operands lo=1/hi=1, center lo=1/hi=0
        wv_e = _extend(wv, my, mx)
        wm_e = _extend(wm, my, mx, hi=0)
        w0v_e = _extend(w0v, my, mx)
        w0m_e = _extend(w0m, my, mx, hi=0)
        pv_e = _extend(pv, my, mx)
        pm_e = _extend(pm, my, mx, hi=0)
        mask_e = _extend(mask, my, mx, hi=0)
        dt_arr = jnp.asarray([[dt]], dtype)

        def body(carry, _):
            x, r = carry
            rv_e = _extend(r[0], my, mx)
            rm_e = _extend(r[1], my, mx, hi=0)
            z_v, z_m, a_v, a_m = blk_call(rv_e, rm_e, wv_e, wm_e, w0v_e,
                                          w0m_e, pv_e, pm_e, mask_e, dt_arr)
            num = lax.psum(jnp.sum(a_v * r[0]) + jnp.sum(a_m * r[1]),
                           ("y", "x"))
            den = lax.psum(jnp.sum(a_v * a_v) + jnp.sum(a_m * a_m),
                           ("y", "x"))
            alpha = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                              0.0)
            x = (x[0] + alpha * z_v, x[1] + alpha * z_m)
            r = (r[0] - alpha * a_v, r[1] - alpha * a_m)
            return (x, r), None

        (x, r), _ = lax.scan(body, ((xv, xm), (rv, rm)), None, length=n)
        return x[0], x[1], r[0], r[1]

    _mapped_cache: dict = {}

    def _mapped(n: int):
        if n not in _mapped_cache:
            _mapped_cache[n] = jax.shard_map(
                partial(local_phase, n), mesh=mesh,
                in_specs=(spec_v, spec_v, spec_v, spec_v, spec_v, spec_v,
                          spec_v, spec_v, spec_p, spec_p, spec_m, P()),
                out_specs=(spec_v, spec_v, spec_v, spec_v),
                # pallas_call outputs carry no varying-across-mesh info
                check_vma=False)
        return _mapped_cache[n]

    def sweep(x, r, w, w0, pinv, dt, n: int):
        cast = lambda t: tuple(a.astype(dtype) for a in t)
        x, r, w, w0 = cast(x), cast(r), cast(w), cast(w0)
        pv, pm = (pinv[0].astype(dtype), pinv[1].astype(dtype))
        xv, xm, rv, rm = _mapped(n)(x[0], x[1], r[0], r[1], w[0], w[1],
                                    w0[0], w0[1], pv, pm, cmask,
                                    jnp.asarray(dt, dtype))
        return (xv, xm), (rv, rm)

    return sweep
