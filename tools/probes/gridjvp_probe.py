"""Bisect probe: what exactly SIGABRTs Mosaic about grid + in-kernel jvp?

Round-3 bisected the remote Mosaic compiler abort to "in-kernel jax.jvp of
the scalar-FMA assembly UNDER A GRID" (ROADMAP perf backlog item 2); the
round-4 VERDICT asks for the retire path — a hand-written tangent kernel.
Before building it, split the hypothesis: the assembly jvp differentiates
through the whole gather/FMA/scatter ladder, but mathematically only the
POINTWISE physics terms(ctx) needs jvp — the gather/interpolation/scatter
are linear and can be hand-written on the tangent operands directly.

Cases (each a row-block grid=(nb,) kernel at bench3-like sizes):
  a: grid + hand-gather + POINTWISE jax.jvp of terms     <- the new design
  b: grid + hand-gather + identity physics (no jvp)      <- control: grid ok
  c: grid + jax.jvp of the WHOLE assembly                <- known SIGABRT

Usage: python tools/probes/gridjvp_probe.py [a|b|c]
(one case per process: a SIGABRT kills the worker connection)
"""
import functools
import os
import sys

sys.path.insert(0, "/root/repo")
from pfhubbenchmarks_tpu.config import setup_compile_cache, enable_x64

setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfhubbenchmarks_tpu.benchmarks.bench3 import make as make_b3
from pfhubbenchmarks_tpu.fem.assembly import QPContext
from pfhubbenchmarks_tpu.ops.pallas_residual import (_scalar_assembly,
                                                     _compiler_params)

case = sys.argv[1] if len(sys.argv) > 1 else "a"
pb = make_b3()                     # 350x350, 2 fields
g = pb.grid
F = pb.n_fields
terms = pb.terms
tab = g.tab()
Bq = np.asarray(tab.Bq)
Gs = np.asarray(tab.Gs)
WB = tab.wq[:, :, None] * tab.Bq
WG = [tab.wq[:, :, None] * tab.Gs[:, None, :, d] for d in range(2)]
nq = tab.nq
ny, nx = g.ny, g.nx
BR = 50                            # block rows (350 = 7 x 50)
nb = ny // BR
Yv, Xv = g.vshape

dtype = jnp.float32


def _combine(planes, coeffs):
    acc = None
    for p, c in zip(planes, coeffs):
        c = float(c)
        if abs(c) < 1e-300:
            continue
        acc = c * p if acc is None else acc + c * p
    return acc if acc is not None else 0.0 * planes[0]


def local(v, m, rows):
    """5 slot planes for `rows` cell rows given v [F, rows+1, Xv], m."""
    return [v[:, :rows, :nx], v[:, :rows, 1:nx + 1],
            v[:, 1:rows + 1, 1:nx + 1], v[:, 1:rows + 1, :nx],
            m[:, :rows, :nx]]


def kernel(z_v, z_m, w_v, w_m, w0_v, w0_m, dt_ref, out_v, out_m):
    dt = dt_ref[0, 0]
    locs = local(w_v[:], w_m[:], BR)
    locs0 = local(w0_v[:], w0_m[:], BR)
    locz = local(z_v[:], z_m[:], BR)
    acc_loc = [[None] * F for _ in range(5)]
    for t in range(4):
        du_t = tuple((_combine([locs[s][f] for s in range(5)], Gs[t, :, 0]),
                      _combine([locs[s][f] for s in range(5)], Gs[t, :, 1]))
                     for f in range(F))
        du0_t = tuple((_combine([locs0[s][f] for s in range(5)], Gs[t, :, 0]),
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
            if case == "a":
                # POINTWISE jvp: physics only, no refs/assembly inside
                def phys(u, du):
                    ctx = QPContext(u=u, du=du, u0=u0_q, du0=du0_t, dt=dt)
                    return terms(ctx)

                _, (tsrc, tflx) = jax.jvp(phys, (u_q, du_t), (z_q, dz_t))
            else:
                # control: "tangent" = identity physics of z (linear mass)
                tsrc = z_q
                tflx = dz_t
            for s in range(5):
                wb = float(WB[t, q, s])
                wgx = float(WG[0][t, q, s])
                wgy = float(WG[1][t, q, s])
                if abs(wb) < 1e-300 and abs(wgx) < 1e-300 \
                        and abs(wgy) < 1e-300:
                    continue
                for f in range(F):
                    term = (wb * jnp.broadcast_to(tsrc[f], (BR, nx))
                            + wgx * jnp.broadcast_to(tflx[f][0], (BR, nx))
                            + wgy * jnp.broadcast_to(tflx[f][1], (BR, nx)))
                    acc_loc[s][f] = (term if acc_loc[s][f] is None
                                     else acc_loc[s][f] + term)
    out_v[:] = jnp.zeros_like(out_v)
    out_m[:] = jnp.zeros_like(out_m)
    shifts = [(0, 0), (0, 1), (1, 1), (1, 0)]
    for f in range(F):
        for s_i, (dy, dx) in enumerate(shifts):
            out_v[f, dy:BR + dy, dx:nx + dx] = (
                out_v[f, dy:BR + dy, dx:nx + dx] + acc_loc[s_i][f])
        out_m[f, :BR, :nx] = acc_loc[4][f]


def kernel_c(z_v, z_m, w_v, w_m, w0_v, w0_m, dt_ref, out_v, out_m):
    """Known-bad shape: jvp of the whole block assembly under the grid."""
    import dataclasses

    blk = dataclasses.replace(g, ny=BR)
    res_blk = _scalar_assembly(blk, terms, F)
    dt = dt_ref[0, 0]
    w_blk = (w_v[:], w_m[:])
    z_blk = (z_v[:], z_m[:])
    _, acc = jax.jvp(lambda u: res_blk(u, (w0_v[:], w0_m[:]), dt),
                     (w_blk,), (z_blk,))
    out_v[:] = jnp.zeros_like(out_v)
    out_m[:] = jnp.zeros_like(out_m)
    shifts = [(0, 0), (0, 1), (1, 1), (1, 0)]
    for f in range(F):
        for s_i, (dy, dx) in enumerate(shifts):
            out_v[f, dy:BR + dy, dx:nx + dx] = (
                out_v[f, dy:BR + dy, dx:nx + dx] + acc[s_i][f])
        out_m[f, :BR, :nx] = acc[4][f]


INTERP = bool(int(os.environ.get("PFHUB_INTERP", "0")))
kern = kernel_c if case == "c" else kernel
# block index map: block i covers cell rows [i*BR, (i+1)*BR), vertex rows
# [i*BR, i*BR+BR+1) — overlapping vertex slabs via (BR+8)-row blocks would
# need unaligned windows; ship full-height vertex arrays instead and slice
# a (BR+1)-row window per block via the index map (Mosaic wants multiples:
# use block shape BR+8 with element index map).
vb = BR + 8                        # 8-row-aligned vertex block height


def vmap_idx(i):
    return (0, i, 0)


call = pl.pallas_call(
    kern,
    grid=(nb,),
    out_shape=(jax.ShapeDtypeStruct((F, nb * vb, Xv), dtype),
               jax.ShapeDtypeStruct((F, ny, nx), dtype)),
    in_specs=[pl.BlockSpec((F, vb, Xv), vmap_idx),
              pl.BlockSpec((F, BR, nx), vmap_idx),
              pl.BlockSpec((F, vb, Xv), vmap_idx),
              pl.BlockSpec((F, BR, nx), vmap_idx),
              pl.BlockSpec((F, vb, Xv), vmap_idx),
              pl.BlockSpec((F, BR, nx), vmap_idx),
              pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=(pl.BlockSpec((F, vb, Xv), vmap_idx),
               pl.BlockSpec((F, BR, nx), vmap_idx)),
    compiler_params=_compiler_params(INTERP),
    interpret=INTERP,
)


def expand(v):
    """[F, Yv, Xv] -> per-block (BR+8)-row slabs stacked [F, nb*vb, Xv]."""
    slabs = [jnp.pad(v[:, i * BR: i * BR + BR + 1, :],
                     ((0, 0), (0, vb - BR - 1), (0, 0)))
             for i in range(nb)]
    return jnp.concatenate(slabs, axis=1)


w = tuple(a.astype(dtype) for a in pb.initial_state())
rng = np.random.default_rng(0)
z_v = jnp.asarray(rng.normal(size=(F,) + g.vshape), dtype)
z_m = jnp.asarray(rng.normal(size=(F,) + g.mshape), dtype)
dt_arr = jnp.asarray([[0.01]], dtype)

out = jax.jit(lambda *a: call(*a))(
    expand(z_v), z_m[:, :ny, :nx], expand(w[0]), w[1][:, :ny, :nx],
    expand(w[0]), w[1][:, :ny, :nx], dt_arr)
out[0].block_until_ready()
print(f"gridjvp[{case}]: COMPILED AND RAN, out_m norm="
      f"{float(jnp.linalg.norm(out[1])):.6g}")

if case == "a":
    # correctness: fold the per-block vertex slabs back and compare with the
    # XLA J.v at the same linearization
    from pfhubbenchmarks_tpu.fem.assembly import make_residual

    ov = np.zeros((F, Yv, Xv), np.float32)
    ob = np.asarray(out[0])
    for i in range(nb):
        ov[:, i * BR: i * BR + BR + 1, :] += ob[:, i * vb: i * vb + BR + 1, :]
    res32 = make_residual(g, terms, F, dtype=jnp.float32)
    _, az = jax.jvp(lambda u: res32(u, w, jnp.asarray(0.01, dtype)),
                    (w,), ((z_v, z_m),))
    err_v = np.abs(ov - np.asarray(az[0])).max()
    err_m = np.abs(np.asarray(out[1]) - np.asarray(az[1])[:, :ny, :nx]).max()
    scale = max(np.abs(np.asarray(az[0])).max(), 1.0)
    print(f"gridjvp[a] vs XLA J.v: err_v={err_v:.3e} err_m={err_m:.3e} "
          f"scale={scale:.3g}")
