"""3D grid transfers for the nested Kuhn-tet hierarchy.

Freudenthal/Kuhn triangulations are self-refining: uniform refinement of the
Kuhn 6-tet split is the Kuhn split of the refined grid, so coarse P1 is a
subspace of fine P1. Prolongation is evaluation at fine nodes; every fine
node lies on a coarse vertex, a coarse edge, a coarse face diagonal, or the
coarse cell's main diagonal — in all cases the average of exactly two coarse
nodes (or the node itself):

- parity (0,0,0): coarse node
- one odd axis: midpoint of the coarse edge along that axis
- two odd axes: midpoint of the Kuhn face diagonal (lo corner -> hi corner
  in both odd axes — the diagonal aligned with the cell's main diagonal)
- (1,1,1): midpoint of the main diagonal

Restriction is the exact transpose; injection restricts states.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp

from pfhubbenchmarks_tpu.fem.grid3d import TetGrid

_PARITIES = list(itertools.product((0, 1), repeat=3))  # (pz, py, px)


def prolong3d(coarse: TetGrid, fine: TetGrid):
    nzc, nyc, nxc = coarse.nz, coarse.ny, coarse.nx

    def apply(wc):
        (vc_p,) = wc
        vc = vc_p[:, : nzc + 1, : nyc + 1, : nxc + 1]
        F = vc.shape[0]
        Zf, Yf, Xf = fine.vshape
        vf = jnp.zeros((F, Zf, Yf, Xf), vc.dtype)
        for pz, py, px in _PARITIES:
            lo = vc[:, : nzc + 1 - pz, : nyc + 1 - py, : nxc + 1 - px]
            hi = vc[:, pz : nzc + 1, py : nyc + 1, px : nxc + 1]
            val = lo if (pz | py | px) == 0 else 0.5 * (lo + hi)
            vf = vf.at[
                :,
                pz : 2 * nzc + 1 : 2,
                py : 2 * nyc + 1 : 2,
                px : 2 * nxc + 1 : 2,
            ].set(val)
        return (vf,)

    return apply


def restrict3d(coarse: TetGrid, fine: TetGrid):
    nzc, nyc, nxc = coarse.nz, coarse.ny, coarse.nx

    def apply(wf):
        (vf_p,) = wf
        vf = vf_p[:, : 2 * nzc + 1, : 2 * nyc + 1, : 2 * nxc + 1]
        vc = vf[:, 0::2, 0::2, 0::2]
        for pz, py, px in _PARITIES:
            if (pz | py | px) == 0:
                continue
            sub = vf[:, pz::2, py::2, px::2]  # [F, nzc+1-pz, ...]
            vc = vc.at[:, : nzc + 1 - pz, : nyc + 1 - py, : nxc + 1 - px].add(0.5 * sub)
            vc = vc.at[:, pz : nzc + 1, py : nyc + 1, px : nxc + 1].add(0.5 * sub)
        F = vc.shape[0]
        Zc, Yc, Xc = coarse.vshape
        out = jnp.zeros((F, Zc, Yc, Xc), vc.dtype)
        out = out.at[:, : nzc + 1, : nyc + 1, : nxc + 1].set(vc)
        return (out,)

    return apply


def inject_state3d(coarse: TetGrid, fine: TetGrid):
    nzc, nyc, nxc = coarse.nz, coarse.ny, coarse.nx

    def apply(wf):
        (vf_p,) = wf
        vc = vf_p[:, : 2 * nzc + 1 : 2, : 2 * nyc + 1 : 2, : 2 * nxc + 1 : 2]
        F = vc.shape[0]
        Zc, Yc, Xc = coarse.vshape
        out = jnp.zeros((F, Zc, Yc, Xc), vc.dtype)
        out = out.at[:, : nzc + 1, : nyc + 1, : nxc + 1].set(vc)
        return (out,)

    return apply
