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

import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.grid3d import TetGrid

_PARITIES = list(itertools.product((0, 1), repeat=3))  # (pz, py, px)


def _kuhn_weights(x: float, y: float, z: float) -> np.ndarray:
    """P1-on-Kuhn-tets interpolation weights at (x, y, z) ∈ [0,1]³ over the
    8 cube corners, indexed [dz, dy, dx].

    The Kuhn (Freudenthal) simplex containing p is fixed by the descending
    order of the coordinates; with sorted s1 ≥ s2 ≥ s3 the interpolant is
    (1-s1)·f(0) + (s1-s2)·f(e_a) + (s2-s3)·f(e_a+e_b) + s3·f(1,1,1) where
    a, b are the two largest axes. Exact on any Kuhn-P1 function — the
    ratio-R refinement of a Kuhn grid is again nested (coarse simplex
    boundary planes x_i = x_j and x_i = const pass through fine vertices
    along fine-cell planes)."""
    coords = np.array([x, y, z])
    order = np.argsort(-coords, kind="stable")
    s = coords[order]
    verts = [np.zeros(3, int)]
    acc = np.zeros(3, int)
    for k in range(3):
        acc = acc.copy()
        acc[order[k]] = 1
        verts.append(acc)
    wts = [1.0 - s[0], s[0] - s[1], s[1] - s[2], s[2]]
    W = np.zeros((2, 2, 2))
    for w, v in zip(wts, verts):
        W[v[2], v[1], v[0]] += w
    return W


def prolong3d_general(coarse: TetGrid, fine: TetGrid):
    """Ratio-R nested Kuhn-P1 prolongation (any integer R) — the machinery
    that extends bench1_3d's hierarchy past the odd 25³ (50³ → 25³ → 5³)."""
    nzc, nyc, nxc = coarse.nz, coarse.ny, coarse.nx
    R = fine.nz // nzc
    assert (fine.nz, fine.ny, fine.nx) == (R * nzc, R * nyc, R * nxc)

    # [R³, 8] interior class weights (corner order dz, dy, dx flattened)
    wtab = np.array([
        _kuhn_weights(px / R, py / R, pz / R).reshape(8)
        for pz in range(R) for py in range(R) for px in range(R)])

    def apply(wc):
        (vc_p,) = wc
        vc = vc_p[:, : nzc + 1, : nyc + 1, : nxc + 1]
        F = vc.shape[0]
        corners = jnp.stack([
            vc[:, dz : nzc + dz, dy : nyc + dy, dx : nxc + dx]
            for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)])
        cls = jnp.tensordot(jnp.asarray(wtab, vc.dtype), corners, axes=1)
        cls = cls.reshape(R, R, R, F, nzc, nyc, nxc)
        cls = jnp.transpose(cls, (3, 4, 0, 5, 1, 6, 2))
        body = cls.reshape(F, R * nzc, R * nyc, R * nxc)

        Zf, Yf, Xf = fine.vshape
        vf = jnp.zeros((F, Zf, Yf, Xf), vc.dtype)
        vf = vf.at[:, : R * nzc, : R * nyc, : R * nxc].set(body)

        # boundary planes: the general formula restricted to a face is the
        # 2D sorted interpolation on that face's corners; build each final
        # plane by prolonging the (R-class) 2D problem, final edges by 1D
        # interpolation, the far corner exactly.
        frac = np.arange(R) / R

        def face(plane, axes_shape):
            """plane [F, n1+1, n2+1] -> [F, R n1, R n2] interior classes."""
            n1, n2 = axes_shape
            w2 = np.array([
                _kuhn_weights2(p2 / R, p1 / R).reshape(4)
                for p1 in range(R) for p2 in range(R)])
            c = jnp.stack([plane[:, d1 : n1 + d1, d2 : n2 + d2]
                           for d1 in (0, 1) for d2 in (0, 1)])
            cl = jnp.tensordot(jnp.asarray(w2, plane.dtype), c, axes=1)
            cl = cl.reshape(R, R, F, n1, n2)
            cl = jnp.transpose(cl, (2, 3, 0, 4, 1))
            return cl.reshape(F, R * n1, R * n2)

        # z = R·nzc plane (top): interp on (y, x)
        vf = vf.at[:, R * nzc, : R * nyc, : R * nxc].set(
            face(vc[:, nzc], (nyc, nxc)))
        # y = R·nyc plane: interp on (z, x)
        vf = vf.at[:, : R * nzc, R * nyc, : R * nxc].set(
            face(vc[:, :, nyc], (nzc, nxc)))
        # x = R·nxc plane: interp on (z, y)
        vf = vf.at[:, : R * nzc, : R * nyc, R * nxc].set(
            face(vc[:, :, :, nxc], (nzc, nyc)))

        def edge(line, n):
            """[F, n+1] -> [F, R n] by 1D linear interpolation."""
            f = jnp.asarray(frac, line.dtype)
            out = ((1.0 - f)[None, None, :] * line[:, :-1, None]
                   + f[None, None, :] * line[:, 1:, None])
            return out.reshape(line.shape[0], R * n)

        vf = vf.at[:, R * nzc, R * nyc, : R * nxc].set(
            edge(vc[:, nzc, nyc, :], nxc))
        vf = vf.at[:, R * nzc, : R * nyc, R * nxc].set(
            edge(vc[:, nzc, :, nxc], nyc))
        vf = vf.at[:, : R * nzc, R * nyc, R * nxc].set(
            edge(vc[:, :, nyc, nxc], nzc))
        vf = vf.at[:, R * nzc, R * nyc, R * nxc].set(vc[:, nzc, nyc, nxc])
        return (vf,)

    return apply


def _kuhn_weights2(x: float, y: float) -> np.ndarray:
    """2D restriction of the Kuhn interpolation (a face of the cube): the
    square is cut by the diagonal (0,0)-(1,1); sorted interpolation over
    corners [d1, d2]."""
    s1, s2 = (x, y) if x >= y else (y, x)
    verts = ([(0, 1), (1, 1)] if x >= y else [(1, 0), (1, 1)])
    W = np.zeros((2, 2))
    W[0, 0] += 1.0 - s1
    W[verts[0][0], verts[0][1]] += s1 - s2
    W[1, 1] += s2
    return W


def restrict3d_general(coarse: TetGrid, fine: TetGrid):
    """Exact transpose of ``prolong3d_general`` via jax.linear_transpose."""
    P = prolong3d_general(coarse, fine)
    Zc, Yc, Xc = coarse.vshape

    def apply(rf):
        dtype = rf[0].dtype
        F = rf[0].shape[0]
        ex = (jax.ShapeDtypeStruct((F, Zc, Yc, Xc), dtype),)
        (out,) = jax.linear_transpose(P, ex)(rf)
        return out

    return apply


def inject_state3d_general(coarse: TetGrid, fine: TetGrid):
    nzc, nyc, nxc = coarse.nz, coarse.ny, coarse.nx
    R = fine.nz // nzc

    def apply(wf):
        (vf_p,) = wf
        vc = vf_p[:, : R * nzc + 1 : R, : R * nyc + 1 : R, : R * nxc + 1 : R]
        F = vc.shape[0]
        Zc, Yc, Xc = coarse.vshape
        out = jnp.zeros((F, Zc, Yc, Xc), vc.dtype)
        out = out.at[:, : nzc + 1, : nyc + 1, : nxc + 1].set(vc)
        return (out,)

    return apply


def prolong3d_any(coarse: TetGrid, fine: TetGrid):
    return (prolong3d if fine.nz == 2 * coarse.nz
            else prolong3d_general)(coarse, fine)


def restrict3d_any(coarse: TetGrid, fine: TetGrid):
    return (restrict3d if fine.nz == 2 * coarse.nz
            else restrict3d_general)(coarse, fine)


def inject3d_any(coarse: TetGrid, fine: TetGrid):
    return (inject_state3d if fine.nz == 2 * coarse.nz
            else inject_state3d_general)(coarse, fine)


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
