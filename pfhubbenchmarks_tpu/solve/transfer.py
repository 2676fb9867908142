"""Grid-transfer operators for the nested crossed-triangle hierarchy.

A 2h crossed mesh is exactly refined by the h crossed mesh (every coarse
triangle is a union of fine ones), so coarse P1 is a subspace of fine P1 and
prolongation is pointwise interpolation at fine node positions:

- fine vertex (2i, 2j)     = coarse vertex (i, j)
- fine vertex (2i+1, 2j)   = edge midpoint: avg of coarse vertices
- fine vertex (2i+1, 2j+1) = coarse center (i, j)
- fine center of cell (2i+d, 2j+g) lies on the coarse diagonal between
  coarse vertex (i+d, j+g) and coarse center (i, j): their average.

Restriction is the exact transpose (Galerkin FEM residual transfer);
injection restricts *states* for coarse rediscretization. All ops are
strided slices — XLA/SPMD friendly, no gathers.

The nesting argument holds for ANY integer ratio R, not just 2: a coarse
cell's diagonals are slope-±1 lines through fine vertices, which within
each fine cell coincide with that cell's own diagonals, so every fine
triangle lies inside exactly one coarse triangle and coarse P1 ⊂ fine P1.
``prolong_general`` exploits this for odd ratios — the reason bench3's
350² grid (350 = 2·5²·7) can have a real multigrid hierarchy
(350 → 175 → 35 → 7) instead of stopping dead at the odd 175
(dolfin/bench3.py:21-23 fixes the discretization; the preconditioner
hierarchy is ours to choose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid


def prolong(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Returns P(w_c) -> w_f (correction interpolation)."""
    nyc, nxc = coarse.ny, coarse.nx
    assert fine.ny == 2 * nyc and fine.nx == 2 * nxc

    def apply(wc):
        vc_p, mc_p = wc
        vc = vc_p[:, : nyc + 1, : nxc + 1]
        mc = mc_p[:, :nyc, :nxc]
        F = vc.shape[0]
        Yf, Xf = fine.vshape
        vf = jnp.zeros((F, Yf, Xf), vc.dtype)
        vf = vf.at[:, 0 : 2 * nyc + 1 : 2, 0 : 2 * nxc + 1 : 2].set(vc)
        vf = vf.at[:, 0 : 2 * nyc + 1 : 2, 1 : 2 * nxc : 2].set(
            0.5 * (vc[:, :, :-1] + vc[:, :, 1:]))
        vf = vf.at[:, 1 : 2 * nyc : 2, 0 : 2 * nxc + 1 : 2].set(
            0.5 * (vc[:, :-1, :] + vc[:, 1:, :]))
        vf = vf.at[:, 1 : 2 * nyc : 2, 1 : 2 * nxc : 2].set(mc)
        Ym, Xm = fine.mshape
        mf = jnp.zeros((F, Ym, Xm), vc.dtype)
        mf = mf.at[:, 0 : 2 * nyc : 2, 0 : 2 * nxc : 2].set(
            0.5 * (vc[:, :-1, :-1] + mc))
        mf = mf.at[:, 0 : 2 * nyc : 2, 1 : 2 * nxc : 2].set(
            0.5 * (vc[:, :-1, 1:] + mc))
        mf = mf.at[:, 1 : 2 * nyc : 2, 0 : 2 * nxc : 2].set(
            0.5 * (vc[:, 1:, :-1] + mc))
        mf = mf.at[:, 1 : 2 * nyc : 2, 1 : 2 * nxc : 2].set(
            0.5 * (vc[:, 1:, 1:] + mc))
        return vf, mf

    return apply


def restrict(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Returns R(r_f) -> r_c, the exact transpose of ``prolong``."""
    nyc, nxc = coarse.ny, coarse.nx

    def apply(wf):
        vf_p, mf_p = wf
        vf = vf_p[:, : 2 * nyc + 1, : 2 * nxc + 1]
        mf = mf_p[:, : 2 * nyc, : 2 * nxc]
        vee = vf[:, 0::2, 0::2]           # [F, nyc+1, nxc+1]
        veo = vf[:, 0::2, 1::2]           # [F, nyc+1, nxc]
        voe = vf[:, 1::2, 0::2]           # [F, nyc, nxc+1]
        voo = vf[:, 1::2, 1::2]           # [F, nyc, nxc]
        m00 = mf[:, 0::2, 0::2]
        m01 = mf[:, 0::2, 1::2]
        m10 = mf[:, 1::2, 0::2]
        m11 = mf[:, 1::2, 1::2]

        vc = vee
        vc = vc.at[:, :, :-1].add(0.5 * veo)
        vc = vc.at[:, :, 1:].add(0.5 * veo)
        vc = vc.at[:, :-1, :].add(0.5 * voe)
        vc = vc.at[:, 1:, :].add(0.5 * voe)
        vc = vc.at[:, :-1, :-1].add(0.5 * m00)
        vc = vc.at[:, :-1, 1:].add(0.5 * m01)
        vc = vc.at[:, 1:, :-1].add(0.5 * m10)
        vc = vc.at[:, 1:, 1:].add(0.5 * m11)
        mc = voo + 0.5 * (m00 + m01 + m10 + m11)

        F = vc.shape[0]
        Yc, Xc = coarse.vshape
        vc_p = jnp.zeros((F, Yc, Xc), vc.dtype).at[:, : nyc + 1, : nxc + 1].set(vc)
        Ymc, Xmc = coarse.mshape
        mc_p = jnp.zeros((F, Ymc, Xmc), vc.dtype).at[:, :nyc, :nxc].set(mc)
        return vc_p, mc_p

    return apply


def _p1_weights(s: float, t: float, R: int):
    """(w00, w10, w01, w11, wc) of the coarse crossed-P1 basis at cell-local
    point (s, t) ∈ [0, R]² (s along x, t along y; corners a00..a11, center c).

    Region formulas: on the S triangle the P1 function is
    a00 + (a10-a00)·s/R + (2c-a00-a10)·t/R, and N/W/E by symmetry. The
    formulas agree on region boundaries (continuity), so ties are free.
    """
    sr, tr_, ur_s, ur_t = s / R, t / R, (R - s) / R, (R - t) / R
    if t <= s and t <= R - s:       # S
        return (1.0 - sr - tr_, sr - tr_, 0.0, 0.0, 2.0 * tr_)
    if t >= s and t >= R - s:       # N
        return (0.0, 0.0, 1.0 - sr - ur_t, sr - ur_t, 2.0 * ur_t)
    if s <= t and s <= R - t:       # W
        return (1.0 - tr_ - sr, 0.0, tr_ - sr, 0.0, 2.0 * sr)
    return (0.0, 1.0 - tr_ - ur_s, 0.0, tr_ - ur_s, 2.0 * ur_s)  # E


def prolong_general(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Ratio-R nested P1 prolongation (exact interpolation, any integer R).

    R² strided-set classes on [F, nyc, nxc] planes — used for the small
    coarse levels of non-dyadic hierarchies, so cost is negligible.
    """
    nyc, nxc = coarse.ny, coarse.nx
    R = fine.ny // nyc
    assert fine.ny == R * nyc and fine.nx == R * nxc, (fine.ny, fine.nx, R)

    # host-precomputed weight tables per local offset class
    wv = np.array([[_p1_weights(px, py, R) for px in range(R)]
                   for py in range(R)])          # [R, R, 5] vertex classes
    wm = np.array([[_p1_weights(px + 0.5, py + 0.5, R) for px in range(R)]
                   for py in range(R)])          # [R, R, 5] center classes

    # XLA-op-count discipline (the first strided-scatter version cost ~2 R²
    # ops per transfer — measurably slower V-cycles at 350²): batch all R²
    # offset classes as ONE 5-term contraction + transpose/reshape, then a
    # single contiguous block write. Weight tables reshape to [R², 5].
    wv_t = wv.reshape(R * R, 5)
    wm_t = wm.reshape(R * R, 5)

    def apply(wc):
        vc_p, mc_p = wc
        vc = vc_p[:, : nyc + 1, : nxc + 1]
        mc = mc_p[:, :nyc, :nxc]
        F = vc.shape[0]
        # operand slots [5, F, nyc, nxc]: corners a00,a10,a01,a11 + center
        S = jnp.stack([vc[:, :-1, :-1], vc[:, :-1, 1:],
                       vc[:, 1:, :-1], vc[:, 1:, 1:], mc])

        def classes(wt):
            """[R², 5] weights -> [F, R·nyc, R·nxc] interleaved block."""
            cls = jnp.tensordot(jnp.asarray(wt, vc.dtype), S, axes=1)
            cls = cls.reshape(R, R, F, nyc, nxc)
            cls = jnp.transpose(cls, (2, 3, 0, 4, 1))  # [F, nyc, R, nxc, R]
            return cls.reshape(F, R * nyc, R * nxc)

        Yf, Xf = fine.vshape
        vf = jnp.zeros((F, Yf, Xf), vc.dtype)
        vf = vf.at[:, : R * nyc, : R * nxc].set(classes(wv_t))
        # final fine-vertex row/col: 1D interpolation along coarse edges
        frac = jnp.asarray(np.arange(R) / R, vc.dtype)
        top = vc[:, nyc, :]
        row = ((1.0 - frac)[None, None, :] * top[:, :-1, None]
               + frac[None, None, :] * top[:, 1:, None]).reshape(F, R * nxc)
        vf = vf.at[:, R * nyc, : R * nxc].set(row)
        right = vc[:, :, nxc]
        col = ((1.0 - frac)[None, None, :] * right[:, :-1, None]
               + frac[None, None, :] * right[:, 1:, None]).reshape(F, R * nyc)
        vf = vf.at[:, : R * nyc, R * nxc].set(col)
        vf = vf.at[:, R * nyc, R * nxc].set(vc[:, nyc, nxc])

        Ym, Xm = fine.mshape
        mf = jnp.zeros((F, Ym, Xm), vc.dtype)
        mf = mf.at[:, : R * nyc, : R * nxc].set(classes(wm_t))
        return vf, mf

    return apply


def restrict_general(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Exact transpose of ``prolong_general`` via ``jax.linear_transpose``
    (Galerkin residual transfer — guaranteed adjoint-consistent)."""
    P = prolong_general(coarse, fine)
    Ycv, Xcv = coarse.vshape
    Ycm, Xcm = coarse.mshape

    def apply(rf):
        dtype = rf[0].dtype
        F = rf[0].shape[0]
        ex = (jax.ShapeDtypeStruct((F, Ycv, Xcv), dtype),
              jax.ShapeDtypeStruct((F, Ycm, Xcm), dtype))
        (out,) = jax.linear_transpose(P, ex)(rf)
        return out

    return apply


def inject_state_general(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Ratio-R state injection: coarse vertices are fine vertices at stride
    R; the coarse center sits on a fine center (odd R) or fine vertex
    (even R)."""
    nyc, nxc = coarse.ny, coarse.nx
    R = fine.ny // nyc
    assert fine.ny == R * nyc and fine.nx == R * nxc

    def apply(wf):
        vf_p, mf_p = wf
        vf = vf_p[:, : R * nyc + 1, : R * nxc + 1]
        vc = vf[:, ::R, ::R]
        if R % 2 == 0:
            off = R // 2
            mc = vf[:, off : R * nyc : R, off : R * nxc : R]
        else:
            off = (R - 1) // 2
            mf = mf_p[:, : R * nyc, : R * nxc]
            mc = mf[:, off : R * nyc : R, off : R * nxc : R]
        F = vc.shape[0]
        Yc, Xc = coarse.vshape
        vc_p = jnp.zeros((F, Yc, Xc), vc.dtype).at[:, : nyc + 1, : nxc + 1].set(vc)
        Ymc, Xmc = coarse.mshape
        mc_p = jnp.zeros((F, Ymc, Xmc), vc.dtype).at[:, :nyc, :nxc].set(mc)
        return vc_p, mc_p

    return apply


def prolong_periodic(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Ratio-2 nested P1 prolongation on periodic crossed grids.

    Same interpolation rules as ``prolong`` with wraparound neighbors
    (``jnp.roll`` — XLA SPMD lowers it to collective-permute halo exchange,
    so the periodic V-cycle shards like the open-boundary one). Periodic
    grids store vertex [ny, nx] (no duplicated right/top line)."""
    nyc, nxc = coarse.ny, coarse.nx
    assert coarse.periodic and fine.periodic
    assert fine.ny == 2 * nyc and fine.nx == 2 * nxc

    def apply(wc):
        vc, mc = wc
        F = vc.shape[0]
        vx = jnp.roll(vc, -1, axis=2)
        vy = jnp.roll(vc, -1, axis=1)
        vxy = jnp.roll(vc, -1, axis=(1, 2))

        def interleave(c00, c01, c10, c11):
            cls = jnp.stack([jnp.stack([c00, c01]), jnp.stack([c10, c11])])
            cls = jnp.transpose(cls, (2, 3, 0, 4, 1))  # [F, nyc, 2, nxc, 2]
            return cls.reshape(F, 2 * nyc, 2 * nxc)

        vf = interleave(vc, 0.5 * (vc + vx), 0.5 * (vc + vy), mc)
        mf = interleave(0.5 * (vc + mc), 0.5 * (vx + mc),
                        0.5 * (vy + mc), 0.5 * (vxy + mc))
        return vf, mf

    return apply


def restrict_periodic(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Exact transpose of ``prolong_periodic`` via ``jax.linear_transpose``."""
    P = prolong_periodic(coarse, fine)
    Ycv, Xcv = coarse.vshape
    Ycm, Xcm = coarse.mshape

    def apply(rf):
        dtype = rf[0].dtype
        F = rf[0].shape[0]
        ex = (jax.ShapeDtypeStruct((F, Ycv, Xcv), dtype),
              jax.ShapeDtypeStruct((F, Ycm, Xcm), dtype))
        (out,) = jax.linear_transpose(P, ex)(rf)
        return out

    return apply


def inject_state_periodic(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    def apply(wf):
        vf, _ = wf
        return vf[:, ::2, ::2], vf[:, 1::2, 1::2]

    return apply


def ratio(coarse: CrossedTriGrid, fine: CrossedTriGrid) -> int:
    r = fine.ny // coarse.ny
    assert (fine.ny == r * coarse.ny and fine.nx == r * coarse.nx
            and fine.nx // coarse.nx == r), (fine.ny, fine.nx, coarse.ny, coarse.nx)
    return r


def prolong_any(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Dispatch: periodic (ratio 2), hand-optimized strided R=2, or the
    general odd-ratio path."""
    if fine.periodic:
        return prolong_periodic(coarse, fine)
    return (prolong if ratio(coarse, fine) == 2
            else prolong_general)(coarse, fine)


def restrict_any(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    if fine.periodic:
        return restrict_periodic(coarse, fine)
    return (restrict if ratio(coarse, fine) == 2
            else restrict_general)(coarse, fine)


def inject_any(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    if fine.periodic:
        return inject_state_periodic(coarse, fine)
    return (inject_state if ratio(coarse, fine) == 2
            else inject_state_general)(coarse, fine)


def inject_state(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """State restriction by injection (coarse nodes are fine nodes exactly)."""
    nyc, nxc = coarse.ny, coarse.nx

    def apply(wf):
        vf_p, mf_p = wf
        vf = vf_p[:, : 2 * nyc + 1, : 2 * nxc + 1]
        vc = vf[:, 0::2, 0::2]
        mc = vf[:, 1::2, 1::2]
        F = vc.shape[0]
        Yc, Xc = coarse.vshape
        vc_p = jnp.zeros((F, Yc, Xc), vc.dtype).at[:, : nyc + 1, : nxc + 1].set(vc)
        Ymc, Xmc = coarse.mshape
        mc_p = jnp.zeros((F, Ymc, Xmc), vc.dtype).at[:, :nyc, :nxc].set(mc)
        return vc_p, mc_p

    return apply
