"""Grid-transfer operators as small dense matmuls.

Mathematically identical to the strided-slice transfers in
solve/transfer.py (exact P1 interpolation on the nested crossed hierarchy
and its transpose), but expressed as Y/X matrix products so they lower onto
the MXU — Mosaic cannot lower strided slicing (``x[:, 0::2, 0::2]``), which
blocked whole-V-cycle kernel fusion in round 1 (ROADMAP perf item 1).

Decomposition (vc: coarse vertex grid, mc: coarse center grid):

  prolong:  vf = (Pyv vc Pxv^T) * (1 - oddodd) + Ey mc Ex^T
            mf = 0.5 (Uy vc Ux^T + Vy mc Vx^T)
  restrict: vc = Pyv^T (vf * (1 - oddodd)) Pxv + 0.5 Uy^T mf Ux
            mc = Ey^T vf Ex + 0.5 Vy^T mf Vx
  inject:   vc = Iye vf Ixe^T ; mc = Ey^T vf Ex

where Pyv interleaves/averages (Pyv[2i,i]=1, Pyv[2i+1,i]=Pyv[2i+1,i+1]=1/2),
Ey selects odd rows (Ey[2i+1,i]=1), Uy maps fine center row 2i+d to coarse
vertex row i+d, Vy repeats coarse center rows, Iye selects even rows, and
``oddodd`` is the 0/1 mask of (odd, odd) fine vertex positions.

All matrices are built over the STORED (padded) shapes with zero rows/cols
in the padding, so they apply directly to padded state arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid


@dataclasses.dataclass(frozen=True)
class TransferMats:
    """Dense transfer matrices between one (coarse, fine) level pair."""

    Pyv: np.ndarray   # [Yf_v, Yc_v]
    Pxv: np.ndarray   # [Xf_v, Xc_v]
    Ey: np.ndarray    # [Yf_v, Yc_m]
    Ex: np.ndarray    # [Xf_v, Xc_m]
    Uy: np.ndarray    # [Yf_m, Yc_v]
    Ux: np.ndarray    # [Xf_m, Xc_v]
    Vy: np.ndarray    # [Yf_m, Yc_m]
    Vx: np.ndarray    # [Xf_m, Xc_m]
    Iye: np.ndarray   # [Yc_v, Yf_v] even-row selector (injection)
    Ixe: np.ndarray   # [Xc_v, Xf_v]
    oddodd: np.ndarray  # [Yf_v, Xf_v] 0/1 mask of (odd, odd) positions


def _interleave_avg(nf_log: int, nc_log: int, nf: int, nc: int) -> np.ndarray:
    """P[2i, i] = 1; P[2i+1, i] = P[2i+1, i+1] = 1/2 over the logical block."""
    P = np.zeros((nf, nc))
    for i in range(nc_log):
        if 2 * i < nf_log:
            P[2 * i, i] = 1.0
    for i in range(nc_log - 1):
        P[2 * i + 1, i] = 0.5
        P[2 * i + 1, i + 1] = 0.5
    return P


def _odd_select(nf_log: int, ncm_log: int, nf: int, ncm: int) -> np.ndarray:
    E = np.zeros((nf, ncm))
    for i in range(ncm_log):
        E[2 * i + 1, i] = 1.0
    return E


def _center_to_vertex(nfm_log: int, ncv_log: int, nfm: int, ncv: int) -> np.ndarray:
    """U[2i+d, i+d] = 1 (fine center row -> straddling coarse vertex row)."""
    U = np.zeros((nfm, ncv))
    for r in range(nfm_log):
        U[r, (r + 1) // 2] = 1.0
    return U


def _repeat2(nfm_log: int, ncm_log: int, nfm: int, ncm: int) -> np.ndarray:
    V = np.zeros((nfm, ncm))
    for r in range(nfm_log):
        V[r, r // 2] = 1.0
    return V


def _even_select(ncv_log: int, nfv_log: int, ncv: int, nfv: int) -> np.ndarray:
    I = np.zeros((ncv, nfv))
    for i in range(ncv_log):
        I[i, 2 * i] = 1.0
    return I


def build_transfer_mats(coarse: CrossedTriGrid, fine: CrossedTriGrid,
                        dtype=np.float32) -> TransferMats:
    nyc, nxc = coarse.ny, coarse.nx
    assert fine.ny == 2 * nyc and fine.nx == 2 * nxc
    Yfv, Xfv = fine.vshape
    Yfm, Xfm = fine.mshape
    Ycv, Xcv = coarse.vshape
    Ycm, Xcm = coarse.mshape

    oddodd = np.zeros((Yfv, Xfv))
    oddodd[1:2 * nyc:2, 1:2 * nxc:2] = 1.0

    mats = TransferMats(
        Pyv=_interleave_avg(2 * nyc + 1, nyc + 1, Yfv, Ycv),
        Pxv=_interleave_avg(2 * nxc + 1, nxc + 1, Xfv, Xcv),
        Ey=_odd_select(2 * nyc + 1, nyc, Yfv, Ycm),
        Ex=_odd_select(2 * nxc + 1, nxc, Xfv, Xcm),
        Uy=_center_to_vertex(2 * nyc, nyc + 1, Yfm, Ycv),
        Ux=_center_to_vertex(2 * nxc, nxc + 1, Xfm, Xcv),
        Vy=_repeat2(2 * nyc, nyc, Yfm, Ycm),
        Vx=_repeat2(2 * nxc, nxc, Xfm, Xcm),
        Iye=_even_select(nyc + 1, 2 * nyc + 1, Ycv, Yfv),
        Ixe=_even_select(nxc + 1, 2 * nxc + 1, Xcv, Xfv),
        oddodd=oddodd,
    )
    return TransferMats(**{k: np.asarray(v, dtype)
                           for k, v in dataclasses.asdict(mats).items()})


def _yx(Ay, x, AxT, precision):
    """Ay @ x @ AxT per field plane; x is [F, Y, X]."""
    import jax.numpy as jnp

    Ay = jnp.asarray(Ay, x.dtype)
    AxT = jnp.asarray(AxT, x.dtype)
    return jnp.stack([
        jnp.dot(jnp.dot(Ay, x[f], precision=precision,
                        preferred_element_type=x.dtype),
                AxT, precision=precision, preferred_element_type=x.dtype)
        for f in range(x.shape[0])])


def prolong_mm(m: TransferMats, wc, precision="highest"):
    """Matmul prolongation; drop-in for solve/transfer.prolong's apply."""
    vc, mc = wc
    vf = (_yx(m.Pyv, vc, m.Pxv.T, precision) * (1.0 - m.oddodd)
          + _yx(m.Ey, mc, m.Ex.T, precision))
    mf = 0.5 * (_yx(m.Uy, vc, m.Ux.T, precision)
                + _yx(m.Vy, mc, m.Vx.T, precision))
    return vf, mf


def restrict_mm(m: TransferMats, wf, precision="highest"):
    vf, mf = wf
    vmasked = vf * (1.0 - m.oddodd)
    vc = (_yx(m.Pyv.T, vmasked, m.Pxv, precision)
          + 0.5 * _yx(m.Uy.T, mf, m.Ux, precision))
    mc = (_yx(m.Ey.T, vf, m.Ex, precision)
          + 0.5 * _yx(m.Vy.T, mf, m.Vx, precision))
    return vc, mc


def inject_mm(m: TransferMats, wf, precision="highest"):
    vf, _ = wf
    vc = _yx(m.Iye, vf, m.Ixe.T, precision)
    mc = _yx(m.Ey.T, vf, m.Ex, precision)
    return vc, mc


# ---------------------------------------------------------------------------
# General equal-ratio transfers as sums of separable matmul pairs.
#
# The crossed-P1 prolongation at ratio R is NOT a single Y/X tensor product:
# the per-offset-class weights w_k[py, px] (solve/transfer._p1_weights) depend
# jointly on both cell-local coordinates (the four-triangle regions). But any
# [R, R] weight plane factors exactly through its SVD,
#     w_k = sum_r  u_r v_r^T            (rank <= R, typically 2-3),
# and each rank-1 term IS a separable (Ay, Bx) matmul pair — the same MXU
# form the fused V-cycle kernel uses for the dyadic transfers. The non-dyadic
# pairs only ever appear at COARSE levels (bench3: 175->35->7, bench2:
# 25->5), so the extra pairs cost nothing measurable.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GeneralTransferMats:
    """Separable-decomposition transfer operators for one equal-ratio
    (coarse, fine) level pair. Each entry of the pv/pm/mv/mm lists is an
    (Ay, Bx) pair contributing ``Ay @ plane @ Bx.T``; restriction is the
    exact transpose of the summed prolongation."""

    pv: list   # vf <- vc pairs [(Ay [Yfv,Ycv], Bx [Xfv,Xcv]), ...]
    pm: list   # vf <- mc pairs [(Ay [Yfv,Ycm], Bx [Xfv,Xcm]), ...]
    mv: list   # mf <- vc pairs
    mm: list   # mf <- mc pairs
    inj_v: tuple   # (Iy [Ycv,Yfv], Ix [Xcv,Xfv]): vc = Iy vf Ix^T
    inj_m: tuple   # (Jy [Ycm,Yfm], Jx [Xcm,Xfm]): mc = Jy mf Jx^T (R odd)


def _svd_pairs(W: np.ndarray, tol: float = 1e-12):
    """Exact rank decomposition W = sum_r u_r v_r^T (f64 SVD)."""
    U, s, Vt = np.linalg.svd(np.asarray(W, np.float64))
    pairs = []
    for r in range(len(s)):
        if s[r] <= tol * max(s[0], 1.0):
            break
        pairs.append((U[:, r] * s[r], Vt[r, :]))
    return pairs


def build_general_mats(coarse: CrossedTriGrid, fine: CrossedTriGrid,
                       dtype=np.float32) -> GeneralTransferMats:
    from pfhubbenchmarks_tpu.solve.transfer import _p1_weights, ratios

    nyc, nxc = coarse.ny, coarse.nx
    Rx, Ry = ratios(coarse, fine)
    assert Rx == Ry, "fused transfers support equal per-axis ratios only"
    R = Rx
    Yfv, Xfv = fine.vshape
    Yfm, Xfm = fine.mshape
    Ycv, Xcv = coarse.vshape
    Ycm, Xcm = coarse.mshape

    wv = np.array([[_p1_weights(px, py, R) for px in range(R)]
                   for py in range(R)])          # [R, R, 5]
    wm = np.array([[_p1_weights(px + 0.5, py + 0.5, R) for px in range(R)]
                   for py in range(R)])

    def expand_y(u, n_logical_rows, out_rows, in_cols, shift, stride=None):
        """Ay[R*i + py, i + shift] = u[py] over the logical block."""
        A = np.zeros((out_rows, in_cols))
        for i in range(n_logical_rows):
            for p in range(R):
                A[R * i + p, i + shift] = u[p]
        return A

    def corner_pairs(W, out_shape, ny_log, nx_log, sy, sx):
        out = []
        for u, v in _svd_pairs(W):
            Ay = expand_y(u, ny_log, out_shape[0], Ycv, sy)
            Bx = expand_y(v, nx_log, out_shape[1], Xcv, sx)
            out.append((Ay, Bx))
        return out

    def center_pairs(W, out_shape, ny_log, nx_log):
        out = []
        for u, v in _svd_pairs(W):
            Ay = expand_y(u, ny_log, out_shape[0], Ycm, 0)
            Bx = expand_y(v, nx_log, out_shape[1], Xcm, 0)
            out.append((Ay, Bx))
        return out

    # vf <- vc: four corner slots over the interior block + the 1D-interp
    # boundary row/col terms
    pv = []
    for k, (sy, sx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        pv += corner_pairs(wv[:, :, k], (Yfv, Xfv), nyc, nxc, sy, sx)

    def interp1d(nf_rows, nc_cols, n_log):
        """Standard 1D P1 interpolation: Q[R*j + p, j] = 1 - p/R,
        Q[R*j + p, j+1] = p/R, Q[R*n, n] = 1."""
        Q = np.zeros((nf_rows, nc_cols))
        for j in range(n_log):
            for p in range(R):
                Q[R * j + p, j] = 1.0 - p / R
                if p:
                    Q[R * j + p, j + 1] = p / R
        Q[R * n_log, n_log] = 1.0
        return Q

    Qx = interp1d(Xfv, Xcv, nxc)
    Qy = interp1d(Yfv, Ycv, nyc)
    lastrow_y = np.zeros((Yfv, Ycv)); lastrow_y[R * nyc, nyc] = 1.0
    lastcol_x = np.zeros((Xfv, Xcv)); lastcol_x[R * nxc, nxc] = 1.0
    Qy_nolast = Qy.copy(); Qy_nolast[R * nyc, :] = 0.0
    pv.append((lastrow_y, Qx))
    pv.append((Qy_nolast, lastcol_x))

    pm = center_pairs(wv[:, :, 4], (Yfv, Xfv), nyc, nxc)     # vf <- mc
    mv = []
    for k, (sy, sx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        mv += corner_pairs(wm[:, :, k], (Yfm, Xfm), nyc, nxc, sy, sx)
    mm = center_pairs(wm[:, :, 4], (Yfm, Xfm), nyc, nxc)     # mf <- mc

    # state injection: vc = vf[::R, ::R]; mc = mf[o::R, o::R] (R odd) or the
    # dyadic even-vertex rule (R == 2, handled by the dyadic path)
    Iy = np.zeros((Ycv, Yfv)); Ix = np.zeros((Xcv, Xfv))
    for i in range(nyc + 1):
        Iy[i, R * i] = 1.0
    for j in range(nxc + 1):
        Ix[j, R * j] = 1.0
    assert R % 2 == 1, "general injection path expects odd R (R=2 is dyadic)"
    o = (R - 1) // 2
    Jy = np.zeros((Ycm, Yfm)); Jx = np.zeros((Xcm, Xfm))
    for i in range(nyc):
        Jy[i, R * i + o] = 1.0
    for j in range(nxc):
        Jx[j, R * j + o] = 1.0

    cast = lambda lst: [(np.asarray(a, dtype), np.asarray(b, dtype))
                        for a, b in lst]
    return GeneralTransferMats(
        pv=cast(pv), pm=cast(pm), mv=cast(mv), mm=cast(mm),
        inj_v=(np.asarray(Iy, dtype), np.asarray(Ix, dtype)),
        inj_m=(np.asarray(Jy, dtype), np.asarray(Jx, dtype)))


def _sum_yx(pairs, x, precision="highest"):
    import jax.numpy as jnp

    acc = None
    for Ay, Bx in pairs:
        t = _yx(Ay, x, np.asarray(Bx).T, precision)
        acc = t if acc is None else acc + t
    return acc


def prolong_gen_mm(m: GeneralTransferMats, wc, precision="highest"):
    vc, mc = wc
    vf = _sum_yx(m.pv, vc, precision) + _sum_yx(m.pm, mc, precision)
    mf = _sum_yx(m.mv, vc, precision) + _sum_yx(m.mm, mc, precision)
    return vf, mf


def restrict_gen_mm(m: GeneralTransferMats, rf, precision="highest"):
    """Exact transpose of prolong_gen_mm."""
    vf, mf = rf
    vc = (_sum_yx([(a.T, b.T) for a, b in m.pv], vf, precision)
          + _sum_yx([(a.T, b.T) for a, b in m.mv], mf, precision))
    mc = (_sum_yx([(a.T, b.T) for a, b in m.pm], vf, precision)
          + _sum_yx([(a.T, b.T) for a, b in m.mm], mf, precision))
    return vc, mc


def inject_gen_mm(m: GeneralTransferMats, wf, precision="highest"):
    vf, mf = wf
    Iy, Ix = m.inj_v
    Jy, Jx = m.inj_m
    return (_yx(Iy, vf, np.asarray(Ix).T, precision),
            _yx(Jy, mf, np.asarray(Jx).T, precision))
