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
