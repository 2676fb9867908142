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
"""

from __future__ import annotations

import jax.numpy as jnp

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
