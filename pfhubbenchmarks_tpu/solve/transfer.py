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


def _p1_weights(s: float, t: float, Rx: int, Ry: int = None):
    """(w00, w10, w01, w11, wc) of the coarse crossed-P1 basis at cell-local
    point (s, t) ∈ [0, Rx]×[0, Ry] (s along x, t along y; corners a00..a11,
    center c). In NORMALIZED coordinates ŝ=s/Rx, t̂=t/Ry the four-triangle
    region formulas are ratio-independent — which is what makes per-axis
    (semicoarsening) ratios free: on the S triangle the P1 function is
    a00(1-ŝ-t̂) + a10(ŝ-t̂) + 2c·t̂, and N/W/E by symmetry. The formulas
    agree on region boundaries (continuity), so ties are free.

    For Rx ≠ Ry the coarse crossed space is NOT nested in the fine one
    (coarse diagonals cross fine triangles); interpolation is still exact
    on coarse linears and a standard non-Galerkin MG prolongation.
    """
    if Ry is None:
        Ry = Rx
    sh, th = s / Rx, t / Ry
    ush, uth = 1.0 - sh, 1.0 - th
    if th <= sh and th <= ush:      # S
        return (1.0 - sh - th, sh - th, 0.0, 0.0, 2.0 * th)
    if th >= sh and th >= ush:      # N
        return (0.0, 0.0, 1.0 - sh - uth, sh - uth, 2.0 * uth)
    if sh <= th and sh <= uth:      # W
        return (1.0 - th - sh, 0.0, th - sh, 0.0, 2.0 * sh)
    return (0.0, 1.0 - th - ush, 0.0, th - ush, 2.0 * ush)  # E


def ratios(coarse: CrossedTriGrid, fine: CrossedTriGrid) -> tuple[int, int]:
    rx, ry = fine.nx // coarse.nx, fine.ny // coarse.ny
    assert fine.nx == rx * coarse.nx and fine.ny == ry * coarse.ny, (
        fine.nx, fine.ny, coarse.nx, coarse.ny)
    return rx, ry


def prolong_general(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """General-ratio P1 prolongation (exact interpolation, any integer
    per-axis ratios — equal ratios are exactly nested, unequal ratios are
    the semicoarsening prolongation for anisotropic hierarchies like
    elast's 250×10 beam)."""
    nyc, nxc = coarse.ny, coarse.nx
    Rx, Ry = ratios(coarse, fine)

    # host-precomputed weight tables per local offset class
    wv = np.array([[_p1_weights(px, py, Rx, Ry) for px in range(Rx)]
                   for py in range(Ry)])         # [Ry, Rx, 5] vertex classes
    wm = np.array([[_p1_weights(px + 0.5, py + 0.5, Rx, Ry)
                    for px in range(Rx)]
                   for py in range(Ry)])         # [Ry, Rx, 5] center classes

    # XLA-op-count discipline (the first strided-scatter version cost ~2 R²
    # ops per transfer — measurably slower V-cycles at 350²): batch all
    # Ry·Rx offset classes as ONE 5-term contraction + transpose/reshape,
    # then a single contiguous block write.
    wv_t = wv.reshape(Ry * Rx, 5)
    wm_t = wm.reshape(Ry * Rx, 5)

    def apply(wc):
        vc_p, mc_p = wc
        vc = vc_p[:, : nyc + 1, : nxc + 1]
        mc = mc_p[:, :nyc, :nxc]
        F = vc.shape[0]
        # operand slots [5, F, nyc, nxc]: corners a00,a10,a01,a11 + center
        S = jnp.stack([vc[:, :-1, :-1], vc[:, :-1, 1:],
                       vc[:, 1:, :-1], vc[:, 1:, 1:], mc])

        def classes(wt):
            """[Ry·Rx, 5] weights -> [F, Ry·nyc, Rx·nxc] interleaved block."""
            cls = jnp.tensordot(jnp.asarray(wt, vc.dtype), S, axes=1)
            cls = cls.reshape(Ry, Rx, F, nyc, nxc)
            cls = jnp.transpose(cls, (2, 3, 0, 4, 1))  # [F, nyc, Ry, nxc, Rx]
            return cls.reshape(F, Ry * nyc, Rx * nxc)

        Yf, Xf = fine.vshape
        vf = jnp.zeros((F, Yf, Xf), vc.dtype)
        vf = vf.at[:, : Ry * nyc, : Rx * nxc].set(classes(wv_t))
        # final fine-vertex row/col: 1D interpolation along coarse edges
        fracx = jnp.asarray(np.arange(Rx) / Rx, vc.dtype)
        fracy = jnp.asarray(np.arange(Ry) / Ry, vc.dtype)
        top = vc[:, nyc, :]
        row = ((1.0 - fracx)[None, None, :] * top[:, :-1, None]
               + fracx[None, None, :] * top[:, 1:, None]).reshape(F, Rx * nxc)
        vf = vf.at[:, Ry * nyc, : Rx * nxc].set(row)
        right = vc[:, :, nxc]
        col = ((1.0 - fracy)[None, None, :] * right[:, :-1, None]
               + fracy[None, None, :] * right[:, 1:, None]).reshape(F, Ry * nyc)
        vf = vf.at[:, : Ry * nyc, Rx * nxc].set(col)
        vf = vf.at[:, Ry * nyc, Rx * nxc].set(vc[:, nyc, nxc])

        Ym, Xm = fine.mshape
        mf = jnp.zeros((F, Ym, Xm), vc.dtype)
        mf = mf.at[:, : Ry * nyc, : Rx * nxc].set(classes(wm_t))
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
    """General-ratio state injection: evaluate the FINE P1 function at the
    coarse node positions. Coarse vertices are always fine vertices; the
    coarse center lands on a fine center (both ratios odd), a fine vertex
    (both even), or the midpoint of a fine edge (mixed parity — the P1
    function is linear along edges, so the value is the 2-point average)."""
    nyc, nxc = coarse.ny, coarse.nx
    Rx, Ry = ratios(coarse, fine)

    def apply(wf):
        vf_p, mf_p = wf
        vf = vf_p[:, : Ry * nyc + 1, : Rx * nxc + 1]
        vc = vf[:, ::Ry, ::Rx]
        oy, ox = (Ry - 1) // 2, (Rx - 1) // 2
        if Rx % 2 == 1 and Ry % 2 == 1:
            mf = mf_p[:, : Ry * nyc, : Rx * nxc]
            mc = mf[:, oy : Ry * nyc : Ry, ox : Rx * nxc : Rx]
        elif Rx % 2 == 0 and Ry % 2 == 0:
            mc = vf[:, Ry // 2 : Ry * nyc : Ry, Rx // 2 : Rx * nxc : Rx]
        elif Rx % 2 == 0:   # Ry odd: center column on a vertex line in x
            cx = vf[:, : Ry * nyc + 1, Rx // 2 : Rx * nxc : Rx]
            mc = 0.5 * (cx[:, oy : Ry * nyc : Ry, :]
                        + cx[:, oy + 1 : Ry * nyc + 1 : Ry, :])
        else:               # Ry even, Rx odd
            cy = vf[:, Ry // 2 : Ry * nyc : Ry, : Rx * nxc + 1]
            mc = 0.5 * (cy[:, :, ox : Rx * nxc : Rx]
                        + cy[:, :, ox + 1 : Rx * nxc + 1 : Rx])
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


def prolong_any(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    """Dispatch: periodic (ratio 2), hand-optimized strided (2, 2), or the
    general per-axis-ratio path."""
    if fine.periodic:
        return prolong_periodic(coarse, fine)
    return (prolong if ratios(coarse, fine) == (2, 2)
            else prolong_general)(coarse, fine)


def restrict_any(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    if fine.periodic:
        return restrict_periodic(coarse, fine)
    return (restrict if ratios(coarse, fine) == (2, 2)
            else restrict_general)(coarse, fine)


def inject_any(coarse: CrossedTriGrid, fine: CrossedTriGrid):
    if fine.periodic:
        return inject_state_periodic(coarse, fine)
    return (inject_state if ratios(coarse, fine) == (2, 2)
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
