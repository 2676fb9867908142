"""Whole-V-cycle multigrid preconditioner as ONE Pallas kernel.

Round-1 profiling (ROADMAP perf item 1) showed per-FGMRES-iteration cost on
PFHub-sized grids is op-count/launch-latency bound: the partially-fused
V-cycle was ~21 device ops (smoothing kernels + XLA transfer/reduction ops)
at ~35-40 us apparent latency each. This kernel collapses the ENTIRE V-cycle
— every level's LMR smoothing, residual re-evaluation, grid transfers, and
the coarse solve — into a single ``pallas_call``:

- grid transfers run in-kernel as small dense MXU matmuls
  (ops/transfer_mats.py) — Mosaic rejects the strided slicing the XLA
  transfers use, which is what blocked this fusion in round 1;
- coarse-level linearization states are kernel INPUTS (one (w, w0) pair per
  level), computed ONCE per preconditioner build by solve/gmg.py's
  ``inject_any`` — which the build already does to assemble the per-level
  block-Jacobi inverses. Round 4 measured the previous design (in-kernel
  matmul re-injection of the fine state on EVERY apply) at ~2(L-1) transfer
  chains ≈ 50 small matmuls per application — pure serial depth paid per
  Krylov iteration for state that is constant across the whole solve;
- smoothing sweeps run under ``lax.fori_loop`` so each level contributes ONE
  traced J.v body regardless of sweep count (the round-1 multi-sweep kernels
  unrolled sweeps and hit Mosaic's scoped-VMEM stack at >6 sweeps);
- the J.v at each level is ``jax.jvp`` of the scalar-FMA assembly
  (ops/pallas_residual._scalar_assembly) traced in-kernel.

Applicable to 2D problems whose finest level passes ``fits_vmem``
(bench1's 100^2 2-field CH being the headline case, dolfin/bench1.py).
Dirichlet boundary rows (bench6's electrostatic potential,
dolfin/bench6.py:77-90) are handled elementwise via host-precomputed 0/1
edge masks — see ``_bc_masks``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.ops.pallas_residual import (
    VMEM_LIMIT_BYTES,
    _scalar_assembly,
    _scatter_refs,
)
from pfhubbenchmarks_tpu.ops.transfer_mats import (
    GeneralTransferMats, TransferMats, build_general_mats,
    build_transfer_mats)

# Transfer matrices are kernel INPUTS (Mosaic rejects captured array
# constants). Pre-transposed forms are shipped so the kernel never
# transposes. Order must match _mat_list.
N_MATS = 19


def _mat_list(m: TransferMats) -> list[np.ndarray]:
    return [m.Pyv, m.Pxv.T, m.Ey, m.Ex.T, m.Uy, m.Ux.T, m.Vy, m.Vx.T,
            m.Pyv.T, m.Pxv, m.Uy.T, m.Ux, m.Ey.T, m.Ex, m.Vy.T, m.Vx,
            m.Iye, m.Ixe.T, m.oddodd]


def _gen_mat_list(m: GeneralTransferMats) -> tuple[list[np.ndarray], tuple]:
    """Flatten a GeneralTransferMats into kernel inputs: per separable pair
    ship (Ay, Bx^T, Ay^T, Bx) so prolongation AND its transpose (Galerkin
    restriction) run without in-kernel transposes; then the two injection
    selector pairs."""
    arrs = []
    counts = (len(m.pv), len(m.pm), len(m.mv), len(m.mm))
    for pairs in (m.pv, m.pm, m.mv, m.mm):
        for Ay, Bx in pairs:
            arrs += [Ay, Bx.T, Ay.T, Bx]
    Iy, Ix = m.inj_v
    Jy, Jx = m.inj_m
    arrs += [Iy, Ix.T, Jy, Jx.T]
    return arrs, counts


def transfers_fusable(grids: list[CrossedTriGrid]) -> bool:
    """True when every (fine, coarse) pair has an in-kernel transfer form:
    dyadic, or an equal odd per-axis ratio (general SVD pairs)."""
    for l in range(len(grids) - 1):
        f, c = grids[l], grids[l + 1]
        if f.ny == 2 * c.ny and f.nx == 2 * c.nx:
            continue
        ry, rx = f.ny // c.ny, f.nx // c.nx
        if (ry == rx and ry * c.ny == f.ny and rx * c.nx == f.nx
                and ry % 2 == 1):
            continue
        return False
    return True


class _GenLevelMats:
    """Loaded general-ratio transfer operands for one level pair."""

    def __init__(self, vals, counts):
        n_pv, n_pm, n_mv, n_mm = counts
        it = iter(vals)
        take = lambda: (next(it), next(it), next(it), next(it))
        self.pv = [take() for _ in range(n_pv)]
        self.pm = [take() for _ in range(n_pm)]
        self.mv = [take() for _ in range(n_mv)]
        self.mm = [take() for _ in range(n_mm)]
        self.Iy, self.IxT, self.Jy, self.JxT = (next(it), next(it),
                                                next(it), next(it))

    @staticmethod
    def _fwd(pairs, x):
        acc = None
        for Ay, BxT, _, _ in pairs:
            t = _yx(Ay, x, BxT)
            acc = t if acc is None else acc + t
        return acc

    @staticmethod
    def _adj(pairs, x):
        acc = None
        for _, _, AyT, Bx in pairs:
            t = _yx(AyT, x, Bx)
            acc = t if acc is None else acc + t
        return acc

    def prolong(self, wc):
        vc, mc = wc
        return (self._fwd(self.pv, vc) + self._fwd(self.pm, mc),
                self._fwd(self.mv, vc) + self._fwd(self.mm, mc))

    def restrict(self, wf):
        vf, mf = wf
        return (self._adj(self.pv, vf) + self._adj(self.mv, mf),
                self._adj(self.pm, vf) + self._adj(self.mm, mf))

    def inject(self, wf):
        vf, mf = wf
        return _yx(self.Iy, vf, self.IxT), _yx(self.Jy, mf, self.JxT)


def _yx(Ay, x, AxT):
    """Ay @ x @ AxT per field plane (MXU, full f32)."""
    hi = jax.lax.Precision.HIGHEST
    return jnp.stack([
        jnp.dot(jnp.dot(Ay, x[f], precision=hi, preferred_element_type=x.dtype),
                AxT, precision=hi, preferred_element_type=x.dtype)
        for f in range(x.shape[0])])


class _LevelMats:
    """Loaded transfer operands for one (fine l, coarse l+1) pair."""

    def __init__(self, vals):
        (self.Pyv, self.PxvT, self.Ey, self.ExT, self.Uy, self.UxT,
         self.Vy, self.VxT, self.PyvT, self.Pxv, self.UyT, self.Ux,
         self.EyT, self.Ex, self.VyT, self.Vx, self.Iye, self.IxeT,
         self.oddodd) = vals

    def prolong(self, wc):
        vc, mc = wc
        vf = (_yx(self.Pyv, vc, self.PxvT) * (1.0 - self.oddodd)
              + _yx(self.Ey, mc, self.ExT))
        mf = 0.5 * (_yx(self.Uy, vc, self.UxT) + _yx(self.Vy, mc, self.VxT))
        return vf, mf

    def restrict(self, wf):
        vf, mf = wf
        vc = (_yx(self.PyvT, vf * (1.0 - self.oddodd), self.Pxv)
              + 0.5 * _yx(self.UyT, mf, self.Ux))
        mc = _yx(self.EyT, vf, self.Ex) + 0.5 * _yx(self.VyT, mf, self.Vx)
        return vc, mc

    def inject(self, wf):
        vf, _ = wf
        return _yx(self.Iye, vf, self.IxeT), _yx(self.EyT, vf, self.Ex)


def _bc_masks(grids, level_bcs, n_fields):
    """Per-level 0/1 masks of Dirichlet vertex rows (host numpy).

    Mosaic rejects in-kernel row slicing on the lane axis, so BC handling is
    expressed elementwise: J.v rows become ``az*(1-m) + z*m`` (the tangent
    of a constraint row ``u - g`` is the identity) and transfer outputs are
    zeroed on BC rows (``*(1-m)``) — the in-kernel mirror of
    solve/gmg.py's zero_bc_rows / post-kernel row replacement."""
    masks = []
    for g, bcs in zip(grids, level_bcs):
        Yv, Xv = g.vshape
        m = np.zeros((n_fields, Yv, Xv), np.float32)
        for bc in bcs:
            if bc.side in ("left", "right"):
                m[bc.field, : g.ny + 1, bc.index] = 1.0
            else:
                m[bc.field, bc.index, : g.nx + 1] = 1.0
        masks.append(m)
    return masks


def make_fused_vcycle(grids: list[CrossedTriGrid], terms, n_fields: int, *,
                      nu_pre: int = 2, nu_post: int = 2,
                      nu_fine_pre: int = 0, nu_fine_post: int = 0,
                      coarse_sweeps: int = 24, dtype=jnp.float32,
                      with_matvec: bool = False, matvec_grid=None,
                      matvec_terms=None, field_groups=None, alpha_groups=None,
                      level_bcs=None, cycle: str = "v", inner_mr: int = 1,
                      interpret: bool = False):
    """Returns ``vcycle(r, w_levels, w0_levels, dt, pinvs) -> z`` (one
    kernel launch).

    ``r`` is the fine-level RHS ``(v, m)``; ``w_levels``/``w0_levels`` are
    PER-LEVEL linearization states (length ``len(grids)`` lists of ``(v, m)``
    pairs, the ``inject_any`` ladder solve/gmg.py already computes to build
    ``pinvs``); ``pinvs`` is a list of per-level node-block inverses
    ``(pv [F,F,Yv,Xv], pm [F,F,Ym,Xm])`` from solve/precond.py (built per
    Newton iteration — they depend on the Jacobian diagonal, which is
    assembled with AD outside the kernel).

    ``with_matvec=True`` additionally returns ``A z`` (the fine-level J.v of
    the preconditioned vector, same linearization): FGMRES always follows
    ``z = M^-1 v`` with ``w = A z``, so merging them saves one kernel launch
    and an HBM round-trip of ``z`` per Krylov iteration.

    ``matvec_grid`` (default ``grids[0]``): the grid whose quadrature rule
    assembles the EXPORTED ``A z``. Under ``SolverConfig.precond_rule`` the
    hierarchy ``grids`` is a reduced-rule rediscretization — fine for the
    V-cycle's internal smoothing/residuals, but the exported matvec must be
    the TRUE outer operator or FGMRES's Arnoldi relation breaks (observed:
    bench2 dt_min stall). Passing the full-rule fine grid here keeps the
    one-kernel-per-iteration pair valid under precond_rule.
    """
    L = len(grids)
    F = n_fields
    residuals = [_scalar_assembly(g, terms, n_fields) for g in grids]
    # the exported A z must be the TRUE outer operator: a separate assembly
    # whenever the matvec grid (precond_rule) OR terms (field_split's
    # stop_gradient'ed terms_precond) differ from the hierarchy's
    mv_terms = matvec_terms if matvec_terms is not None else terms
    residual_mv = (residuals[0]
                   if matvec_grid is None and mv_terms is terms
                   else _scalar_assembly(matvec_grid or grids[0], mv_terms,
                                         n_fields))
    has_bcs = level_bcs is not None and any(level_bcs)
    bc_masks = _bc_masks(grids, level_bcs, F) if has_bcs else None
    mat_arrays = []
    mat_schema = []          # per pair: ("dyadic", N_MATS) | ("general", counts, n)
    for l in range(L - 1):
        f, c = grids[l], grids[l + 1]
        if f.ny == 2 * c.ny and f.nx == 2 * c.nx:
            mat_arrays += _mat_list(
                build_transfer_mats(c, f, dtype=np.float32))
            mat_schema.append(("dyadic", N_MATS))
        else:
            arrs, counts = _gen_mat_list(build_general_mats(
                c, f, dtype=np.float32))
            mat_arrays += arrs
            mat_schema.append(("general", counts, len(arrs)))
    shapes = [(g.vshape, g.mshape, g.ny, g.nx) for g in grids]

    n_out = 4 if with_matvec else 2

    def kernel(*refs):
        # refs: r_v, r_m, [w_v_l, w_m_l]*L, [w0_v_l, w0_m_l]*L,
        #       [pv_l, pm_l]*L, [19 transfer mats]*(L-1),
        #       [bc mask_l]*L (when BCs), dt,
        #       out_v, out_m, (mv_v, mv_m when with_matvec),
        #       [az_v_l, az_m_l]*L scratch
        r_v, r_m = refs[:2]
        w_l = [(refs[2 + 2 * l][:], refs[3 + 2 * l][:]) for l in range(L)]
        w0_l = [(refs[2 + 2 * L + 2 * l][:], refs[3 + 2 * L + 2 * l][:])
                for l in range(L)]
        pinv = [(refs[2 + 4 * L + 2 * l], refs[3 + 4 * L + 2 * l])
                for l in range(L)]
        base = 2 + 6 * L
        mats = []
        for spec in mat_schema:
            if spec[0] == "dyadic":
                mats.append(_LevelMats([refs[base + i][:]
                                        for i in range(N_MATS)]))
                base += N_MATS
            else:
                _, counts, n = spec
                mats.append(_GenLevelMats([refs[base + i][:]
                                           for i in range(n)], counts))
                base += n
        if has_bcs:
            keep = [1.0 - refs[base + l][:] for l in range(L)]   # (1 - mask)
            base += L
        dt_ref = refs[base]
        out_v, out_m = refs[base + 1], refs[base + 2]
        mv_out = (refs[base + 3], refs[base + 4]) if with_matvec else None
        az = [(refs[base + 1 + n_out + 2 * l], refs[base + 2 + n_out + 2 * l])
              for l in range(L)]
        dt = dt_ref[0, 0]

        def Az(l, z):
            _, ny, nx = shapes[l][1], shapes[l][2], shapes[l][3]
            _, planes = jax.jvp(
                lambda u: residuals[l](u, w0_l[l], dt), (w_l[l],), (z,))
            _scatter_refs(planes, az[l][0], az[l][1], F, shapes[l][2],
                          shapes[l][3])
            av, am = az[l][0][:], az[l][1][:]
            if has_bcs:
                # BC rows of J.v are the identity (tangent of ``u - g``)
                av = av * keep[l] + z[0] * (1.0 - keep[l])
            return av, am

        def bj(l, r):
            return _bj_apply(pinv[l], r, F, groups=field_groups)

        def sweeps(l, x, r, n):
            """n LMR sweeps at level l; ONE traced body via fori_loop."""

            def body(_, carry):
                x, r = carry
                z = bj(l, r)
                Av, Am = Az(l, z)
                alpha = _lmr_alpha(Av, Am, r[0], r[1], alpha_groups)
                x = (x[0] + _alpha_mul(alpha, z[0]),
                     x[1] + _alpha_mul(alpha, z[1]))
                r = (r[0] - _alpha_mul(alpha, Av),
                     r[1] - _alpha_mul(alpha, Am))
                return x, r

            return lax.fori_loop(0, n, body, (x, r))

        def zeros(l):
            (Yv, Xv), (Ym, Xm) = shapes[l][0], shapes[l][1]
            return (jnp.zeros((F, Yv, Xv), dtype), jnp.zeros((F, Ym, Xm), dtype))

        # cycle="w": gamma=2 recursion — each level takes TWO coarse
        # corrections (with a residual recompute between), the textbook
        # W-cycle. The extra visits land on the cheap coarse levels, so the
        # in-kernel cost grows far less than the two-grid convergence
        # factor improves on stiff large-dt systems.
        gamma = 2 if cycle == "w" else 1

        def vcycle(l, b):
            if l == L - 1:
                x, _ = sweeps(l, zeros(l), b, coarse_sweeps)
                return x
            x, r = sweeps(l, zeros(l), b,
                          (nu_fine_pre or nu_pre) if l == 0 else nu_pre)
            for g_it in range(gamma):
                bc = mats[l].restrict(r)
                if has_bcs:
                    # constraint rows carry u - g, not PDE residual: don't
                    # smear interior residual into them, and coarse
                    # corrections must vanish there (gmg zero_bc_rows)
                    bc = (bc[0] * keep[l + 1], bc[1])
                xc = vcycle(l + 1, bc)
                pf = mats[l].prolong(xc)
                if has_bcs:
                    pf = (pf[0] * keep[l], pf[1])
                x = (x[0] + pf[0], x[1] + pf[1])
                Av, Am = Az(l, x)
                r = (b[0] - Av, b[1] - Am)
            x, _ = sweeps(l, x, r,
                          (nu_fine_post or nu_post) if l == 0 else nu_post)
            return x

        if inner_mr <= 1:
            z = vcycle(0, (r_v[:], r_m[:]))
        else:
            # GCR(s) acceleration (SolverConfig.gmg_inner_mr): s V-cycle-
            # preconditioned GCR steps share THIS launch — mathematically
            # GMRES(s) with the V-cycle as preconditioner, so the outer
            # FGMRES needs ~s-fold fewer iterations while launch overhead
            # amortizes over the s cycles. (The greedy unorthogonalized MR
            # variant measured only -17% outer iterations at s=2 on bench1.)
            # The j-loop is python-unrolled: each A z_j direction must be
            # orthogonalized against the j-1 prior ones, which are kept as
            # SSA values (the az scratch ref is reused; reads snapshot it).
            # Residual updates use the level-0 (precond-rule) operator; the
            # exported pair below stays the TRUE-rule J.v of z.
            rc = (r_v[:], r_m[:])
            zav = zam = None
            basis = []
            for _ in range(inner_mr):
                zz = vcycle(0, rc)
                Av, Am = Az(0, zz)
                for ziv, zim, aziv, azim in basis:
                    h = jnp.sum(aziv * Av) + jnp.sum(azim * Am)
                    Av, Am = Av - h * aziv, Am - h * azim
                    zz = (zz[0] - h * ziv, zz[1] - h * zim)
                nrm = jnp.sqrt(jnp.sum(Av * Av) + jnp.sum(Am * Am))
                inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0),
                                0.0)
                zz = (zz[0] * inv, zz[1] * inv)
                Av, Am = Av * inv, Am * inv
                basis.append((zz[0], zz[1], Av, Am))
                alpha = jnp.sum(Av * rc[0]) + jnp.sum(Am * rc[1])
                zav = alpha * zz[0] if zav is None else zav + alpha * zz[0]
                zam = alpha * zz[1] if zam is None else zam + alpha * zz[1]
                rc = (rc[0] - alpha * Av, rc[1] - alpha * Am)
            z = (zav, zam)
        out_v[:] = z[0]
        out_m[:] = z[1]
        if with_matvec:
            # exported pair: TRUE-rule fine-level J.v (see matvec_grid note)
            _, planes = jax.jvp(
                lambda u: residual_mv(u, w0_l[0], dt), (w_l[0],), (z,))
            _scatter_refs(planes, az[0][0], az[0][1], F, shapes[0][2],
                          shapes[0][3])
            av = az[0][0][:]
            if has_bcs:
                av = av * keep[0] + z[0] * (1.0 - keep[0])
            mv_out[0][:] = av
            mv_out[1][:] = az[0][1][:]

    (Yv, Xv), (Ym, Xm) = shapes[0][0], shapes[0][1]
    scratch = []
    for (yv, xv), (ym, xm), _, _ in shapes:
        scratch += [pltpu.VMEM((F, yv, xv), dtype),
                    pltpu.VMEM((F, ym, xm), dtype)]
    n_vmem_in = 2 + 6 * L + len(mat_arrays) + (L if has_bcs else 0)
    mat_consts = [jnp.asarray(a, dtype) for a in mat_arrays]
    if has_bcs:
        mat_consts += [jnp.asarray(m, dtype) for m in bc_masks]

    out_shape = [jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                 jax.ShapeDtypeStruct((F, Ym, Xm), dtype)]
    if with_matvec:
        out_shape = out_shape * 2
    call = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem_in
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shape),
        scratch_shapes=scratch,
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES)),
        interpret=interpret,
    )

    def apply(r, w_levels, w0_levels, dt, pinvs):
        dt_arr = jnp.asarray([[dt]], dtype)
        flat_w = [a for wl in w_levels for a in wl]
        flat_w0 = [a for wl in w0_levels for a in wl]
        flat_p = [a for pv_pm in pinvs for a in pv_pm]
        out = call(r[0], r[1], *flat_w, *flat_w0, *flat_p,
                   *mat_consts, dt_arr)
        if with_matvec:
            return (out[0], out[1]), (out[2], out[3])
        return out

    return apply


# ---------------------------------------------------------------------------
# Split-V-cycle fusion: when the FINE level exceeds the whole-kernel VMEM
# envelope but a hierarchy TAIL fits (bench3: 350² fine, [175², 35², 7²]
# tail), the V-cycle still runs as THREE kernel launches instead of two
# sweep kernels + ~40 strided-slice XLA transfer ops:
#
#   descend:  nu_pre LMR sweeps at the fine level + Galerkin restriction
#   tail:     make_fused_vcycle over grids[1:]  (existing sub-cycle kernel)
#   ascend:   prolongation + correction + fine residual update + nu_post
#             sweeps (+ optionally the TRUE-rule outer matvec A z)
#
# Measured motivation (r3 bench3 attribution, .scratch/prof_r4j.log): the
# XLA strided transfers alone cost 1.50 + 1.91 ms of the 4.23 ms V-cycle —
# pure op-launch latency — while each fused kernel is 0.4-0.8 ms.
# ---------------------------------------------------------------------------


def _build_pair_mats(fine: CrossedTriGrid, coarse: CrossedTriGrid):
    """Kernel-input transfer matrices for ONE (fine, coarse) pair, plus a
    loader that reconstructs the matching _LevelMats/_GenLevelMats view."""
    if fine.ny == 2 * coarse.ny and fine.nx == 2 * coarse.nx:
        arrs = _mat_list(build_transfer_mats(coarse, fine, dtype=np.float32))
        load = lambda refs: _LevelMats([r[:] for r in refs])
        return arrs, load
    arrs, counts = _gen_mat_list(build_general_mats(coarse, fine,
                                                    dtype=np.float32))
    load = lambda refs: _GenLevelMats([r[:] for r in refs], counts)
    return arrs, load


def _compiler_params(interpret: bool):
    """Mosaic params for the fused kernels: the 110 MB scoped-VMEM cap is
    what lets whole-array kernels reach bench2's 6-field and bench3's 350²
    grids (measured safe on v5e; the default 16 MB rejects them)."""
    return (None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES))


def _group_of(field_groups, F):
    """field index -> frozenset of in-group partners (None = dense F x F)."""
    if field_groups is None:
        return [frozenset(range(F))] * F
    out = [None] * F
    for g in field_groups:
        for i in g:
            out[i] = frozenset(g)
    assert all(s is not None for s in out), \
        f"field_groups {field_groups} must cover all {F} fields"
    return out


def _lmr_alpha(Av, Am, rv, rm, groups):
    """LMR step size: the global scalar argmin of ||r - a Az||, or — with
    ``groups`` (SolverConfig.field_split_alphas) — the PER-GROUP minimizers
    as a per-field scalar LIST. The split operator's Az planes are
    group-disjoint (field f's tangent depends only on in-group fields and
    lives in field f's planes), so the multi-alpha line search decouples
    EXACTLY into per-group scalars — the PETSc fieldsplit separate-block
    semantics, strictly better smoothing per sweep at the cost of G
    reductions instead of 1. Returned as a LIST (not an [F, 1, 1] stack):
    Mosaic cannot lower the vector<F> -> vector<Fx1x1> reshape; apply with
    ``_alpha_mul``."""
    if groups is None:
        num = jnp.sum(Av * rv) + jnp.sum(Am * rm)
        den = jnp.sum(Av * Av) + jnp.sum(Am * Am)
        return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    F = Av.shape[0]
    af = [None] * F
    for g in groups:
        num = den = None
        for f in g:
            n_f = jnp.sum(Av[f] * rv[f]) + jnp.sum(Am[f] * rm[f])
            d_f = jnp.sum(Av[f] * Av[f]) + jnp.sum(Am[f] * Am[f])
            num = n_f if num is None else num + n_f
            den = d_f if den is None else den + d_f
        a = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
        for f in g:
            af[f] = a
    assert all(a is not None for a in af), groups
    return af


def _alpha_mul(alpha, arr):
    """``alpha * arr`` for a scalar alpha or the per-field list from
    ``_lmr_alpha`` (Mosaic-safe: a stack of scalar-scaled planes, the same
    shape the block-Jacobi apply already lowers)."""
    if not isinstance(alpha, (list, tuple)):
        return alpha * arr
    return jnp.stack([alpha[f] * arr[f] for f in range(len(alpha))])


def _bj_apply(pinv, r, F, groups=None):
    """z = P^-1 r with P^-1 given as [F, F] plane stacks. ``groups`` (from
    SolverConfig.field_split) statically skips cross-group planes — they are
    exactly zero when the blocks came from a stop_gradient'ed terms_precond
    (solve/precond.py jvp columns), so a 6-field split cycle pays 8 plane
    FMAs per apply instead of 36."""
    partners = _group_of(groups, F)
    pv, pm = pinv
    zv, zm = [], []
    for i in range(F):
        av = am = None
        for j in range(F):
            if j not in partners[i]:
                continue
            tv = pv[i, j] * r[0][j]
            tm = pm[i, j] * r[1][j]
            av = tv if av is None else av + tv
            am = tm if am is None else am + tm
        zv.append(av)
        zm.append(am)
    return jnp.stack(zv), jnp.stack(zm)


def make_fused_descend(fine: CrossedTriGrid, coarse: CrossedTriGrid, terms,
                       n_fields: int, *, nu: int = 2, dtype=jnp.float32,
                       field_groups=None, alpha_groups=None,
                       bcs_fine=(), bcs_coarse=(), interpret: bool = False):
    """Returns ``descend(b, w, w0, dt, pinv) -> (x, bc)``: ``nu`` LMR
    pre-smoothing sweeps at the fine level from x=0, then Galerkin
    restriction of the smoothed residual — one kernel launch."""
    F = n_fields
    residual = _scalar_assembly(fine, terms, F)
    mat_arrays, load_mats = _build_pair_mats(fine, coarse)
    has_bcs = bool(bcs_fine) or bool(bcs_coarse)
    masks = (_bc_masks([fine, coarse], [bcs_fine, bcs_coarse], F)
             if has_bcs else None)
    ny, nx = fine.ny, fine.nx
    n_mats = len(mat_arrays)

    def kernel(*refs):
        b_v, b_m, w_v, w_m, w0_v, w0_m, pv, pm = refs[:8]
        mats = load_mats(refs[8:8 + n_mats])
        base = 8 + n_mats
        if has_bcs:
            keep_f = 1.0 - refs[base][:]
            keep_c = 1.0 - refs[base + 1][:]
            base += 2
        dt = refs[base][0, 0]
        ox_v, ox_m, bc_v, bc_m = refs[base + 1:base + 5]
        az_v, az_m = refs[base + 5], refs[base + 6]
        w = (w_v[:], w_m[:])
        w0 = (w0_v[:], w0_m[:])

        def body(_, carry):
            x, r = carry
            z = _bj_apply((pv, pm), r, F, groups=field_groups)
            _, planes = jax.jvp(lambda u: residual(u, w0, dt), (w,), (z,))
            _scatter_refs(planes, az_v, az_m, F, ny, nx)
            Av, Am = az_v[:], az_m[:]
            if has_bcs:
                Av = Av * keep_f + z[0] * (1.0 - keep_f)
            alpha = _lmr_alpha(Av, Am, r[0], r[1], alpha_groups)
            return ((x[0] + _alpha_mul(alpha, z[0]),
                     x[1] + _alpha_mul(alpha, z[1])),
                    (r[0] - _alpha_mul(alpha, Av),
                     r[1] - _alpha_mul(alpha, Am)))

        x0 = (jnp.zeros_like(b_v[:]), jnp.zeros_like(b_m[:]))
        x, r = lax.fori_loop(0, nu, body, (x0, (b_v[:], b_m[:])))
        bc = mats.restrict(r)
        if has_bcs:
            bc = (bc[0] * keep_c, bc[1])
        ox_v[:] = x[0]
        ox_m[:] = x[1]
        bc_v[:] = bc[0]
        bc_m[:] = bc[1]

    (Yv, Xv), (Ym, Xm) = fine.vshape, fine.mshape
    (Ycv, Xcv), (Ycm, Xcm) = coarse.vshape, coarse.mshape
    mat_consts = [jnp.asarray(a, dtype) for a in mat_arrays]
    if has_bcs:
        mat_consts += [jnp.asarray(m, dtype) for m in masks]
    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                   jax.ShapeDtypeStruct((F, Ym, Xm), dtype),
                   jax.ShapeDtypeStruct((F, Ycv, Xcv), dtype),
                   jax.ShapeDtypeStruct((F, Ycm, Xcm), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (8 + len(mat_consts))
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((F, Yv, Xv), dtype),
                        pltpu.VMEM((F, Ym, Xm), dtype)],
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES)),
        interpret=interpret,
    )

    def descend(b, w, w0, dt, pinv):
        dt_arr = jnp.asarray([[dt]], dtype)
        ox_v, ox_m, bc_v, bc_m = call(b[0], b[1], w[0], w[1], w0[0], w0[1],
                                      pinv[0], pinv[1], *mat_consts, dt_arr)
        return (ox_v, ox_m), (bc_v, bc_m)

    return descend


def make_fused_descend_chain(grids: list[CrossedTriGrid], terms,
                             n_fields: int, *, nu: int = 2,
                             nu_fine: int = 0,
                             dtype=jnp.float32, level_bcs=None,
                             field_groups=None, alpha_groups=None,
                             interpret: bool = False):
    """Multi-level descend: ``chain(b, w_levels, w0_levels, dt, pinvs) ->
    (xs, bs, bc)`` — for each level l in 0..k-1 of ``grids`` (k = len-1
    pairs): ``nu`` LMR pre-sweeps from x=0, then Galerkin restriction, all
    in ONE kernel. Returns the per-level smoothed iterates ``xs`` and
    restricted RHS ``bs[1..k-1]`` (the ascend chain's residual-update
    inputs) plus the coarsest-level RHS ``bc``. ``w_levels``/``w0_levels``
    are length-k lists of per-level linearization states (the caller's
    ``inject_any`` ladder — constant per solve, so shipping them beats the
    previous per-apply in-kernel re-injection).

    Mathematically identical to per-level make_fused_descend calls — this
    exists because each pallas launch costs ~0.2 ms at PFHub sizes and the
    mid-hierarchy levels are tiny (bench3: 175², 35²)."""
    K = len(grids) - 1
    F = n_fields
    assert K >= 1
    residuals = [_scalar_assembly(g, terms, F) for g in grids[:K]]
    level_bcs = level_bcs or [()] * len(grids)
    has_bcs = any(level_bcs)
    bc_masks_all = (_bc_masks(grids, level_bcs, F) if has_bcs else None)
    pair_arrs = []
    pair_loads = []
    for l in range(K):
        arrs, load = _build_pair_mats(grids[l], grids[l + 1])
        pair_arrs.append(arrs)
        pair_loads.append(load)
    shapes = [(g.vshape, g.mshape, g.ny, g.nx) for g in grids]

    def kernel(*refs):
        b_v, b_m = refs[:2]
        w_l = [(refs[2 + 2 * l][:], refs[3 + 2 * l][:]) for l in range(K)]
        w0_l = [(refs[2 + 2 * K + 2 * l][:], refs[3 + 2 * K + 2 * l][:])
                for l in range(K)]
        pinv = [(refs[2 + 4 * K + 2 * l], refs[3 + 4 * K + 2 * l])
                for l in range(K)]
        base = 2 + 6 * K
        mats = []
        for l in range(K):
            n = len(pair_arrs[l])
            mats.append(pair_loads[l](refs[base:base + n]))
            base += n
        if has_bcs:
            keep = [1.0 - refs[base + l][:] for l in range(K + 1)]
            base += K + 1
        dt = refs[base][0, 0]
        outs = refs[base + 1:]
        # outputs: xs (2K), bs for levels 1..K-1 (2(K-1)), bc (2)
        xs_out = [(outs[2 * l], outs[2 * l + 1]) for l in range(K)]
        bs_out = [(outs[2 * K + 2 * i], outs[2 * K + 2 * i + 1])
                  for i in range(K - 1)]
        bc_out = (outs[2 * K + 2 * (K - 1)], outs[2 * K + 2 * (K - 1) + 1])
        az = [(outs[4 * K + 2 * l], outs[4 * K + 2 * l + 1])
              for l in range(K)]     # scratch comes after all outputs

        b = (b_v[:], b_m[:])
        for l in range(K):
            ny, nx = shapes[l][2], shapes[l][3]

            def Az(z, l=l, ny=ny, nx=nx):
                _, planes = jax.jvp(
                    lambda u: residuals[l](u, w0_l[l], dt), (w_l[l],), (z,))
                _scatter_refs(planes, az[l][0], az[l][1], F, ny, nx)
                av, am = az[l][0][:], az[l][1][:]
                if has_bcs:
                    av = av * keep[l] + z[0] * (1.0 - keep[l])
                return av, am

            def body(_, carry, l=l, Az=Az):
                x, r = carry
                z = _bj_apply(pinv[l], r, F, groups=field_groups)
                Av, Am = Az(z)
                alpha = _lmr_alpha(Av, Am, r[0], r[1], alpha_groups)
                return ((x[0] + _alpha_mul(alpha, z[0]),
                         x[1] + _alpha_mul(alpha, z[1])),
                        (r[0] - _alpha_mul(alpha, Av),
                         r[1] - _alpha_mul(alpha, Am)))

            x0 = (jnp.zeros_like(b[0]), jnp.zeros_like(b[1]))
            nu_l = (nu_fine or nu) if l == 0 else nu
            x, r = lax.fori_loop(0, nu_l, body, (x0, b))
            xs_out[l][0][:] = x[0]
            xs_out[l][1][:] = x[1]
            b = mats[l].restrict(r)
            if has_bcs:
                b = (b[0] * keep[l + 1], b[1])
            if l + 1 < K:
                bs_out[l][0][:] = b[0]
                bs_out[l][1][:] = b[1]
        bc_out[0][:] = b[0]
        bc_out[1][:] = b[1]

    mat_consts = [jnp.asarray(a, dtype) for arrs in pair_arrs for a in arrs]
    if has_bcs:
        mat_consts += [jnp.asarray(m, dtype) for m in bc_masks_all]
    out_shape = []
    for l in range(K):
        (Yv, Xv), (Ym, Xm) = shapes[l][0], shapes[l][1]
        out_shape += [jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                      jax.ShapeDtypeStruct((F, Ym, Xm), dtype)]
    for l in range(1, K):
        (Yv, Xv), (Ym, Xm) = shapes[l][0], shapes[l][1]
        out_shape += [jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                      jax.ShapeDtypeStruct((F, Ym, Xm), dtype)]
    (Yv, Xv), (Ym, Xm) = shapes[K][0], shapes[K][1]
    out_shape += [jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                  jax.ShapeDtypeStruct((F, Ym, Xm), dtype)]
    scratch = []
    for l in range(K):
        (Yv, Xv), (Ym, Xm) = shapes[l][0], shapes[l][1]
        scratch += [pltpu.VMEM((F, Yv, Xv), dtype),
                    pltpu.VMEM((F, Ym, Xm), dtype)]
    call = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (2 + 6 * K + len(mat_consts))
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shape),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    def chain(b, w_levels, w0_levels, dt, pinvs):
        dt_arr = jnp.asarray([[dt]], dtype)
        flat_w = [a for wl in w_levels for a in wl]
        flat_w0 = [a for wl in w0_levels for a in wl]
        flat_p = [a for pv_pm in pinvs for a in pv_pm]
        out = call(b[0], b[1], *flat_w, *flat_w0, *flat_p,
                   *mat_consts, dt_arr)
        xs = [(out[2 * l], out[2 * l + 1]) for l in range(K)]
        bs = [(out[2 * K + 2 * i], out[2 * K + 2 * i + 1])
              for i in range(K - 1)]
        bc = (out[4 * K - 2], out[4 * K - 1])
        return xs, bs, bc

    return chain


def make_fused_ascend_chain(grids: list[CrossedTriGrid], terms,
                            n_fields: int, *, nu: int = 2,
                            nu_fine: int = 0,
                            dtype=jnp.float32, level_bcs=None,
                            field_groups=None, alpha_groups=None,
                            interpret: bool = False):
    """Multi-level ascend: ``chain(bs, xs, xc, w_levels, w0_levels, dt,
    pinvs) -> z`` — from the coarsest correction ``xc`` upward through
    levels k-1..0 of ``grids``: prolong, add to the descend iterate,
    recompute the level residual against ``bs[l]``, ``nu`` post-sweeps.
    One kernel. ``w_levels``/``w0_levels``: length-k per-level states (see
    make_fused_descend_chain)."""
    K = len(grids) - 1
    F = n_fields
    assert K >= 1
    residuals = [_scalar_assembly(g, terms, F) for g in grids[:K]]
    level_bcs = level_bcs or [()] * len(grids)
    has_bcs = any(level_bcs)
    bc_masks_all = (_bc_masks(grids[:K], level_bcs[:K], F)
                    if has_bcs else None)
    pair_arrs = []
    pair_loads = []
    for l in range(K):
        arrs, load = _build_pair_mats(grids[l], grids[l + 1])
        pair_arrs.append(arrs)
        pair_loads.append(load)
    shapes = [(g.vshape, g.mshape, g.ny, g.nx) for g in grids]

    def kernel(*refs):
        idx = 0
        bs = []
        xs = []
        for l in range(K):
            bs.append((refs[idx], refs[idx + 1]))
            idx += 2
        for l in range(K):
            xs.append((refs[idx], refs[idx + 1]))
            idx += 2
        xc_v, xc_m = refs[idx:idx + 2]
        idx += 2
        w_l = [(refs[idx + 2 * l][:], refs[idx + 2 * l + 1][:])
               for l in range(K)]
        idx += 2 * K
        w0_l = [(refs[idx + 2 * l][:], refs[idx + 2 * l + 1][:])
                for l in range(K)]
        idx += 2 * K
        pinv = [(refs[idx + 2 * l], refs[idx + 2 * l + 1]) for l in range(K)]
        idx += 2 * K
        mats = []
        for l in range(K):
            n = len(pair_arrs[l])
            mats.append(pair_loads[l](refs[idx:idx + n]))
            idx += n
        if has_bcs:
            keep = [1.0 - refs[idx + l][:] for l in range(K)]
            idx += K
        dt = refs[idx][0, 0]
        oz = (refs[idx + 1], refs[idx + 2])
        az = [(refs[idx + 3 + 2 * l], refs[idx + 4 + 2 * l])
              for l in range(K)]

        xc = (xc_v[:], xc_m[:])
        for l in range(K - 1, -1, -1):
            ny, nx = shapes[l][2], shapes[l][3]

            def Az(z, l=l, ny=ny, nx=nx):
                _, planes = jax.jvp(
                    lambda u: residuals[l](u, w0_l[l], dt), (w_l[l],), (z,))
                _scatter_refs(planes, az[l][0], az[l][1], F, ny, nx)
                av, am = az[l][0][:], az[l][1][:]
                if has_bcs:
                    av = av * keep[l] + z[0] * (1.0 - keep[l])
                return av, am

            pf = mats[l].prolong(xc)
            if has_bcs:
                pf = (pf[0] * keep[l], pf[1])
            x = (xs[l][0][:] + pf[0], xs[l][1][:] + pf[1])
            Av, Am = Az(x)
            b = (bs[l][0][:], bs[l][1][:])
            r = (b[0] - Av, b[1] - Am)

            def body(_, carry, l=l, Az=Az):
                x, r = carry
                z = _bj_apply(pinv[l], r, F, groups=field_groups)
                Av, Am = Az(z)
                alpha = _lmr_alpha(Av, Am, r[0], r[1], alpha_groups)
                return ((x[0] + _alpha_mul(alpha, z[0]),
                         x[1] + _alpha_mul(alpha, z[1])),
                        (r[0] - _alpha_mul(alpha, Av),
                         r[1] - _alpha_mul(alpha, Am)))

            nu_l = (nu_fine or nu) if l == 0 else nu
            x, r = lax.fori_loop(0, nu_l, body, (x, r))
            xc = x
        oz[0][:] = xc[0]
        oz[1][:] = xc[1]

    mat_consts = [jnp.asarray(a, dtype) for arrs in pair_arrs for a in arrs]
    if has_bcs:
        mat_consts += [jnp.asarray(m, dtype) for m in bc_masks_all]
    (Yv0, Xv0), (Ym0, Xm0) = shapes[0][0], shapes[0][1]
    scratch = []
    for l in range(K):
        (Yv, Xv), (Ym, Xm) = shapes[l][0], shapes[l][1]
        scratch += [pltpu.VMEM((F, Yv, Xv), dtype),
                    pltpu.VMEM((F, Ym, Xm), dtype)]
    n_vmem = 4 * K + 2 + 6 * K + len(mat_consts)
    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((F, Yv0, Xv0), dtype),
                   jax.ShapeDtypeStruct((F, Ym0, Xm0), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )

    def chain(bs, xs, xc, w_levels, w0_levels, dt, pinvs):
        dt_arr = jnp.asarray([[dt]], dtype)
        flat = []
        for b in bs:
            flat += [b[0], b[1]]
        for x in xs:
            flat += [x[0], x[1]]
        flat += [xc[0], xc[1]]
        for wl in w_levels:
            flat += [wl[0], wl[1]]
        for wl in w0_levels:
            flat += [wl[0], wl[1]]
        for pv_pm in pinvs:
            flat += [pv_pm[0], pv_pm[1]]
        out = call(*flat, *mat_consts, dt_arr)
        return (out[0], out[1])

    return chain


def make_fused_ascend(fine: CrossedTriGrid, coarse: CrossedTriGrid, terms,
                      n_fields: int, *, nu: int = 2, dtype=jnp.float32,
                      field_groups=None, alpha_groups=None,
                      with_matvec: bool = False, matvec_grid=None,
                      matvec_terms=None,
                      bcs_fine=(), bcs_coarse=(), interpret: bool = False):
    """Returns ``ascend(b, x, xc, w, w0, dt, pinv) -> z [, az]``: prolong the
    coarse correction ``xc``, add it to the pre-smoothed ``x``, recompute the
    fine residual, run ``nu`` post-smoothing sweeps — one kernel launch.
    ``with_matvec`` additionally emits the TRUE-rule fine J.v of the result
    (the FGMRES (z, Az) pair, see make_fused_vcycle's matvec_grid note)."""
    F = n_fields
    residual = _scalar_assembly(fine, terms, F)
    mv_terms = matvec_terms if matvec_terms is not None else terms
    residual_mv = (residual
                   if matvec_grid is None and mv_terms is terms
                   else _scalar_assembly(matvec_grid or fine, mv_terms, F))
    mat_arrays, load_mats = _build_pair_mats(fine, coarse)
    has_bcs = bool(bcs_fine) or bool(bcs_coarse)
    masks = (_bc_masks([fine], [bcs_fine], F) if has_bcs else None)
    ny, nx = fine.ny, fine.nx
    n_mats = len(mat_arrays)

    def kernel(*refs):
        b_v, b_m, x_v, x_m, xc_v, xc_m, w_v, w_m, w0_v, w0_m, pv, pm = refs[:12]
        mats = load_mats(refs[12:12 + n_mats])
        base = 12 + n_mats
        if has_bcs:
            keep_f = 1.0 - refs[base][:]
            base += 1
        dt = refs[base][0, 0]
        oz_v, oz_m = refs[base + 1], refs[base + 2]
        mv_out = ((refs[base + 3], refs[base + 4]) if with_matvec else None)
        off = base + 3 + (2 if with_matvec else 0)
        az_v, az_m = refs[off], refs[off + 1]
        w = (w_v[:], w_m[:])
        w0 = (w0_v[:], w0_m[:])

        def Az(z, res):
            _, planes = jax.jvp(lambda u: res(u, w0, dt), (w,), (z,))
            _scatter_refs(planes, az_v, az_m, F, ny, nx)
            Av, Am = az_v[:], az_m[:]
            if has_bcs:
                Av = Av * keep_f + z[0] * (1.0 - keep_f)
            return Av, Am

        pf = mats.prolong((xc_v[:], xc_m[:]))
        if has_bcs:
            pf = (pf[0] * keep_f, pf[1])
        x = (x_v[:] + pf[0], x_m[:] + pf[1])
        Av, Am = Az(x, residual)
        r = (b_v[:] - Av, b_m[:] - Am)

        def body(_, carry):
            x, r = carry
            z = _bj_apply((pv, pm), r, F, groups=field_groups)
            Av, Am = Az(z, residual)
            alpha = _lmr_alpha(Av, Am, r[0], r[1], alpha_groups)
            return ((x[0] + _alpha_mul(alpha, z[0]),
                     x[1] + _alpha_mul(alpha, z[1])),
                    (r[0] - _alpha_mul(alpha, Av),
                     r[1] - _alpha_mul(alpha, Am)))

        x, r = lax.fori_loop(0, nu, body, (x, r))
        oz_v[:] = x[0]
        oz_m[:] = x[1]
        if with_matvec:
            Av, Am = Az(x, residual_mv)
            mv_out[0][:] = Av
            mv_out[1][:] = Am

    (Yv, Xv), (Ym, Xm) = fine.vshape, fine.mshape
    mat_consts = [jnp.asarray(a, dtype) for a in mat_arrays]
    if has_bcs:
        mat_consts += [jnp.asarray(m, dtype) for m in masks]
    n_out = 4 if with_matvec else 2
    out_shape = tuple([jax.ShapeDtypeStruct((F, Yv, Xv), dtype),
                       jax.ShapeDtypeStruct((F, Ym, Xm), dtype)]
                      * (2 if with_matvec else 1))
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (12 + len(mat_consts))
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(n_out)),
        scratch_shapes=[pltpu.VMEM((F, Yv, Xv), dtype),
                        pltpu.VMEM((F, Ym, Xm), dtype)],
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES)),
        interpret=interpret,
    )

    def ascend(b, x, xc, w, w0, dt, pinv):
        dt_arr = jnp.asarray([[dt]], dtype)
        out = call(b[0], b[1], x[0], x[1], xc[0], xc[1], w[0], w[1],
                   w0[0], w0[1], pinv[0], pinv[1], *mat_consts, dt_arr)
        if with_matvec:
            return (out[0], out[1]), (out[2], out[3])
        return (out[0], out[1])

    return ascend
