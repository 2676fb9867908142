"""Geometric multigrid V-cycle preconditioner on the crossed-grid hierarchy.

Replaces the reference's SOR (and its petsc_amg/hypre_amg options,
dolfin/bench1.py:99-108) with the TPU-shaped equivalent:

- local minimal-residual smoothing (z = blockJacobi(r), step length
  minimizing ||r - a A z||) — damped Jacobi sweeps DIVERGE on the
  nonsymmetric CH block system at dt >~ 1, while the residual-minimizing
  step is non-increasing in ||r|| by construction;
- exact P1 grid transfers (solve/transfer.py);
- coarse rediscretization of the Jacobian at the injected state;
- the coarsest level solved by (more of the same) LMR sweeps.

The whole V-cycle runs in float32 regardless of the solver dtype: a
preconditioner only needs ~2 digits, f32 halves the compiled program (no
f64 emulation expansion on TPU) and runs ~4x faster on the VPU. Smoothing
loops are lax.scan'd so each level contributes ONE J.v subgraph per
smoothing phase — compile size stays linear in the number of levels.

The LMR step length depends nonlinearly on the input, so the outer Krylov
must be flexible (FGMRES, solve/krylov.py). Each Newton iteration rebuilds
the level linearizations at the current iterate.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, tree_util as jtu

from pfhubbenchmarks_tpu.fem.assembly import make_residual
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi
from pfhubbenchmarks_tpu.solve.transfer import (inject_any, prolong_any,
                                                restrict_any)


def coarsen_grid(g: CrossedTriGrid, r: int = 2) -> CrossedTriGrid:
    return dataclasses.replace(g, nx=g.nx // r, ny=g.ny // r)


# coarsening ratios tried in order at each level: prefer dyadic (best
# two-grid convergence, hand-optimized strided transfers), fall back to odd
# ratios when the cell count is odd — e.g. bench3's 350² (= 2·5²·7 squared)
# coarsens 350 → 175 → 35 → 7 instead of stopping at 175, which previously
# left a 175² "coarse" level that 24 LMR sweeps neither solved nor made
# cheap (round-2 VERDICT: bench3 ~2x baseline).
_RATIOS = (2, 3, 5, 7)


def build_hierarchy(grid: CrossedTriGrid, max_levels: int = 10,
                    min_cells: int = 7) -> list[CrossedTriGrid]:
    """Per-axis coarsening: each axis independently takes the smallest
    workable ratio, so anisotropic grids SEMICOARSEN instead of stopping —
    elast's 250×10 beam gets [250×10, 125×10, 25×10] (x-only below ny's
    floor) where it previously had no hierarchy at all. Equal-ratio levels
    stay exactly nested; mixed-ratio transfers are the general
    interpolation (solve/transfer.py)."""
    grids = [grid]
    while len(grids) < max_levels:
        g = grids[-1]
        ratios_try = (2,) if g.periodic else _RATIOS  # periodic: R=2 only

        def pick(n):
            return next((r for r in ratios_try
                         if n % r == 0 and n // r >= min_cells), 1)

        rx, ry = pick(g.nx), pick(g.ny)
        if rx == 1 and ry == 1:
            break
        if g.periodic and rx != ry:
            break
        grids.append(dataclasses.replace(g, nx=g.nx // rx, ny=g.ny // ry))
    return grids


def _cast(w, dtype):
    return jtu.tree_map(lambda a: a.astype(dtype), w)


def coarse_dof_count(g: CrossedTriGrid, n_fields: int) -> int:
    return n_fields * (g.n_vertices_y * g.n_vertices_x + g.ny * g.nx)


def make_dense_coarse(g: CrossedTriGrid, residual_c, n_fields: int, dtype):
    """Exact coarsest-level solver: materialize the coarse Jacobian with
    ``jax.jacfwd`` (a few hundred tiny jvps, vmapped) and invert it densely.

    LMR sweeps — fine as smoothers — are a weak coarse SOLVER for stiff
    systems: elast's thin-beam bending modes stall them at ANY sweep count
    (measured: FGMRES dead at ~3e-4 relative with 100-1200 coarse sweeps),
    and an inexact coarse solve caps V-cycle quality everywhere. A dense
    f32 inverse at ≲1500 dofs costs ~n³ ≲ 3 GFLOP per preconditioner build
    — noise on the MXU — and makes the coarse correction exact. This is
    the role AMG's direct coarse solve plays in the reference's
    hypre_amg fallback (dolfin/elast.py:115-116).
    """
    ny, nx = g.ny, g.nx
    nvy, nvx = g.n_vertices_y, g.n_vertices_x
    Yv, Xv = g.vshape
    Ym, Xm = g.mshape
    F = n_fields
    nv = F * nvy * nvx
    nm = F * ny * nx

    def flatten(w):
        v, m = w
        return jnp.concatenate([v[:, :nvy, :nvx].reshape(-1),
                                m[:, :ny, :nx].reshape(-1)])

    def unflatten(x):
        v = jnp.zeros((F, Yv, Xv), x.dtype).at[:, :nvy, :nvx].set(
            x[:nv].reshape(F, nvy, nvx))
        m = jnp.zeros((F, Ym, Xm), x.dtype).at[:, :ny, :nx].set(
            x[nv:].reshape(F, ny, nx))
        return v, m

    def build_inv(wl, w0l, dtl):
        x0 = flatten(wl)
        J = jax.jacfwd(
            lambda x: flatten(residual_c(unflatten(x), w0l, dtl)))(x0)
        # Row equilibration before the f32 inverse: PDE rows scale with the
        # operator (elast: O(1e4)) while Dirichlet rows are O(1); the mixed
        # scales push cond(J) past f32's range and the raw inverse emitted
        # corrections with ||A z|| ~ 1e5 ||b|| (measured — it STALLED
        # FGMRES). inv(D J) with D = 1/max|row| keeps only the physical
        # conditioning; J^{-1} b = inv(DJ) (D b).
        d = 1.0 / jnp.maximum(jnp.abs(J).max(axis=1), 1e-30)
        if jax.default_backend() == "cpu":
            A = jnp.linalg.inv(J * d[:, None])
        else:
            # XLA's LU/TriangularSolve expansion runs its block dots at
            # DEFAULT precision on TPU (bf16 MXU passes) — measured to
            # return a <1-digit inverse at elast scale and to wreck the
            # coarse correction here too: bench1 split_chain with a 25^2
            # dense coarse through jnp.linalg.inv walked 87570 Krylov
            # iters vs 6034 (chain_r16). mxu_inverse is matmul-only at
            # precision=HIGHEST (solve/mxu_inverse.py).
            from pfhubbenchmarks_tpu.solve.mxu_inverse import mxu_inverse

            A = mxu_inverse(J * d[:, None])
        return A, d

    def solve(Jinv, b):
        A, d = Jinv
        return unflatten(A @ (d * flatten(b)))

    return build_inv, solve


def make_gmg(grid: CrossedTriGrid, terms, n_fields: int, dirichlet_for=None,
             dtype=None, needs_coords: bool = False, *, nu_pre: int = 2,
             nu_post: int = 2, omega: float = 0.8, coarse_sweeps: int = 24,
             max_levels: int = 10, precond_dtype=jnp.float32,
             use_pallas: bool = False, use_tiled_sweeps: bool = False,
             tiled_grid_kernels: bool = False,
             precond_rule: str | None = None, min_cells: int = 7,
             dense_coarse_max_dofs: int = 1500, fuse_vcycle: str = "auto",
             cycle: str = "v", inner_mr: int = 1,
             nu_fine_pre: int = 0, nu_fine_post: int = 0,
             true_matvec: bool = True,
             matvec_terms=None, field_groups=None,
             field_split_alphas: bool = True):
    """Returns ``build(w, w0, dt) -> Minv`` applying one V-cycle.

    ``use_pallas=True`` replaces each level's J.v with the fused Pallas
    kernel (ops/pallas_residual.py) — ~1.7x faster per product on TPU by
    collapsing ~20 XLA kernels into one. Dirichlet rows are reapplied after
    the kernel (the tangent of a BC row ``u - g`` is just ``du``).
    """
    del omega  # step lengths are computed, not damped
    # per-group LMR step sizes: exact (the split operator's Az planes are
    # group-disjoint) and strictly better per sweep — see
    # ops/pallas_vcycle._lmr_alpha
    alpha_groups = field_groups if field_split_alphas else None
    # finest-level smoothing override (config.gmg_nu_fine_pre/post;
    # 0 = inherit): levels >= 1 keep nu_pre/nu_post
    nfp = nu_fine_pre or nu_pre
    nfo = nu_fine_post or nu_post
    dtype = dtype or jnp.float64
    dirichlet_for = dirichlet_for or (lambda g: ())
    grids = build_hierarchy(grid, max_levels=max_levels,
                            min_cells=min_cells)
    if precond_rule:
        # cheap-quadrature rediscretization for the whole hierarchy: grid
        # shapes/transfers are rule-independent, only the per-level operators
        # (residuals, block inverses, Pallas kernels) see the reduced rule
        grids = [dataclasses.replace(g, rule_name=precond_rule) for g in grids]
    residuals = []
    bj_builders = []
    pallas_jvs = []
    pallas_sweeps = []
    level_bcs = []
    for g in grids:
        bcs = dirichlet_for(g)
        level_bcs.append(bcs)
        residuals.append(make_residual(g, terms, n_fields, dirichlet=bcs,
                                       needs_coords=needs_coords,
                                       dtype=precond_dtype))
        bj_builders.append(make_block_jacobi(g, terms, n_fields, dirichlet=bcs,
                                             dtype=precond_dtype,
                                             needs_coords=needs_coords))
        if use_pallas and not needs_coords and not g.periodic:
            from pfhubbenchmarks_tpu.ops.pallas_residual import (
                fits_vmem, make_pallas_jvp, make_pallas_lmr_sweep,
                make_pallas_lmr_sweep_loop)

            nq_g = g.tab().nq
            ok = fits_vmem(g, n_fields, nq=nq_g)
            if ok:
                pallas_jvs.append(
                    make_pallas_jvp(g, terms, n_fields, dtype=precond_dtype))
            elif not bcs and use_tiled_sweeps:
                # tiled J.v for the level's post-correction residual — the
                # unfused XLA J.v at 350² is ~2 ms, paid once per V-cycle
                from pfhubbenchmarks_tpu.ops.pallas_tiled import (
                    choose_block_rows_vmem, make_tiled_jvp)
                from pfhubbenchmarks_tpu.ops.pallas_tiled_grid import (
                    make_grid_tiled_jvp)

                bc_rows = choose_block_rows_vmem(g, n_fields, nq_g)
                if bc_rows is not None and bc_rows < g.ny:
                    mk = (make_grid_tiled_jvp if tiled_grid_kernels
                          else make_tiled_jvp)
                    pallas_jvs.append(
                        ("tiled",) + mk(
                            g, terms, n_fields, dtype=precond_dtype,
                            block_rows=bc_rows))
                else:
                    pallas_jvs.append(None)
            else:
                pallas_jvs.append(None)
            counts = sorted({nu_pre, nu_post, coarse_sweeps, nfp, nfo})

            # fused multi-sweep kernels: unroll is capped per kernel (the
            # Mosaic stack grows with unrolled sweep count) and smoothing
            # phases scan whole-chunk kernel calls
            def _chunk(n):
                for c in (6, 5, 4, 3, 2, 1):
                    if n % c == 0:
                        return c
                return 1

            chunks = {n: _chunk(n) for n in counts}
            max_chunk = max(chunks.values())
            if not bcs and fits_vmem(g, n_fields, nq=nq_g,
                                     kernel="sweep_loop"):
                # whole smoothing PHASE in one kernel (fori_loop body) —
                # the only whole-array form that fits >2-field systems
                kernels = {n: make_pallas_lmr_sweep_loop(
                    g, terms, n_fields, dtype=precond_dtype, n_sweeps=n,
                    field_groups=field_groups, alpha_groups=alpha_groups)
                    for n in counts}
                pallas_sweeps.append(("loop", kernels))
            elif ok and not bcs and fits_vmem(g, n_fields, nq=4,
                                              kernel="sweep"):
                kernels = {c: make_pallas_lmr_sweep(g, terms, n_fields,
                                                    dtype=precond_dtype,
                                                    n_sweeps=c,
                                                    field_groups=field_groups,
                                                    alpha_groups=alpha_groups)
                           for c in sorted(set(chunks.values()))}
                pallas_sweeps.append((chunks, kernels))
            elif not bcs and use_tiled_sweeps:
                # whole-array kernel exceeds VMEM (6-field / 350^2 levels):
                # fall back to the row-block-tiled sweep kernel (on by
                # default; its lax.map-over-plain-kernels design exists
                # precisely because the abandoned grid=(nb,) variant
                # SIGABRTed the remote Mosaic compiler — ROADMAP.md)
                from pfhubbenchmarks_tpu.ops.pallas_tiled import (
                    choose_block_rows_vmem, make_tiled_lmr_sweep)
                from pfhubbenchmarks_tpu.ops.pallas_tiled_grid import (
                    make_grid_tiled_lmr_sweep)

                bc_rows = choose_block_rows_vmem(g, n_fields, nq_g)
                if bc_rows is not None and bc_rows < g.ny:
                    if tiled_grid_kernels:
                        mk = partial(make_grid_tiled_lmr_sweep,
                                     field_groups=field_groups,
                                     alpha_groups=alpha_groups)
                    else:
                        mk = partial(make_tiled_lmr_sweep,
                                     field_groups=field_groups,
                                     alpha_groups=alpha_groups)
                    pallas_sweeps.append(
                        ("tiled",) + mk(
                            g, terms, n_fields, dtype=precond_dtype,
                            block_rows=bc_rows))
                else:
                    pallas_sweeps.append(None)
            else:
                pallas_sweeps.append(None)
        else:
            pallas_jvs.append(None)
            pallas_sweeps.append(None)
    Ps = [prolong_any(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    Rs = [restrict_any(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    injs = [inject_any(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    # exact dense coarse solve when the coarsest level is small enough
    # (make_dense_coarse docstring); the fused whole-V-cycle kernel keeps
    # its in-kernel sweep solve (no dense inverse inside Mosaic).
    dense_coarse = None
    if coarse_dof_count(grids[-1], n_fields) <= dense_coarse_max_dofs:
        dense_coarse = make_dense_coarse(grids[-1], residuals[-1], n_fields,
                                         precond_dtype)
    from pfhubbenchmarks_tpu.ops.pallas_vcycle import transfers_fusable

    # whole-V-cycle fusion: ONE pallas_call per preconditioner application
    # (ops/pallas_vcycle.py) — the round-2 answer to ROADMAP perf item 1.
    # Gated on: no coordinate-dependent terms, >=2 levels, every level
    # pair dyadic or equal-odd-ratio (in-kernel MXU transfer matrices:
    # dyadic stencils or SVD-separated general pairs — bench3's
    # 350->175->35->7 qualifies), fine level within the Mosaic scoped-VMEM
    # envelope.
    # Dirichlet rows are handled in-kernel via 0/1 edge masks
    # (ops/pallas_vcycle._bc_masks).
    fused = None
    if (use_pallas and fuse_vcycle not in ("off", "split_levels", "split_chain")
            and not needs_coords
            and not grid.periodic and len(grids) >= 2
            and transfers_fusable(grids)):
        from pfhubbenchmarks_tpu.ops.pallas_residual import fits_vmem
        from pfhubbenchmarks_tpu.ops.pallas_vcycle import make_fused_vcycle

        # gate on the TRUE rule's nq: the exported matvec adds one
        # full-rule jvp subgraph to the kernel regardless of precond_rule
        if fits_vmem(grids[0], n_fields,
                     nq=max(grids[0].tab().nq, grid.tab().nq),
                     kernel="vcycle"):
            fused = make_fused_vcycle(
                grids, terms, n_fields, nu_pre=nu_pre, nu_post=nu_post,
                nu_fine_pre=nfp, nu_fine_post=nfo,
                coarse_sweeps=coarse_sweeps, dtype=precond_dtype,
                with_matvec=True,
                # the exported Az must match the OUTER Krylov operator:
                # the true-rule fine grid normally; under
                # config.krylov_operator='precond_rule' the outer operator
                # IS the cheap-rule rediscretization (defect correction),
                # so the pair assembles on grids[0]
                matvec_grid=(grid if (precond_rule and true_matvec)
                             else None),
                matvec_terms=matvec_terms, field_groups=field_groups,
                alpha_groups=alpha_groups,
                level_bcs=level_bcs, cycle=cycle, inner_mr=inner_mr)

    # sub-cycle fusion: when the FINE level exceeds the whole-kernel VMEM
    # envelope (bench3's 350²), fuse the largest TAIL of the hierarchy that
    # fits ([175², 35², 7²]) into one kernel and use it as level
    # ``sub_fused_at``'s solver inside the partially-fused cycle — the
    # level-1 smoothing phases, both 175↔35↔7 transfers, and the coarse
    # sweeps collapse from ~15-20 device ops to ONE launch per V-cycle.
    sub_fused = None
    sub_fused_at = None
    if (fused is None and use_pallas
            and fuse_vcycle not in ("off", "split_levels", "split_chain")
            and not needs_coords and not grid.periodic):
        from pfhubbenchmarks_tpu.ops.pallas_residual import fits_vmem
        from pfhubbenchmarks_tpu.ops.pallas_vcycle import make_fused_vcycle

        for lf in range(1, len(grids) - 1):
            tail = grids[lf:]
            if (len(tail) >= 2 and transfers_fusable(tail)
                    and fits_vmem(tail[0], n_fields, nq=tail[0].tab().nq,
                                  kernel="vcycle")):
                sub_fused = make_fused_vcycle(
                    tail, terms, n_fields, nu_pre=nu_pre, nu_post=nu_post,
                    coarse_sweeps=coarse_sweeps, dtype=precond_dtype,
                    field_groups=field_groups, alpha_groups=alpha_groups,
                    level_bcs=level_bcs[lf:], cycle=cycle)
                sub_fused_at = lf
                break

    # split-V-cycle fusion (ops/pallas_vcycle.py): when the tail kernel
    # starts directly below the fine level, the fine level's smoothing
    # phases + BOTH transfer directions fuse into two more kernels
    # (descend / ascend) — the whole V-cycle is then THREE launches. The
    # XLA strided transfers they replace measured 3.4 ms of bench3's
    # 4.2 ms V-cycle (r3 attribution, .scratch/prof_r4j.log).
    split_descend = split_ascend = None
    split_mv_jv = None
    if (sub_fused is not None and sub_fused_at == 1
            and fuse_vcycle != "split_levels"
            and transfers_fusable(grids[:2])
            and fits_vmem(grids[0], n_fields, nq=grids[0].tab().nq,
                          kernel="sweep_loop")):
        from pfhubbenchmarks_tpu.ops.pallas_vcycle import (
            make_fused_ascend, make_fused_descend)

        split_descend = make_fused_descend(
            grids[0], grids[1], terms, n_fields, nu=nfp,
            dtype=precond_dtype, field_groups=field_groups,
            alpha_groups=alpha_groups,
            bcs_fine=level_bcs[0], bcs_coarse=level_bcs[1])
        split_ascend = make_fused_ascend(
            grids[0], grids[1], terms, n_fields, nu=nfo,
            dtype=precond_dtype, field_groups=field_groups,
            alpha_groups=alpha_groups,
            bcs_fine=level_bcs[0], bcs_coarse=level_bcs[1])

    # fuse_vcycle="split_levels": EVERY level above the coarsest gets a
    # descend/ascend kernel pair and the coarsest keeps the exact dense
    # solve OUTSIDE the kernels (in-kernel flatten of tiled planes is not
    # expressible in Mosaic). More launches than the monolithic-tail split
    # (2(L-1)+1 vs 3) but the dense coarse is a far stronger solve than the
    # tail kernel's LMR sweeps — measured on bench3: 24-sweep in-kernel 7²
    # coarse costs ~1.5x the Krylov iterations of the dense inverse.
    level_splits = None
    if (fused is None and use_pallas and fuse_vcycle == "split_levels"
            and not needs_coords and not grid.periodic and len(grids) >= 2
            and all(transfers_fusable(grids[l:l + 2])
                    and fits_vmem(grids[l], n_fields,
                                  nq=grids[l].tab().nq, kernel="sweep_loop")
                    for l in range(len(grids) - 1))):
        from pfhubbenchmarks_tpu.ops.pallas_vcycle import (
            make_fused_ascend, make_fused_descend)

        level_splits = [
            (make_fused_descend(grids[l], grids[l + 1], terms, n_fields,
                                nu=(nfp if l == 0 else nu_pre),
                                dtype=precond_dtype,
                                field_groups=field_groups,
                                alpha_groups=alpha_groups,
                                bcs_fine=level_bcs[l],
                                bcs_coarse=level_bcs[l + 1]),
             make_fused_ascend(grids[l], grids[l + 1], terms, n_fields,
                               nu=(nfo if l == 0 else nu_post),
                               dtype=precond_dtype,
                               field_groups=field_groups,
                               alpha_groups=alpha_groups,
                               bcs_fine=level_bcs[l],
                               bcs_coarse=level_bcs[l + 1]))
            for l in range(len(grids) - 1)]
        sub_fused = None
        sub_fused_at = None

    # fuse_vcycle="split_chain": the whole descent (every level's
    # pre-sweeps + restriction) is ONE kernel and the whole ascent
    # (prolongation + residual update + post-sweeps per level) another —
    # same math as split_levels at 2 launches + the external dense coarse
    # instead of 2(L-1). The mid-hierarchy levels are tiny, so per-launch
    # overhead (~0.2 ms at PFHub sizes) dominated the per-level variant.
    split_chain = None
    if (fused is None and use_pallas and fuse_vcycle == "split_chain"
            and not needs_coords and not grid.periodic and len(grids) >= 2
            and transfers_fusable(grids)
            and fits_vmem(grids[0], n_fields, nq=grids[0].tab().nq,
                          kernel="sweep_loop")):
        from pfhubbenchmarks_tpu.ops.pallas_vcycle import (
            make_fused_ascend_chain, make_fused_descend_chain)

        split_chain = (
            make_fused_descend_chain(grids, terms, n_fields, nu=nu_pre,
                                     nu_fine=nfp, dtype=precond_dtype,
                                     level_bcs=level_bcs,
                                     field_groups=field_groups,
                                     alpha_groups=alpha_groups),
            make_fused_ascend_chain(grids, terms, n_fields, nu=nu_post,
                                    nu_fine=nfo, dtype=precond_dtype,
                                    level_bcs=level_bcs,
                                    field_groups=field_groups,
                                    alpha_groups=alpha_groups))
        sub_fused = None
        sub_fused_at = None

    # fused (z, Az) pair for FGMRES: A z must match the OUTER Krylov
    # operator — the true-rule fine grid (see make_fused_vcycle's
    # matvec_grid note), or the cheap-rule grids[0] under
    # config.krylov_operator='precond_rule'. The extra launch replaces the
    # outer matvec entirely.
    if ((split_descend is not None or level_splits is not None
            or split_chain is not None)
            and not level_bcs[0]
            and fits_vmem(grid, n_fields, nq=grid.tab().nq)):
        from pfhubbenchmarks_tpu.ops.pallas_residual import make_pallas_jvp

        split_mv_jv = make_pallas_jvp(grid if true_matvec else grids[0],
                                      matvec_terms or terms, n_fields,
                                      dtype=precond_dtype)

    def build(w, w0, dt):
        if fused is not None:
            wf = _cast(w, precond_dtype)
            w0f = _cast(w0, precond_dtype)
            dtf = jnp.asarray(dt, precond_dtype)
            pinvs = []
            w_ls, w0_ls = [], []
            wl, w0l = wf, w0f
            for l in range(len(grids)):
                w_ls.append(wl)
                w0_ls.append(w0l)
                pinvs.append(bj_builders[l](wl, w0l, dtf).pinv_planes)
                if l + 1 < len(grids):
                    wl = injs[l](wl)
                    w0l = injs[l](w0l)

            def Minv_fused(r):
                z, _ = fused(_cast(r, precond_dtype), w_ls, w0_ls, dtf,
                             pinvs)
                return _cast(z, dtype)

            def minv_matvec(r):
                """(M^-1 r, A M^-1 r) in ONE kernel launch — FGMRES's
                z-then-Az pair (solve/krylov.py) without the intermediate
                HBM round-trip. Same fine-level linearization (w, w0, dt)
                as the outer J.v, so the products are identical."""
                z, az = fused(_cast(r, precond_dtype), w_ls, w0_ls, dtf,
                              pinvs)
                return _cast(z, dtype), _cast(az, dtype)

            # The exported A z must be the TRUE outer operator — under
            # precond_rule the hierarchy is a cheap-rule rediscretization,
            # and handing FGMRES its A z breaks the Arnoldi relation (the
            # true-residual restart gate then sees no progress and every
            # solve reports failure; observed as a bench2 dt_min stall).
            # make_fused_vcycle therefore assembles the exported pair on
            # ``matvec_grid`` (the full-rule fine grid), so the pair is
            # valid for any precond_rule.
            Minv_fused.minv_matvec = minv_matvec
            return Minv_fused

        ops = []
        sweep_fns = []
        level_states = []       # (wl, w0l) per level, for sub_fused
        level_pinvs = []
        wl = _cast(w, precond_dtype)
        w0l = _cast(w0, precond_dtype)
        dtl = jnp.asarray(dt, precond_dtype)
        for l in range(len(grids)):
            level_states.append((wl, w0l))
            if (isinstance(pallas_jvs[l], tuple)
                    and pallas_jvs[l][0] == "tiled"):
                _, prep_j, jv_j = pallas_jvs[l]
                staged_j = prep_j(wl, w0l)

                def jvp(v, jv_j=jv_j, staged=staged_j, dtl=dtl):
                    return jv_j(v, staged, dtl)
            elif pallas_jvs[l] is not None:
                pjv = pallas_jvs[l]
                bcs = level_bcs[l]
                wl_c, w0l_c, dtl_c = wl, w0l, dtl

                def jvp(v, pjv=pjv, bcs=bcs, wl=wl_c, w0l=w0l_c, dtl=dtl_c):
                    rv, rm = pjv(wl, w0l, dtl, v)
                    for bc in bcs:
                        f, i = bc.field, bc.index
                        if bc.side in ("left", "right"):
                            rv = rv.at[f, :, i].set(v[0][f, :, i])
                        else:
                            rv = rv.at[f, i, :].set(v[0][f, i, :])
                    return rv, rm
            else:
                res_l = residuals[l]
                _, jvp = jax.linearize(lambda u: res_l(u, w0l, dtl), wl)
            bj = bj_builders[l](wl, w0l, dtl)
            ops.append((jvp, bj))
            level_pinvs.append(bj.pinv_planes)
            if pallas_sweeps[l] is None:
                sweep_fns.append(None)
            elif pallas_sweeps[l][0] == "loop":
                _, loop_kernels = pallas_sweeps[l]
                pinv = bj.pinv_planes

                def sweep_fn(x, r, n, kernels=loop_kernels, pinv=pinv,
                             wl=wl, w0l=w0l, dtl=dtl):
                    return kernels[n](x, r, wl, w0l, dtl, pinv[0], pinv[1])

                sweep_fns.append(sweep_fn)
            elif pallas_sweeps[l][0] == "tiled":
                _, prep, tsweep = pallas_sweeps[l]
                staged = prep(wl, w0l, bj.pinv_planes)

                def sweep_fn(x, r, n, tsweep=tsweep, staged=staged,
                             dtl=dtl):
                    return tsweep(x, r, n, staged, dtl)

                sweep_fns.append(sweep_fn)
            else:
                pinv = bj.pinv_planes
                chunks, kernels = pallas_sweeps[l]

                def sweep_fn(x, r, n, chunks=chunks, kernels=kernels,
                             pinv=pinv, wl=wl, w0l=w0l):
                    c = chunks[n]
                    kern = kernels[c]

                    def body(carry, _):
                        return kern(*carry, wl, w0l, dtl, pinv[0], pinv[1]), None

                    (x, r), _ = lax.scan(body, (x, r), None, length=n // c)
                    return x, r

                sweep_fns.append(sweep_fn)
            if l + 1 < len(grids):
                wl = injs[l](wl)
                w0l = injs[l](w0l)

        # the sub-fused tail solves the coarsest level by in-kernel sweeps;
        # don't build the (unreachable) dense inverse in that case
        Jinv_coarse = (dense_coarse[0](wl, w0l, dtl)
                       if dense_coarse is not None and sub_fused_at is None
                       else None)

        def smooth(l, x, r, sweeps):
            """LMR sweeps, scanned so the J.v subgraph appears once.
            A whole smoothing phase is ONE fused Pallas kernel when available
            (kernel-launch latency dominates at these grid sizes)."""
            if sweep_fns[l] is not None:
                return sweep_fns[l](x, r, sweeps)
            jvp, bj = ops[l]

            def body(carry, _):
                x, r = carry
                z = bj(r)
                Az = jvp(z)
                if alpha_groups is None:
                    alpha = tr.vdot(Az, r) * tr.safe_inv(tr.vdot(Az, Az))
                else:
                    from pfhubbenchmarks_tpu.ops.pallas_vcycle import (
                        _lmr_alpha)

                    alpha = jnp.stack(_lmr_alpha(
                        Az[0], Az[1], r[0], r[1],
                        alpha_groups))[:, None, None]
                return (tr.axpy(alpha, z, x), tr.axpy(-alpha, Az, r)), None

            (x, r), _ = lax.scan(body, (x, r), None, length=sweeps)
            return x, r

        def zero_bc_rows(l, w):
            """Dirichlet rows carry constraint residuals (u - g), not PDE
            residuals: restriction must not smear interior residual into
            them, and coarse corrections must vanish there (the fine BC
            rows are corrected exactly by the identity-row smoother).
            Without this the coarse 'correction' on a clamped edge is
            garbage scaled by the operator (elast's E=1e5 blasted it to
            ||A z|| ~ 1e4 ||b|| — the V-cycle stalled FGMRES entirely)."""
            rv, rm = w
            for bc in level_bcs[l]:
                f, i = bc.field, bc.index
                if bc.side in ("left", "right"):
                    rv = rv.at[f, :, i].set(0.0)
                else:
                    rv = rv.at[f, i, :].set(0.0)
            return rv, rm

        gamma = 2 if cycle == "w" else 1

        def vcycle(l, b):
            jvp, _ = ops[l]
            if split_chain is not None and l == 0:
                chain_d, chain_a = split_chain
                K = len(grids) - 1
                w_ls = [s[0] for s in level_states[:K]]
                w0_ls = [s[1] for s in level_states[:K]]
                xs, bs, bc = chain_d(b, w_ls, w0_ls, dtl, level_pinvs[:K])
                xc = vcycle(K, bc)
                return chain_a([b] + bs, xs, xc, w_ls, w0_ls, dtl,
                               level_pinvs[:K])
            if level_splits is not None and l < len(grids) - 1:
                d_k, a_k = level_splits[l]
                wl_l, w0l_l = level_states[l]
                x, bc = d_k(b, wl_l, w0l_l, dtl, level_pinvs[l])
                xc = vcycle(l + 1, bc)
                z = a_k(b, x, xc, wl_l, w0l_l, dtl, level_pinvs[l])
                for _ in range(gamma - 1):
                    rz = tr.sub(b, jvp(z))
                    x2, bc2 = d_k(rz, wl_l, w0l_l, dtl, level_pinvs[l])
                    xc2 = vcycle(l + 1, bc2)
                    z = tr.add(z, a_k(rz, x2, xc2, wl_l, w0l_l, dtl,
                                      level_pinvs[l]))
                return z
            if l == 0 and split_descend is not None:
                # three-kernel split V-cycle: descend + fused tail + ascend
                wl0, w0l0 = level_states[0]
                x, bc = split_descend(b, wl0, w0l0, dtl, level_pinvs[0])
                xc = sub_fused(bc, [s[0] for s in level_states[1:]],
                               [s[1] for s in level_states[1:]], dtl,
                               level_pinvs[1:])
                return split_ascend(b, x, xc, wl0, w0l0, dtl,
                                    level_pinvs[0])
            if l == sub_fused_at:
                # the whole tail [l..coarsest] — smoothing phases, both
                # transfer directions, coarse sweeps — is ONE kernel
                return sub_fused(b, [s[0] for s in level_states[l:]],
                                 [s[1] for s in level_states[l:]], dtl,
                                 level_pinvs[sub_fused_at:])
            if l == len(grids) - 1:
                if Jinv_coarse is not None:
                    return dense_coarse[1](Jinv_coarse, b)
                x, _ = smooth(l, tr.zeros_like(b), b, coarse_sweeps)
                return x
            x, r = smooth(l, tr.zeros_like(b), b, nfp if l == 0 else nu_pre)
            for _ in range(gamma):
                bc_ = zero_bc_rows(l + 1, Rs[l](r))
                x = tr.add(x, zero_bc_rows(l, Ps[l](vcycle(l + 1, bc_))))
                r = tr.sub(b, jvp(x))
            x, _ = smooth(l, x, r, nfo if l == 0 else nu_post)
            return x

        def vcycle_top(b):
            """inner_mr >= 2: GCR(s) acceleration — s V-cycle-preconditioned
            GCR steps per preconditioner call (config.gmg_inner_mr).
            GCR keeps the A z directions mutually orthogonal, so s steps are
            mathematically GMRES(s) preconditioned by the V-cycle — the
            greedy unorthogonalized MR variant measured only a 17% outer-
            iteration cut at s=2 on bench1 (.scratch/b1innermr.log), while
            orthogonalized directions track the outer FGMRES's own per-
            iteration contraction. The inner residual updates use the
            level-0 (precond-rule) operator; the outer FGMRES corrects any
            rule mismatch, exactly as for the plain V-cycle."""
            if inner_mr <= 1:
                return vcycle(0, b)
            jvp0, _ = ops[0]
            z_acc = tr.zeros_like(b)
            rc = b
            zs, azs = [], []
            for _ in range(inner_mr):
                z = vcycle(0, rc)
                az = jvp0(z)
                for zi, azi in zip(zs, azs):
                    # orthogonalize az against prior directions (unit norm),
                    # applying the same combination to z to keep az = A z
                    h = tr.vdot(azi, az)
                    az = tr.axpy(-h, azi, az)
                    z = tr.axpy(-h, zi, z)
                nrm_inv = tr.safe_inv(tr.norm(az))
                z = tr.scale(nrm_inv, z)
                az = tr.scale(nrm_inv, az)
                zs.append(z)
                azs.append(az)
                alpha = tr.vdot(az, rc)
                z_acc = tr.axpy(alpha, z, z_acc)
                rc = tr.axpy(-alpha, az, rc)
            return z_acc

        def Minv(r):
            z = vcycle_top(_cast(r, precond_dtype))
            return _cast(z, dtype)

        if split_mv_jv is not None and (split_descend is not None
                                        or level_splits is not None
                                        or split_chain is not None):
            wf0, w0f0 = level_states[0]

            def minv_matvec(r):
                """(M^-1 r, A M^-1 r) in FOUR kernel launches (descend,
                tail, ascend, true-rule J.v) — replaces the outer matvec's
                separate tiled launch. Same fine-level linearization
                (w, w0, dt) as the outer J.v."""
                z = vcycle_top(_cast(r, precond_dtype))
                az = split_mv_jv(wf0, w0f0, dtl, z)
                return _cast(z, dtype), _cast(az, dtype)

            Minv.minv_matvec = minv_matvec
        return Minv

    return build
