"""Geometric multigrid V-cycle for 3D Kuhn-tet grids (see solve/gmg.py).

Same design as the 2D cycle — LMR smoothing on the block-Jacobi
preconditioned operator, coarse rediscretization at the injected state, f32
throughout — over the single-vertex-grid 3D hierarchy.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax, tree_util as jtu

from pfhubbenchmarks_tpu.fem.assembly3d import make_residual3d
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi3d
from pfhubbenchmarks_tpu.solve.transfer3d import (inject3d_any, prolong3d_any,
                                                  restrict3d_any)


def build_hierarchy3d(grid: TetGrid, max_levels: int = 10,
                      min_cells: int = 4) -> list[TetGrid]:
    """Uniform coarsening with mixed ratios {2, 3, 5}: Kuhn-P1 spaces are
    nested under ANY integer refinement (transfer3d._kuhn_weights), so
    bench1_3d's 50³ coarsens 50³ → 25³ → 5³ instead of stopping at the odd
    25³ — whose 24-sweep 'coarse solve' was ~3 fine-sweep equivalents per
    V-cycle."""
    grids = [grid]
    while len(grids) < max_levels:
        g = grids[-1]
        r = next((r for r in (2, 3, 5)
                  if all(n % r == 0 and n // r >= min_cells
                         for n in (g.nx, g.ny, g.nz))), None)
        if r is None:
            break
        grids.append(dataclasses.replace(g, nx=g.nx // r, ny=g.ny // r,
                                         nz=g.nz // r))
    return grids


def make_gmg3d(grid: TetGrid, terms, n_fields: int, dirichlet_for=None,
               dtype=None, needs_coords: bool = False, *,
               nu_pre: int = 2, nu_post: int = 2, coarse_sweeps: int = 24,
               max_levels: int = 10, precond_dtype=jnp.float32,
               precond_rule: str | None = None, cycle: str = "v",
               inner_mr: int = 1, kcycle: int = 1,
               use_pallas: bool = False, tiled_nb1: bool = False,
               nu_fine_pre: int = 0, nu_fine_post: int = 0):
    """``dirichlet_for(grid) -> (DirichletBC3D, ...)`` rebuilds face BCs on
    every coarse level (coarse rediscretization keeps BC rows ``u - g``,
    mirroring the 2D cycle).

    ``precond_rule``: cheap-quadrature rediscretization of the WHOLE
    hierarchy (2D: SolverConfig.precond_rule). The ffc3 tet rule is 8
    points/tet; 'keast2' (4 pts) or 'keast1' (1 pt) cut the einsum volume
    of every smoothing J.v — the 3D per-iteration bottleneck (measured
    50³: one f32 residual eval 3.2 ms at nq=8; the V-cycle 21.7 ms).
    Transfers/injection are rule-independent, so converged solutions are
    unchanged (the outer residual/J.v keep the FFC-parity rule)."""
    dtype = dtype or jnp.float64
    dirichlet_for = dirichlet_for or (lambda g: ())
    grids = build_hierarchy3d(grid, max_levels=max_levels)
    if precond_rule:
        grids = [dataclasses.replace(g, rule_name=precond_rule)
                 for g in grids]
    level_bcs = [dirichlet_for(g) for g in grids]
    residuals = [make_residual3d(g, terms, n_fields, dirichlet=bcs,
                                 needs_coords=needs_coords,
                                 dtype=precond_dtype)
                 for g, bcs in zip(grids, level_bcs)]
    bj_builders = [make_block_jacobi3d(g, terms, n_fields, dirichlet=bcs,
                                       dtype=precond_dtype,
                                       needs_coords=needs_coords)
                   for g, bcs in zip(grids, level_bcs)]

    # Pallas 3D kernels (ops/pallas3d.py): whole-array smoothing-phase
    # kernels where the volume fits VMEM, z-slab-tiled sweeps + J.v at the
    # fine level — the XLA einsum J.v is the 3D per-iteration bottleneck
    # (21.7 ms/V-cycle at 50³, r3 attribution). BC-free levels only (the
    # 3D Dirichlet problems run the XLA path).
    pallas_sweeps = [None] * len(grids)
    pallas_jvs = [None] * len(grids)
    if use_pallas and not needs_coords:
        from pfhubbenchmarks_tpu.ops.pallas3d import (
            choose_block_zrows, fits_vmem3d, make_pallas_jvp3d,
            make_pallas_lmr_sweep_loop3d, make_tiled_jvp3d,
            make_tiled_lmr_sweep3d)

        for l, (g, bcs) in enumerate(zip(grids, level_bcs)):
            if bcs:
                continue
            nq_g = g.tab().nq
            counts = sorted({nu_pre, nu_post, coarse_sweeps,
                             nu_fine_pre or nu_pre, nu_fine_post or nu_post})
            if fits_vmem3d(g, n_fields, nq_g, kernel="sweep_loop"):
                pallas_sweeps[l] = ("loop", {
                    n: make_pallas_lmr_sweep_loop3d(
                        g, terms, n_fields, dtype=precond_dtype, n_sweeps=n)
                    for n in counts})
                if fits_vmem3d(g, n_fields, nq_g):
                    pallas_jvs[l] = ("whole",
                                     make_pallas_jvp3d(g, terms, n_fields,
                                                       dtype=precond_dtype))
            else:
                # tiled_nb1 (SolverConfig.tiled_nb1_3d): bc == nz means ONE
                # slab covers the level — a per-sweep whole-slab kernel.
                # Excluded by default; bench1_3d's 25³ hits exactly this
                # (sweep_loop over VMEM, choose_block_zrows returns nz).
                bc_rows = choose_block_zrows(g, n_fields, nq_g)
                if bc_rows is not None and (bc_rows < g.nz or tiled_nb1):
                    pallas_sweeps[l] = ("tiled",) + make_tiled_lmr_sweep3d(
                        g, terms, n_fields, dtype=precond_dtype,
                        block_rows=bc_rows)
                    pallas_jvs[l] = ("tiled",) + make_tiled_jvp3d(
                        g, terms, n_fields, dtype=precond_dtype,
                        block_rows=bc_rows)
    Ps = [prolong3d_any(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    Rs = [restrict3d_any(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    injs = [inject3d_any(grids[l + 1], grids[l]) for l in range(len(grids) - 1)]
    # exact dense coarse solve (see solve/gmg.make_dense_coarse rationale)
    gc = grids[-1]
    nc_dofs = n_fields * (gc.nz + 1) * (gc.ny + 1) * (gc.nx + 1)
    dense_coarse = None
    if nc_dofs <= 1500:
        Zc, Yc, Xc = gc.vshape
        nzc, nyc, nxc = gc.nz, gc.ny, gc.nx
        res_c = residuals[-1]

        def _flat(w):
            return w[0][:, : nzc + 1, : nyc + 1, : nxc + 1].reshape(-1)

        def _unflat(x):
            v = jnp.zeros((n_fields, Zc, Yc, Xc), x.dtype)
            return (v.at[:, : nzc + 1, : nyc + 1, : nxc + 1].set(
                x.reshape(n_fields, nzc + 1, nyc + 1, nxc + 1)),)

        def _build_inv(wl, w0l, dtl):
            J = jax.jacfwd(lambda x: _flat(
                res_c(_unflat(x), w0l, dtl)))(_flat(wl))
            d = 1.0 / jnp.maximum(jnp.abs(J).max(axis=1), 1e-30)
            if jax.default_backend() == "cpu":
                return jnp.linalg.inv(J * d[:, None]), d
            # TPU: jnp.linalg.inv expands through DEFAULT-precision (bf16)
            # block dots — measured <1-digit inverses (solve/mxu_inverse.py)
            from pfhubbenchmarks_tpu.solve.mxu_inverse import mxu_inverse

            return mxu_inverse(J * d[:, None]), d

        def _dc_solve(Jinv, b):
            A, d = Jinv
            return _unflat(A @ (d * _flat(b)))

        dense_coarse = (_build_inv, _dc_solve)

    def _cast(w, dt_):
        return jtu.tree_map(lambda a: a.astype(dt_), w)

    def build(w, w0, dt):
        ops = []
        sweep_fns = []
        wl = _cast(w, precond_dtype)
        w0l = _cast(w0, precond_dtype)
        dtl = jnp.asarray(dt, precond_dtype)
        for l in range(len(grids)):
            bj = bj_builders[l](wl, w0l, dtl)
            if pallas_jvs[l] is not None and pallas_jvs[l][0] == "tiled":
                _, prep_j, jv_j = pallas_jvs[l]
                staged_j = prep_j(wl, w0l)

                def jvp(v, jv_j=jv_j, staged=staged_j, dtl=dtl):
                    return jv_j(v, staged, dtl)
            elif pallas_jvs[l] is not None:
                _, pjv = pallas_jvs[l]
                wl_c, w0l_c = wl, w0l

                def jvp(v, pjv=pjv, wl=wl_c, w0l=w0l_c, dtl=dtl):
                    return pjv(wl, w0l, dtl, v)
            else:
                res_l = residuals[l]
                _, jvp = jax.linearize(lambda u: res_l(u, w0l, dtl), wl)
            ops.append((jvp, bj))
            if pallas_sweeps[l] is None:
                sweep_fns.append(None)
            elif pallas_sweeps[l][0] == "loop":
                _, kernels = pallas_sweeps[l]
                pinv = bj.pinv_planes

                def sweep_fn(x, r, n, kernels=kernels, pinv=pinv,
                             wl=wl, w0l=w0l, dtl=dtl):
                    return kernels[n](x, r, wl, w0l, dtl, pinv)

                sweep_fns.append(sweep_fn)
            else:
                _, prep_s, tsweep = pallas_sweeps[l]
                staged_s = prep_s(wl, w0l, bj.pinv_planes)

                def sweep_fn(x, r, n, tsweep=tsweep, staged=staged_s,
                             dtl=dtl):
                    return tsweep(x, r, n, staged, dtl)

                sweep_fns.append(sweep_fn)
            if l + 1 < len(grids):
                wl = injs[l](wl)
                w0l = injs[l](w0l)

        Jinv_coarse = (dense_coarse[0](wl, w0l, dtl)
                       if dense_coarse is not None else None)

        def smooth(l, x, r, sweeps):
            jvp, bj = ops[l]
            if sweep_fns[l] is not None:
                return sweep_fns[l](x, r, sweeps)

            def body(carry, _):
                x, r = carry
                z = bj(r)
                Az = jvp(z)
                alpha = tr.vdot(Az, r) * tr.safe_inv(tr.vdot(Az, Az))
                return (tr.axpy(alpha, z, x), tr.axpy(-alpha, Az, r)), None

            (x, r), _ = lax.scan(body, (x, r), None, length=sweeps)
            return x, r

        def zero_bc_rows(l, w):
            # constraint rows carry u - g, not PDE residual: keep restricted
            # residuals and prolonged corrections out of them (see the 2D
            # cycle's zero_bc_rows for the measured failure mode)
            (rv,) = w
            for bc in level_bcs[l]:
                f, i = bc.field, bc.index
                ax = bc.face[0]
                if ax == "x":
                    rv = rv.at[f, :, :, i].set(0.0)
                elif ax == "y":
                    rv = rv.at[f, :, i, :].set(0.0)
                else:
                    rv = rv.at[f, i, :, :].set(0.0)
            return (rv,)

        gamma = 2 if cycle == "w" else 1

        def mr_accel(l, b, fn, steps):
            """steps GCR-combined applications of ``fn`` at level l (the
            A z directions kept mutually orthogonal, so this is GMRES(steps)
            preconditioned by ``fn``). Shared by the K-cycle coarse solve
            and the top-level inner_mr wrapper (the 3D analogue of
            solve/gmg.py's vcycle_top)."""
            jvp, _ = ops[l]
            z_acc = tr.zeros_like(b)
            rc = b
            zs, azs = [], []
            for _ in range(steps):
                z = fn(rc)
                az = jvp(z)
                for zi, azi in zip(zs, azs):
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

        def coarse_visit(l, b):
            """K-cycle (gmg_kcycle >= 2): each coarse-level visit runs a
            kcycle-step MR combination of recursive cycle applications —
            the standard fix when one coarse correction is weak (bench1_3d's
            ratio-5 25³ -> 5³ jump: 169 Krylov/Newton at dt=1.6 reproduced
            on CPU, so the weakness is algorithmic, not TPU-precision)."""
            if kcycle <= 1 or l == len(grids) - 1:
                return vcycle(l, b)
            return mr_accel(l, b, lambda rr: vcycle(l, rr), kcycle)

        def vcycle(l, b):
            jvp, _ = ops[l]
            if l == len(grids) - 1:
                if Jinv_coarse is not None:
                    return dense_coarse[1](Jinv_coarse, b)
                x, _ = smooth(l, tr.zeros_like(b), b, coarse_sweeps)
                return x
            # finest-level-only smoothing override (gmg_nu_fine_pre/post):
            # the 50³ fine level carries ~88% of the per-sweep cost in a
            # dyadic 3D hierarchy
            x, r = smooth(l, tr.zeros_like(b), b,
                          (nu_fine_pre or nu_pre) if l == 0 else nu_pre)
            for _ in range(gamma):
                bc_ = zero_bc_rows(l + 1, Rs[l](r))
                x = tr.add(x, zero_bc_rows(l, Ps[l](coarse_visit(l + 1, bc_))))
                r = tr.sub(b, jvp(x))
            x, _ = smooth(l, x, r,
                          (nu_fine_post or nu_post) if l == 0 else nu_post)
            return x

        def Minv(r):
            b = _cast(r, precond_dtype)
            if inner_mr > 1:
                z = mr_accel(0, b, lambda rr: vcycle(0, rr), inner_mr)
            else:
                z = vcycle(0, b)
            return _cast(z, dtype)

        return Minv

    return build
