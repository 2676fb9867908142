"""Pointwise block-Jacobi preconditioner, auto-derived from model physics.

Replaces PETSc's SOR preconditioner (dolfin/bench1.py:99). SOR is a
sequential sweep — the worst possible fit for a vector machine — so instead
we build, per grid node, the exact F x F diagonal block of the Jacobian:

    P_node = dsource/du * mass_diag(node) +
             dflux_x/d(du_x) * stiff_xx_diag(node) +
             dflux_y/d(du_y) * stiff_yy_diag(node)

where the pointwise derivative blocks come from ``jax.jvp`` of the model's
``terms`` function with one-hot field tangents (the AD counterpart of UFL's
``derivative``), evaluated at nodal values. Applying the preconditioner is a
batched F x F solve per node — pure VPU work, no sequential dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.assembly import QPContext
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid


def _pointwise_eval(terms, u, dus, u0, dt, shape, dim=2, needs_coords=False):
    """Evaluate (source, flux_0..flux_{dim-1}) stacked [1+dim, F, ...].

    Coordinates are passed as 0.0 when the model wants them: forcing terms
    f(x) don't contribute to the Jacobian diagonal, so their value is
    immaterial for preconditioning.
    """
    n = u.shape[0]
    zeros = jnp.zeros_like(u[0])
    ctx = QPContext(
        u=tuple(u[i] for i in range(n)),
        du=tuple(tuple(dus[d][i] for d in range(dim)) for i in range(n)),
        u0=tuple(u0[i] for i in range(n)),
        du0=tuple(tuple(zeros for _ in range(dim)) for _ in range(n)),
        dt=dt,
        x=0.0 if needs_coords else None,
        y=0.0 if needs_coords else None,
        z=0.0 if (needs_coords and dim == 3) else None,
    )
    s, f = terms(ctx)
    b = lambda z: jnp.broadcast_to(z, shape[1:])
    return jnp.stack(
        [jnp.stack([b(si) for si in s])]
        + [jnp.stack([b(fi[d]) for fi in f]) for d in range(dim)]
    )


def make_block_jacobi(grid: CrossedTriGrid, terms, n_fields: int, dirichlet=(),
                      dtype=jnp.float64, needs_coords: bool = False):
    """Returns ``build(w, w0, dt) -> Minv`` where Minv applies P^-1 pointwise.

    ``needs_coords`` systems get coordinate-independent blocks (coords only
    enter through Dirichlet data / forcing, which don't affect the Jacobian
    diagonal here).
    """
    diags = grid.node_diagonals()

    def _pad(dv, dm):
        """Pad diag arrays to stored shapes with 1.0 so padding blocks are
        well-conditioned (state and residual are zero there anyway)."""
        pv = np.ones(grid.vshape)
        pv[: dv.shape[0], : dv.shape[1]] = dv
        pm = np.ones(grid.mshape)
        pm[: dm.shape[0], : dm.shape[1]] = dm
        return jnp.asarray(pv, dtype), jnp.asarray(pm, dtype)

    mass_v, mass_m = _pad(*diags["mass"])
    sxx_v, sxx_m = _pad(*diags["stiff_xx"])
    syy_v, syy_m = _pad(*diags["stiff_yy"])

    def blocks_for(u_nodal, u0_nodal, dt, mass_d, sxx_d, syy_d):
        """u_nodal [F, Y, X] -> P [Y, X, F, F]."""
        shape = u_nodal.shape
        zer = jnp.zeros_like(u_nodal)

        def f(uu, dx, dy):
            return _pointwise_eval(terms, uu, (dx, dy), u0_nodal, dt, shape,
                                   dim=2, needs_coords=needs_coords)

        cols = []
        for j in range(n_fields):
            e = jnp.zeros_like(u_nodal).at[j].set(1.0)
            _, t_u = jax.jvp(lambda a: f(a, zer, zer), (u_nodal,), (e,))
            _, t_dx = jax.jvp(lambda a: f(u_nodal, a, zer), (zer,), (e,))
            _, t_dy = jax.jvp(lambda a: f(u_nodal, zer, a), (zer,), (e,))
            # column j of P: [F, Y, X]
            col = (t_u[0] * mass_d + t_dx[1] * sxx_d + t_dy[2] * syy_d)
            cols.append(col)
        P = jnp.stack(cols, axis=-1)  # [F, Y, X, F] (row, y, x, col)
        return jnp.moveaxis(P, 0, -2)  # [Y, X, F, F]

    eye = jnp.eye(n_fields, dtype=dtype)

    def small_inv(A):
        """Batched inverse of [..., F, F] via unrolled Gauss-Jordan.

        TPU's LuDecomposition doesn't support f64 (and batched tiny LU is a
        poor fit anyway); unrolled elimination lowers to pure VPU ops. The
        blocks are strongly diagonally dominant (mass/dt on the diagonal), so
        no pivoting is needed.
        """
        n = A.shape[-1]
        aug = jnp.concatenate(
            [A, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)], axis=-1)
        for i in range(n):
            piv = aug[..., i, :] / aug[..., i, i][..., None]
            rows = []
            for r in range(n):
                if r == i:
                    rows.append(piv)
                else:
                    rows.append(aug[..., r, :] - aug[..., r, i][..., None] * piv)
            aug = jnp.stack(rows, axis=-2)
        return aug[..., :, n:]

    def build(w, w0, dt):
        # operate in the preconditioner dtype regardless of state dtype
        v, m = (a.astype(dtype) for a in w)
        v0, m0 = (a.astype(dtype) for a in w0)
        dt = jnp.asarray(dt, dtype)
        Pv = blocks_for(v, v0, dt, mass_v, sxx_v, syy_v)
        Pm = blocks_for(m, m0, dt, mass_m, sxx_m, syy_m)
        # Dirichlet rows are identity (residual row is u - g)
        for bc in dirichlet:
            row = eye[bc.field]
            if bc.side in ("left", "right"):
                Pv = Pv.at[:, bc.index, bc.field, :].set(row)
            else:
                Pv = Pv.at[bc.index, :, bc.field, :].set(row)
        Pv_inv = small_inv(Pv)
        Pm_inv = small_inv(Pm)

        def Minv(r):
            rv, rm = r
            sv = jnp.einsum("yxij,jyx->iyx", Pv_inv, rv)
            sm = jnp.einsum("yxij,jyx->iyx", Pm_inv, rm)
            return sv, sm

        # expose the block inverses as [F, F, Y, X] planes for fused Pallas
        # smoothing kernels (Mosaic cannot lower the einsum layout)
        Minv.pinv_planes = (jnp.transpose(Pv_inv, (2, 3, 0, 1)),
                            jnp.transpose(Pm_inv, (2, 3, 0, 1)))
        return Minv

    return build


def make_block_jacobi3d(grid, terms, n_fields: int, dirichlet=(),
                        dtype=jnp.float64, needs_coords: bool = False):
    """3D single-grid variant of the pointwise block-Jacobi preconditioner."""
    d = grid.node_diagonals()
    Z, Y, X = grid.vshape

    def _pad(a):
        p = np.ones((Z, Y, X))
        p[: a.shape[0], : a.shape[1], : a.shape[2]] = a
        return jnp.asarray(p, dtype)

    mass_d = _pad(d["mass"])
    stiff_d = [_pad(d[f"stiff_{ax}"]) for ax in range(3)]

    def build(w, w0, dt):
        (u_nodal,) = w
        (u0_nodal,) = w0
        u_nodal = u_nodal.astype(dtype)
        u0_nodal = u0_nodal.astype(dtype)
        dt = jnp.asarray(dt, dtype)
        shape = u_nodal.shape
        zer = jnp.zeros_like(u_nodal)

        def f(uu, dx, dy, dz):
            return _pointwise_eval(terms, uu, (dx, dy, dz), u0_nodal, dt,
                                   shape, dim=3, needs_coords=needs_coords)

        cols = []
        for j in range(n_fields):
            e = jnp.zeros_like(u_nodal).at[j].set(1.0)
            _, t_u = jax.jvp(lambda a: f(a, zer, zer, zer), (u_nodal,), (e,))
            col = t_u[0] * mass_d
            for ax in range(3):
                args = [zer, zer, zer]

                def fd(a, ax=ax):
                    dd = [zer, zer, zer]
                    dd[ax] = a
                    return f(u_nodal, *dd)

                _, t_d = jax.jvp(fd, (zer,), (e,))
                col = col + t_d[1 + ax] * stiff_d[ax]
            cols.append(col)
        P = jnp.moveaxis(jnp.stack(cols, axis=-1), 0, -2)  # [Z, Y, X, F, F]
        # Dirichlet rows are identity (residual row is u - g)
        eye = jnp.eye(n_fields, dtype=P.dtype)
        for bc in dirichlet:
            row, f_, i = eye[bc.field], bc.field, bc.index
            ax = bc.face[0]
            if ax == "x":
                P = P.at[:, :, i, f_, :].set(row)
            elif ax == "y":
                P = P.at[:, i, :, f_, :].set(row)
            else:
                P = P.at[i, :, :, f_, :].set(row)

        n = n_fields
        aug = jnp.concatenate(
            [P, jnp.broadcast_to(jnp.eye(n, dtype=P.dtype), P.shape)], axis=-1)
        for i in range(n):
            piv = aug[..., i, :] / aug[..., i, i][..., None]
            rows = []
            for r in range(n):
                if r == i:
                    rows.append(piv)
                else:
                    rows.append(aug[..., r, :] - aug[..., r, i][..., None] * piv)
            aug = jnp.stack(rows, axis=-2)
        P_inv = aug[..., :, n:]

        def Minv(r):
            (rv,) = r
            return (jnp.einsum("zyxij,jzyx->izyx", P_inv, rv),)

        # [F, F, Z, Y, X] planes for the Pallas 3D kernels (ops/pallas3d.py)
        Minv.pinv_planes = jnp.transpose(P_inv, (3, 4, 0, 1, 2))
        return Minv

    return build


def make_identity_precond():
    def build(w, w0, dt):
        return lambda r: r

    return build


def make_dense_precond(grid: CrossedTriGrid, terms, n_fields: int,
                       dirichlet=(), dtype=jnp.float32,
                       needs_coords: bool = False, chunk: int = 512,
                       impl: str = "auto", refine_iters: int = 3):
    """Dense f32 inverse of the full Jacobian — the MXU 'direct solve'.

    For small stiff LINEAR systems (elast's 250×10 thin-beam cantilever,
    ~10.5k dofs) no smoother-based V-cycle converges in the residual norm:
    bending is compliance-dominated (||u||·||A|| / ||b|| ~ 1e6), so a
    coarse-grid interpolation error of h²-relative already dwarfs the
    target residual — measured: FGMRES+GMG flatlined at 2% reduction over
    300 iterations. The reference hit the same wall with SOR and fell back
    to hypre AMG (dolfin/elast.py:83,115-116); on TPU the honest equivalent
    at this size is assembling J column-chunks via vmapped jvp (identity
    tangents generated on the fly — no materialized eye) and one
    row-equilibrated ``jnp.linalg.inv``: ~n³ f32 FLOPs on the MXU.
    FGMRES then polishes the ~5-digit inverse to rtol in a few iterations.
    """
    from pfhubbenchmarks_tpu.fem.assembly import make_residual

    use_lapack = (impl == "lapack" or
                  (impl == "auto" and jax.default_backend() == "cpu"))
    # The mxu path only ever consumes the f32 rounding of J (mxu_inverse
    # factors f32; refine_inverse stores M f32-persistently too), so
    # building the precond Jacobian in f64 buys nothing there and costs
    # 40x on TPU (4.25 s vs 0.10 s at elast's n=10.5k, chain_r21) — f64
    # is EMULATED. LAPACK keeps the Krylov dtype (CPU f64 getrf is
    # direct-solve grade and the build is cheap there).
    build_dtype = dtype if use_lapack else jnp.float32
    residual = make_residual(grid, terms, n_fields, dirichlet=dirichlet,
                             needs_coords=needs_coords, dtype=build_dtype)
    ny, nx = grid.ny, grid.nx
    nvy, nvx = grid.n_vertices_y, grid.n_vertices_x
    Yv, Xv = grid.vshape
    Ym, Xm = grid.mshape
    F = n_fields
    nv = F * nvy * nvx
    n = nv + F * ny * nx
    nchunks = -(-n // chunk)

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

    def build(w, w0, dt):
        w = jax.tree_util.tree_map(lambda a: a.astype(build_dtype), w)
        w0 = jax.tree_util.tree_map(lambda a: a.astype(build_dtype), w0)
        dt = jnp.asarray(dt, build_dtype)
        x0 = flatten(w)
        _, jvp = jax.linearize(lambda x: flatten(
            residual(unflatten(x), w0, dt)), x0)

        def chunk_rows(i):
            rows = i * chunk + jnp.arange(chunk)
            basis = (jnp.arange(n)[None, :]
                     == rows[:, None]).astype(build_dtype)
            return jax.vmap(jvp)(basis)   # [chunk, n] = rows of J^T

        JT = jax.lax.map(chunk_rows, jnp.arange(nchunks))
        J = JT.reshape(nchunks * chunk, n)[:n].T
        d = 1.0 / jnp.maximum(jnp.abs(J).max(axis=1), 1e-30)
        if use_lapack:
            # LAPACK path, column-chunked: inv's blocked triangular-solve
            # temps against the full n x n identity ([~n, n] f32, dozens
            # live under remat) blow memory at elast's n=10522; factor
            # once and back-substitute `chunk` identity columns under
            # lax.map — peak temp [n, chunk].
            from jax.scipy.linalg import lu_factor, lu_solve

            lu_piv = lu_factor(J * d[:, None])

            def inv_cols(i):
                cols = i * chunk + jnp.arange(chunk)
                rhs = (jnp.arange(n)[:, None] == cols[None, :]).astype(dtype)
                return lu_solve(lu_piv, rhs).T   # [chunk, n] = rows of A^T

            AT = jax.lax.map(inv_cols, jnp.arange(nchunks))
            A = AT.reshape(nchunks * chunk, n)[:n].T
        else:
            # TPU (and anything without LAPACK custom calls): XLA expands
            # LU/TriangularSolve with DEFAULT-precision block dots — bf16
            # MXU passes the jax_default_matmul_precision flag does not
            # reach. At elast's cond ~1e6 that returned a <1-digit inverse
            # (measured ||J M r - r||/||r|| = 1.55e-1, chain_r16) and
            # Newton stalled. mxu_inverse is pure HIGHEST-precision
            # matmuls + VPU Gauss-Jordan scans; on the REAL elast Jacobian
            # its f32 no-pivot factor still measured 1.6e-1 (chain_r19),
            # so the factor is ONLY a Newton–Schulz seed: 3 refinement
            # passes with f64 arithmetic in column blocks (2 n^3 matmuls
            # each, one-time build cost; f32-persistent storage — the
            # whole-matrix f64 version OOMed the v5e's 15.75 GB HBM at
            # elast's n=10.5k) square that to LAPACK-f32 application
            # quality (~7e-4 on the cond-1e6 test class), which the f64
            # FGMRES above polishes in a handful of iterations.
            from pfhubbenchmarks_tpu.solve.mxu_inverse import (
                mxu_inverse, refine_inverse)

            Jd = J * d[:, None]
            A = mxu_inverse(Jd.astype(jnp.float32))
            if refine_iters:
                A = refine_inverse(Jd, A, iters=refine_iters)

        def Minv(r):
            # apply in A's own dtype: under full-f64 FGMRES (elast) the
            # promoted ``f32 A @ f64 r`` ran the n² matvec in EMULATED f64
            # every iteration for nothing — M's application quality is
            # f32-class regardless (raw factor ~1.6e-1, refined ~7e-4), so
            # rounding r to f32 (6e-8 rel) is invisible and FGMRES's
            # flexibility absorbs it. LAPACK/CPU builds keep A at the
            # Krylov dtype — no-op there.
            x = d.astype(A.dtype) * flatten(r).astype(A.dtype)
            return unflatten((A @ x).astype(dtype))

        return Minv

    return build


BUILDERS = {"none": lambda *a, **k: make_identity_precond(),
            "block_jacobi": make_block_jacobi,
            "dense": make_dense_precond}
