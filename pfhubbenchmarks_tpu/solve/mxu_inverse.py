"""Dense matrix inversion from pure MXU matmuls + VPU scans.

Why this exists: on TPU, ``jnp.linalg.inv`` / ``lu_factor`` / ``lu_solve``
lower to XLA's LU + TriangularSolve, and XLA's internal expanders emit
their block dots at DEFAULT precision — bf16 MXU passes that
``jax_default_matmul_precision=highest`` does NOT reach (the flag only
covers dots JAX itself emits; the same failure mode as the documented
f32-einsum collapse, CLAUDE.md). For a well-conditioned matrix that loses
a few digits; for elast's thin-beam Jacobian (cond ~1e6 after row
equilibration) it destroys the inverse: measured on the v5e,
``||J M r - r||/||r||`` = 1.55e-1 — less than one digit per application,
~100x worse than the same build on CPU LAPACK — and elast's Newton
stalled at its first step, |F| floored at 1.2e-3 (chain_r15/chain_r16
probe logs).

This module re-implements LAPACK's getri shape with ONLY
``jnp.dot(..., precision=HIGHEST)`` (true-f32 MXU passes) and unblocked
``lax.scan`` kernels (VPU rank-1 / substitution steps, exact f32):

  1. recursive blocked LU without pivoting (factors kept, packed),
  2. recursive triangular inversions of L (unit-lower) and U,
  3. inv(M) = inv(U) @ inv(L).

The substitution structure matters: a first attempt used the partitioned
Schur-complement INVERSE recursion (inv from block inverses), whose
forward error compounds like cond^2 — measured residual 3.4 at cond 1e6
vs LAPACK f32's 7.5e-4 on the same matrix (tests/test_mxu_inverse.py
keeps that case). The getri shape stays eps*cond-class.

No pivoting: correct for the row-equilibrated FEM Jacobians this repo
inverts (symmetric-positive-definite stiffness cores with identity
Dirichlet rows — every leading principal minor nonsingular, bounded
Gauss growth). Not a general-purpose inverse.

All recursion is traced statically (depth log2(n/base)); total cost is a
small multiple of one n^3 matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_HI)


def _lu_unblocked(A):
    """Packed no-pivot LU by rank-1 scan: strict lower = L, upper = U."""
    n = A.shape[0]
    idx = jnp.arange(n)

    def step(M, k):
        below = idx > k
        mult = jnp.where(below, M[:, k] / M[k, k], 0.0)
        rowU = jnp.where(idx >= k, M[k], 0.0)
        M = M - mult[:, None] * rowU[None, :]
        return M.at[:, k].set(jnp.where(below, mult, M[:, k])), None

    F, _ = jax.lax.scan(step, A, jnp.arange(n))
    return F


def _inv_upper_unblocked(F):
    """inv of the upper triangle of packed F, by back-substitution scan."""
    n = F.shape[0]
    U = jnp.triu(F)
    idx = jnp.arange(n)

    def step(X, k):
        row = jnp.where(idx > k, U[k], 0.0)
        x = ((idx == k).astype(U.dtype) - _dot(row, X)) / U[k, k]
        return X.at[k].set(x), None

    X, _ = jax.lax.scan(step, jnp.zeros_like(U), jnp.arange(n - 1, -1, -1))
    return X


def _inv_unit_lower_unblocked(F):
    """inv of the unit-lower triangle of packed F, forward substitution."""
    n = F.shape[0]
    L = jnp.tril(F, -1)
    idx = jnp.arange(n)

    def step(X, k):
        row = jnp.where(idx < k, L[k], 0.0)
        x = (idx == k).astype(L.dtype) - _dot(row, X)
        return X.at[k].set(x), None

    X, _ = jax.lax.scan(step, jnp.zeros_like(L), jnp.arange(n))
    return X


def _split(n, base):
    """Largest multiple of ``base`` at or below n/2 (n is a multiple)."""
    return max(base, (n // 2) // base * base)


def _lu(A, base):
    if A.shape[0] <= base:
        return _lu_unblocked(A)
    m = _split(A.shape[0], base)
    F11 = _lu(A[:m, :m], base)
    U12 = _dot(_inv_unit_lower(F11, base), A[:m, m:])
    L21 = _dot(A[m:, :m], _inv_upper(F11, base))
    F22 = _lu(A[m:, m:] - _dot(L21, U12), base)
    return jnp.concatenate(
        [jnp.concatenate([F11, U12], axis=1),
         jnp.concatenate([L21, F22], axis=1)], axis=0)


def _inv_upper(F, base):
    if F.shape[0] <= base:
        return _inv_upper_unblocked(F)
    m = _split(F.shape[0], base)
    X11 = _inv_upper(F[:m, :m], base)
    X22 = _inv_upper(F[m:, m:], base)
    X12 = -_dot(X11, _dot(F[:m, m:], X22))
    return jnp.concatenate(
        [jnp.concatenate([X11, X12], axis=1),
         jnp.concatenate([jnp.zeros_like(F[m:, :m]), X22], axis=1)], axis=0)


def _inv_unit_lower(F, base):
    if F.shape[0] <= base:
        return _inv_unit_lower_unblocked(F)
    m = _split(F.shape[0], base)
    X11 = _inv_unit_lower(F[:m, :m], base)
    X22 = _inv_unit_lower(F[m:, m:], base)
    X21 = -_dot(X22, _dot(F[m:, :m], X11))
    return jnp.concatenate(
        [jnp.concatenate([X11, jnp.zeros_like(F[:m, m:])], axis=1),
         jnp.concatenate([X21, X22], axis=1)], axis=0)


def refine_inverse(M, X, iters: int = 3, chunk: int = 2048):
    """Newton–Schulz refinement of an approximate f32 inverse.

    ``X <- X + X (I - M X)`` squares the residual ``E = I - M X`` each
    iteration — but ONLY if E is computed above the working-precision
    noise: with f32 residual arithmetic the iteration floors immediately
    at eps32·cond-class E (measured: the cond-1e6 test matrix stalls at
    fro(E) ~ 0.28, quality stuck at 7e-3). With f64 arithmetic the same
    seed contracts quadratically (fro(E) 0.38 -> 4e-3 -> 6e-7 measured),
    and the f32-rounded result lands at LAPACK-f32 quality (~7e-4
    application residual) — two decades past what the raw no-pivot factor
    delivers on the real elast Jacobian (1.6e-1, chain_r19).

    Memory layout matters at elast scale (n ~ 10.7k: one f64 n×n matrix
    is 0.93 GB, and a whole-matrix f64 implementation OOMed the v5e's
    15.75 GB HBM at 23.8 GB in the full build program). So M and X stay
    f32 PERSISTENTLY; each pass upcasts them once (transients) and runs
    the two products f64 in ``chunk``-column blocks under ``lax.map`` —
    peak extra footprint ~2 f64 matrices, not 7.

    Divergence guard: Newton–Schulz contracts only while the spectral
    radius of E is below 1; a bad mode would grow quadratically instead.
    Each pass measures fro(E) and the update is kept only if it reduced
    it, so refinement never hands back something worse than its input
    (and once a pass is rejected the iterate stays fixed). Returns f32.
    Requires x64 enabled (as the solver stack always is).
    """
    n = M.shape[0]
    M = M.astype(jnp.float32)
    X = X.astype(jnp.float32)
    npad = -(-n // chunk) * chunk
    if npad != n:
        # identity-tail padding: the pad block's inverse is itself, its
        # residual block is exactly zero, and it never couples to the
        # leading n×n block
        pad = npad - n

        def _padded(A):
            return jnp.concatenate(
                [jnp.concatenate([A, jnp.zeros((n, pad), A.dtype)], axis=1),
                 jnp.concatenate([jnp.zeros((pad, n), A.dtype),
                                  jnp.eye(pad, dtype=A.dtype)], axis=1)],
                axis=0)

        M, X = _padded(M), _padded(X)
    nchunks = npad // chunk
    rows = jnp.arange(npad)

    def ns_pass(X32):
        """One f64 Newton–Schulz pass in column blocks.

        Returns (X_new f32, fro²(E) BEFORE the update) — the residual is
        a byproduct of the update, so the guard costs nothing extra.
        """
        M64 = M.astype(jnp.float64)
        X64 = X32.astype(jnp.float64)

        def body(i):
            c0 = i * chunk
            Xb = jax.lax.dynamic_slice(X64, (0, c0), (npad, chunk))
            Ib = ((rows[:, None] - c0) == jnp.arange(chunk)[None, :]
                  ).astype(jnp.float64)
            Eb = Ib - _dot(M64, Xb)
            Ub = _dot(X64, Eb)
            return (Xb + Ub).astype(jnp.float32), jnp.vdot(Eb, Eb)

        blocks, fro2 = jax.lax.map(body, jnp.arange(nchunks))
        X_new = jnp.moveaxis(blocks, 0, 1).reshape(npad, npad)
        return X_new, jnp.sum(fro2)

    # fro²(E) of the final iterate, for the last acceptance test
    def resid2(X32):
        M64 = M.astype(jnp.float64)
        X64 = X32.astype(jnp.float64)

        def body(i):
            c0 = i * chunk
            Xb = jax.lax.dynamic_slice(X64, (0, c0), (npad, chunk))
            Ib = ((rows[:, None] - c0) == jnp.arange(chunk)[None, :]
                  ).astype(jnp.float64)
            Eb = Ib - _dot(M64, Xb)
            return jnp.vdot(Eb, Eb)

        return jnp.sum(jax.lax.map(body, jnp.arange(nchunks)))

    # best-iterate selection: each ns_pass measures the residual of its
    # INPUT as a byproduct, so iterates 0..iters-1 are scored for free and
    # only the final iterate pays one extra residual sweep
    best_X, best_fro2 = None, None
    for _ in range(iters):
        X_new, fro2 = ns_pass(X)
        if best_X is None:
            best_X, best_fro2 = X, fro2
        else:
            ok = fro2 < best_fro2
            best_X = jnp.where(ok, X, best_X)
            best_fro2 = jnp.where(ok, fro2, best_fro2)
        X = X_new
    if iters:
        fro2 = resid2(X)
        ok = fro2 < best_fro2
        X = jnp.where(ok, X, best_X)
    return X[:n, :n]


def mxu_inverse(M, base: int = 256):
    """inv(M) for square M; see module docstring for scope + stability."""
    n = M.shape[0]
    npad = -(-n // base) * base if n > base else n
    if npad != n:
        # pad to a block multiple with an identity tail: the factorization
        # and both triangular inverses are block-diagonal across the pad,
        # so the top-left n x n of the padded inverse IS inv(M)
        M = jnp.concatenate(
            [jnp.concatenate([M, jnp.zeros((n, npad - n), M.dtype)], axis=1),
             jnp.concatenate([jnp.zeros((npad - n, n), M.dtype),
                              jnp.eye(npad - n, dtype=M.dtype)], axis=1)],
            axis=0)
    F = _lu(M, base)
    A = _dot(_inv_upper(F, base), _inv_unit_lower(F, base))
    return A[:n, :n]
