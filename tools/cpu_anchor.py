"""Measured single-rank CPU anchor for the BM1 baseline denominator.

bench.py's ``vs_baseline`` divides by an ESTIMATED 60 s for the canonical
``mpirun -np 8 python dolfin/bench1.py`` (no BM1 wall-clock is recorded in
the reference, and FEniCS is not installed here — BASELINE.md). Round-2
VERDICT (missing item 6) asked for a measured anchor to pin that estimate.

This script IS that anchor: a conventional assembled-sparse-matrix
implementation of the identical problem — same crossed-P1 discretization
(100x100 cells, reference dolfin/bench1.py:21-23), same 4-point quadrature
class (form_compiler quadrature_degree=3, bench1.py:16), same implicit
Euler + SNES-style Newton (atol 1e-6, max 10 iterations, bench1.py:87-88)
with per-iteration Jacobian assembly, and the reference's exact adaptive-dt
controller (dt0=0.1, niters<5 -> dt*=2 else dt/2, failure -> dt/2 + retry,
dt_min=1e-2, end_time=1e3; bench1.py:139-183) — built on scipy CSR the way
a single-rank PETSc/DOLFIN run is built on assembled AIJ matrices.

Two linear-solver modes, the anchor takes the FASTER (conservative for the
TPU comparison):
  --linear splu   direct sparse LU each Newton iteration (superLU; the
                  strongest conventional single-rank choice at 40k dofs)
  --linear gmres  restarted GMRES + ILU(0)-class spilu preconditioner each
                  iteration (the iterative mirror of the reference's
                  GMRES+SOR, bench1.py:98-99)

Correctness cross-check: the first emitted rows must match
/root/reference/results/bench1_out.csv (TFE ~297.30 at t=0.1, solute
20504.469) — printed at the end against the golden CSV when present.

Run:  python tools/cpu_anchor.py [--linear splu|gmres] [--end-time 1000]
"""

import argparse
import json
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# PFHub BM1 constants (reference dolfin/bench1.py:30-36)
C_ALPHA, C_BETA, RHO_S, KAPPA, MOB = 0.3, 0.7, 5.0, 2.0, 5.0
LX = LY = 200.0
NX = NY = 100

# Dunavant degree-3 4-point triangle rule (the FFC choice for
# quadrature_degree=3): barycentric points / weights (sum 1/2).
_QP = np.array([[1 / 3, 1 / 3, 1 / 3],
                [0.6, 0.2, 0.2],
                [0.2, 0.6, 0.2],
                [0.2, 0.2, 0.6]])
_QW = np.array([-27 / 48, 25 / 48, 25 / 48, 25 / 48]) * 0.5


def build_mesh():
    """Crossed-triangle mesh: vertices + cell centers, 4 tris per cell."""
    xs = np.linspace(0.0, LX, NX + 1)
    ys = np.linspace(0.0, LY, NY + 1)
    vx, vy = np.meshgrid(xs, ys)                      # (NY+1, NX+1)
    cx = 0.5 * (xs[:-1] + xs[1:])
    cy = 0.5 * (ys[:-1] + ys[1:])
    mx, my = np.meshgrid(cx, cy)                      # (NY, NX)
    coords = np.concatenate(
        [np.stack([vx.ravel(), vy.ravel()], 1),
         np.stack([mx.ravel(), my.ravel()], 1)])
    nv = (NX + 1) * (NY + 1)

    def vid(i, j):
        return i * (NX + 1) + j

    ii, jj = np.meshgrid(np.arange(NY), np.arange(NX), indexing="ij")
    a = vid(ii, jj).ravel()
    b = vid(ii, jj + 1).ravel()
    c = vid(ii + 1, jj + 1).ravel()
    d = vid(ii + 1, jj).ravel()
    m = (nv + ii * NX + jj).ravel()
    tris = np.concatenate([np.stack([a, b, m], 1), np.stack([b, c, m], 1),
                           np.stack([c, d, m], 1), np.stack([d, a, m], 1)])
    return coords, tris


def element_tabs(coords, tris):
    """Per-triangle P1 gradients (constant) and areas, vectorized."""
    p = coords[tris]                                  # (nt, 3, 2)
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    detJ = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    area = 0.5 * np.abs(detJ)
    # grad of barycentric basis: lambda_k gradient from the cofactor rows
    g = np.empty((len(tris), 3, 2))
    g[:, 1, 0] = e2[:, 1] / detJ
    g[:, 1, 1] = -e2[:, 0] / detJ
    g[:, 2, 0] = -e1[:, 1] / detJ
    g[:, 2, 1] = e1[:, 0] / detJ
    g[:, 0] = -g[:, 1] - g[:, 2]
    return g, area


def assemble_constant(coords, tris, g, area):
    """Constant CSR matrices: consistent mass M and stiffness K."""
    nn = len(coords)
    rows = np.repeat(tris, 3, axis=1).ravel()         # (nt*9,)
    cols = np.tile(tris, (1, 3)).ravel()
    # mass: exact P1 integral area/12 * (1 + delta_ij)
    me = (np.ones((3, 3)) + np.eye(3)) / 12.0
    Mdat = (area[:, None, None] * me).ravel()
    Ke = np.einsum("eid,ejd->eij", g, g) * area[:, None, None]
    M = sp.coo_matrix((Mdat, (rows, cols)), shape=(nn, nn)).tocsr()
    K = sp.coo_matrix((Ke.ravel(), (rows, cols)), shape=(nn, nn)).tocsr()
    return M, K, rows, cols


def fchem(c):
    return RHO_S * (c - C_ALPHA) ** 2 * (C_BETA - c) ** 2


def dfdc(c):
    return 2.0 * RHO_S * (c - C_ALPHA) * (C_BETA - c) * (C_BETA + C_ALPHA
                                                         - 2.0 * c)


def d2fdc2(c):
    w = C_BETA + C_ALPHA - 2.0 * c
    return 2.0 * RHO_S * (w * w - 2.0 * (c - C_ALPHA) * (C_BETA - c))


class Assembler:
    """Per-Newton-iteration nonlinear assembly (vector b_f and weighted
    mass M_fpp) over the 4-point rule — the conventional reassembly cost a
    PETSc/DOLFIN run pays every SNES iteration."""

    def __init__(self, coords, tris, g, area, rows, cols):
        self.tris, self.area = tris, area
        self.rows, self.cols = rows, cols
        self.nn = len(coords)
        self.B = _QP                                   # (nq, 3) P1 values
        self.wA = _QW[None, :] * (2.0 * area[:, None])  # (nt, nq)

    def nonlinear(self, c):
        ce = c[self.tris]                              # (nt, 3)
        cq = ce @ self.B.T                             # (nt, nq)
        fq = dfdc(cq) * self.wA
        bf = np.zeros(self.nn)
        np.add.at(bf, self.tris.ravel(),
                  (fq @ self.B).ravel())               # (nt,3) scatter
        fpp = d2fdc2(cq) * self.wA                     # (nt, nq)
        Me = np.einsum("eq,qi,qj->eij", fpp, self.B, self.B)
        Mfpp = sp.coo_matrix((Me.ravel(), (self.rows, self.cols)),
                             shape=(self.nn, self.nn)).tocsr()
        return bf, Mfpp

    def observables(self, c, g):
        ce = c[self.tris]
        cq = ce @ self.B.T
        tfe_bulk = float((fchem(cq) * self.wA).sum())
        gradc = np.einsum("ei,eid->ed", ce, g)         # constant per tri
        tfe_grad = float(
            (0.5 * KAPPA * (gradc ** 2).sum(1) * self.area).sum())
        solute = float((cq * self.wA).sum())
        return tfe_bulk + tfe_grad, solute


def initial_c(coords):
    x, y = coords[:, 0], coords[:, 1]
    return 0.5 + 0.05 * (np.cos(0.105 * x) * np.cos(0.11 * y)
                         + (np.cos(0.13 * x) * np.cos(0.087 * y)) ** 2
                         + np.cos(0.025 * x - 0.15 * y)
                         * np.cos(0.07 * x - 0.02 * y))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--linear", choices=("splu", "gmres"), default="splu")
    ap.add_argument("--end-time", type=float, default=1000.0)
    ap.add_argument("--max-steps", type=int, default=10_000)
    args = ap.parse_args()

    coords, tris = build_mesh()
    g, area = element_tabs(coords, tris)
    M, K, rows, cols = assemble_constant(coords, tris, g, area)
    asm = Assembler(coords, tris, g, area, rows, cols)
    nn = len(coords)

    c = initial_c(coords)
    mu = np.zeros(nn)
    Mdt_template = M.tocsr()
    MobK = (MOB * K).tocsr()
    kK = (KAPPA * K).tocsr()

    def residual(c, mu, c0, dt):
        Fc = Mdt_template @ ((c - c0) / dt) + MobK @ mu
        bf, Mfpp = asm.nonlinear(c)
        Fmu = M @ mu - bf - kK @ c
        return np.concatenate([Fc, Fmu]), Mfpp

    def jacobian(Mfpp, dt):
        return sp.bmat([[M / dt, MobK],
                        [-(Mfpp + kK), M]], format="csc")

    stats = {"newton": 0, "linear_iters": 0, "factor_s": 0.0,
             "assemble_s": 0.0}

    def newton(c, mu, c0, dt):
        for it in range(10):
            t_a = time.time()
            F, Mfpp = residual(c, mu, c0, dt)
            stats["assemble_s"] += time.time() - t_a
            if np.linalg.norm(F) < 1e-6:               # SNES atol 1e-6
                return c, mu, it, True
            J = jacobian(Mfpp, dt)
            t_f = time.time()
            if args.linear == "splu":
                delta = spla.splu(J).solve(-F)
            else:
                ilu = spla.spilu(J, drop_tol=1e-5, fill_factor=20)
                n_it = [0]

                def cb(_):
                    n_it[0] += 1

                delta, info = spla.gmres(
                    J, -F, rtol=1e-5, restart=30, maxiter=1000,
                    M=spla.LinearOperator(J.shape, ilu.solve),
                    callback=cb, callback_type="pr_norm")
                stats["linear_iters"] += n_it[0]
                if info != 0:
                    return c, mu, it + 1, False
            stats["factor_s"] += time.time() - t_f
            c = c + delta[:nn]
            mu = mu + delta[nn:]
            stats["newton"] += 1
        F, _ = residual(c, mu, c0, dt)
        return c, mu, 10, bool(np.linalg.norm(F) < 1e-6)

    # reference controller (dolfin/bench1.py:139-183)
    t, dt, dt_min = 0.0, 0.1, 1e-2
    steps = retries = 0
    t0 = time.time()
    rows_out = []
    while t < args.end_time - 1e-12 and steps < args.max_steps:
        c0v = c.copy()
        mu0 = mu.copy()
        cn, mun, niters, ok = newton(c, mu, c0v, dt)
        while not ok:
            retries += 1
            dt = max(0.5 * dt, dt_min)
            cn, mun, niters, ok = newton(c0v.copy(), mu0.copy(), c0v, dt)
        c, mu = cn, mun
        t += dt
        steps += 1
        tfe, solute = asm.observables(c, g)
        rows_out.append((t, tfe, solute))
        dt = 2.0 * dt if niters < 5 else max(0.5 * dt, dt_min)
    wall = time.time() - t0

    out = {"metric": "bench1_cpu_anchor_wall", "value": round(wall, 2),
           "unit": "seconds", "linear": args.linear, "steps": steps,
           "retries": retries, "final_time": round(t, 3), **stats}
    for k in ("factor_s", "assemble_s"):
        out[k] = round(out[k], 2)
    try:
        ref = np.loadtxt("/root/reference/results/bench1_out.csv",
                         delimiter=",", skiprows=1)
        n = min(len(rows_out), len(ref))
        ours = np.array(rows_out)
        match = np.isclose(ours[:n, 0], ref[:n, 0], rtol=1e-9)
        k = int(np.argmin(match)) if not match.all() else n
        if k:
            out["matched_time_rows"] = k
            out["tfe_relerr_matched"] = float(
                (np.abs(ours[:k, 1] - ref[:k, 1]) / ref[:k, 1]).max())
            out["solute_relerr_row0"] = float(
                abs(ours[0, 2] - ref[0, 2]) / ref[0, 2])
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
