"""3D tet assembly vs brute-force sparse FEM + bench1_3d physics checks."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from pfhubbenchmarks_tpu.fem.assembly3d import make_functional3d, make_residual3d
from pfhubbenchmarks_tpu.fem.grid3d import _SLOT_XYZ, _TETS, TetGrid
from pfhubbenchmarks_tpu.fem.quadrature import (
    fiat_collapsed_tet, tet_monomial_integral)

NX, NY, NZ = 4, 3, 2
LX, LY, LZ = 2.0, 1.5, 1.0


def test_tet_rule_exactness():
    r = fiat_collapsed_tet(2)  # ffc3
    for a in range(4):
        for b in range(4 - a):
            for c in range(4 - a - b):
                approx = np.sum(r.weights * r.points[:, 0] ** a
                                * r.points[:, 1] ** b * r.points[:, 2] ** c)
                exact = tet_monomial_integral(a, b, c)
                assert abs(approx - exact) < 1e-14, (a, b, c)


class BruteTet:
    def __init__(self):
        g = TetGrid(NX, NY, NZ, LX, LY, LZ)
        self.g = g
        nvx, nvy, nvz = NX + 1, NY + 1, NZ + 1
        self.ndof = nvx * nvy * nvz
        self.coords = np.zeros((self.ndof, 3))
        idx = lambda i, j, k: (k * nvy + j) * nvx + i
        for k in range(nvz):
            for j in range(nvy):
                for i in range(nvx):
                    self.coords[idx(i, j, k)] = (i * g.hx, j * g.hy, k * g.hz)
        tets = []
        for k in range(NZ):
            for j in range(NY):
                for i in range(NX):
                    glob = [idx(i + d[0], j + d[1], k + d[2]) for d in _SLOT_XYZ]
                    for t in _TETS:
                        tets.append([glob[s] for s in t])
        self.tets = np.array(tets)

    def matrices(self):
        M = sp.lil_matrix((self.ndof, self.ndof))
        K = sp.lil_matrix((self.ndof, self.ndof))
        Me = (np.ones((4, 4)) + np.eye(4)) / 20.0
        gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
        for tet in self.tets:
            v = self.coords[tet]
            J = np.stack([v[1] - v[0], v[2] - v[0], v[3] - v[0]], axis=1)
            vol = abs(np.linalg.det(J)) / 6.0
            G = gref @ np.linalg.inv(J)
            for a in range(4):
                for b in range(4):
                    M[tet[a], tet[b]] += vol * Me[a, b]
                    K[tet[a], tet[b]] += vol * (G[a] @ G[b])
        return M.tocsr(), K.tocsr()

    def split(self, x):
        return x.reshape(NZ + 1, NY + 1, NX + 1)


@pytest.fixture(scope="module")
def setup():
    ref = BruteTet()
    M, K = ref.matrices()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(ref.ndof)
    return ref, M, K, x


def test_mass_and_stiffness_3d(setup):
    ref, M, K, x = setup
    w = (jnp.asarray(ref.split(x))[None],)
    res_m = make_residual3d(ref.g, lambda ctx: ([ctx.u[0]], [(0.0, 0.0, 0.0)]), 1)
    (rv,) = res_m(w, w, 1.0)
    np.testing.assert_allclose(np.asarray(rv[0]).ravel(), M @ x, rtol=1e-12, atol=1e-13)
    res_k = make_residual3d(ref.g, lambda ctx: ([0.0], [ctx.du[0]]), 1)
    (rv,) = res_k(w, w, 1.0)
    np.testing.assert_allclose(np.asarray(rv[0]).ravel(), K @ x, rtol=1e-11, atol=1e-12)


def test_functional_3d(setup):
    ref, M, K, x = setup
    w = (jnp.asarray(ref.split(x))[None],)
    val = make_functional3d(ref.g, lambda ctx: ctx.u[0])(w)
    # integral of u = ones^T M u
    np.testing.assert_allclose(float(val), np.ones(ref.ndof) @ (M @ x), rtol=1e-12)


def test_node_diagonals_3d(setup):
    ref, M, K, x = setup
    d = ref.g.node_diagonals()
    np.testing.assert_allclose(d["mass"].ravel(), M.diagonal(), rtol=1e-12)
    stot = d["stiff_0"] + d["stiff_1"] + d["stiff_2"]
    np.testing.assert_allclose(stot.ravel(), K.diagonal(), rtol=1e-12)


def test_bench1_3d_short_run():
    from pfhubbenchmarks_tpu import timeloop
    from pfhubbenchmarks_tpu.benchmarks.bench1_3d import make

    problem = make(nx=8, ny=8, nz=8)
    res = timeloop.run(problem, max_steps=5, verbose=False)
    solute = res.rows[:, 2]
    np.testing.assert_allclose(solute, solute[0], rtol=1e-10)
    tfe = res.rows[:, 1]
    assert (np.diff(tfe) < 0).all()
