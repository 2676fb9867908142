"""Brute-force scipy reference FEM on the crossed-triangle mesh.

Independent implementation path (explicit global dof numbering + sparse
matrices) used to validate the dense einsum assembly in fem/assembly.py.
Mirrors the DOLFIN mesh structure: grid vertices numbered row-major first,
then cell centers (so cells list the center vertex last after DOLFIN's
ascending-index ordering).
"""

import numpy as np
import scipy.sparse as sp

from pfhubbenchmarks_tpu.fem.grid import _SLOT_XY, _TRIS
from pfhubbenchmarks_tpu.fem.quadrature import get_rule


class BruteForceCrossed:
    def __init__(self, nx, ny, Lx, Ly, rule="ffc3"):
        self.nx, self.ny, self.Lx, self.Ly = nx, ny, Lx, Ly
        self.hx, self.hy = Lx / nx, Ly / ny
        self.nv = (nx + 1) * (ny + 1)
        self.ndof = self.nv + nx * ny
        self.rule = get_rule(rule)
        # coordinates
        self.coords = np.zeros((self.ndof, 2))
        for j in range(ny + 1):
            for i in range(nx + 1):
                self.coords[j * (nx + 1) + i] = (i * self.hx, j * self.hy)
        for j in range(ny):
            for i in range(nx):
                self.coords[self.nv + j * nx + i] = ((i + 0.5) * self.hx, (j + 0.5) * self.hy)
        # triangle list: per cell, 4 triangles of global dof triples
        tris = []
        for j in range(ny):
            for i in range(nx):
                slot2glob = [
                    j * (nx + 1) + i,
                    j * (nx + 1) + i + 1,
                    (j + 1) * (nx + 1) + i + 1,
                    (j + 1) * (nx + 1) + i,
                    self.nv + j * nx + i,
                ]
                for t in range(4):
                    tris.append([slot2glob[s] for s in _TRIS[t]])
        self.tris = np.array(tris)

    def _tri_geom(self, tri):
        v = self.coords[tri]
        J = np.stack([v[1] - v[0], v[2] - v[0]], axis=1)
        detJ = np.linalg.det(J)
        G = np.linalg.inv(J).T @ np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]).T  # [2,3]
        return v, J, abs(detJ), G.T  # G rows = grad lambda_k

    def mass_matrix(self):
        A = sp.lil_matrix((self.ndof, self.ndof))
        Me = np.array([[2, 1, 1], [1, 2, 1], [1, 1, 2]]) / 12.0
        for tri in self.tris:
            _, _, adet, _ = self._tri_geom(tri)
            area = adet / 2.0
            for a in range(3):
                for b in range(3):
                    A[tri[a], tri[b]] += area * Me[a, b]
        return A.tocsr()

    def stiffness_matrix(self):
        A = sp.lil_matrix((self.ndof, self.ndof))
        for tri in self.tris:
            _, _, adet, G = self._tri_geom(tri)
            area = adet / 2.0
            Ke = area * (G @ G.T)
            for a in range(3):
                for b in range(3):
                    A[tri[a], tri[b]] += Ke[a, b]
        return A.tocsr()

    def nonlinear_source_residual(self, u, g):
        """r_k = sum_tris sum_q w |det| g(u(xq)) lambda_k(xq), same rule."""
        r = np.zeros(self.ndof)
        pts, wts = self.rule.points, self.rule.weights
        lam = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)
        for tri in self.tris:
            _, _, adet, _ = self._tri_geom(tri)
            uq = lam @ u[tri]
            gq = g(uq)
            for k in range(3):
                r[tri[k]] += np.sum(wts * adet * gq * lam[:, k])
        return r

    def integral(self, u, e):
        """integral of e(u, |grad u|^2) over the mesh with the same rule."""
        total = 0.0
        pts, wts = self.rule.points, self.rule.weights
        lam = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)
        for tri in self.tris:
            _, _, adet, G = self._tri_geom(tri)
            uq = lam @ u[tri]
            du = G.T @ u[tri]
            total += np.sum(wts * adet * e(uq, float(du @ du)))
        return total

    def split(self, x):
        """flat dof vector -> (v [ny+1, nx+1], m [ny, nx])."""
        v = x[: self.nv].reshape(self.ny + 1, self.nx + 1)
        m = x[self.nv:].reshape(self.ny, self.nx)
        return v, m

    def join(self, v, m):
        return np.concatenate([np.asarray(v).ravel(), np.asarray(m).ravel()])
