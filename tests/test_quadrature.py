"""Quadrature rule exactness checks."""

import numpy as np
import pytest

from pfhubbenchmarks_tpu.fem import quadrature as q


@pytest.mark.parametrize(
    "name,maxdeg",
    [("ffc3", 3), ("fiat3", 5), ("dunavant1", 1), ("dunavant2", 2),
     ("dunavant3", 3), ("dunavant4", 4), ("dunavant5", 5)],
)
def test_monomial_exactness(name, maxdeg):
    r = q.get_rule(name)
    for a in range(maxdeg + 1):
        for b in range(maxdeg + 1 - a):
            approx = np.sum(r.weights * r.points[:, 0] ** a * r.points[:, 1] ** b)
            exact = q.monomial_integral(a, b)
            assert abs(approx - exact) < 1e-13 * max(1.0, abs(exact)), (name, a, b)


def test_weights_sum_to_area():
    for name in ["ffc3", "dunavant4"]:
        r = q.get_rule(name)
        assert abs(r.weights.sum() - 0.5) < 1e-14


def test_points_inside_triangle():
    for name in ["ffc3", "dunavant5"]:
        r = q.get_rule(name)
        x, y = r.points[:, 0], r.points[:, 1]
        assert (x >= 0).all() and (y >= 0).all() and (x + y <= 1 + 1e-14).all()


def test_gauss_jacobi_against_exact():
    # integral of (1-x)^1 * x^k over [-1,1] weight: check degree-3 polys with n=2
    x, w = q.gauss_jacobi(2, 1.0, 0.0)
    for k in range(4):
        approx = np.sum(w * x**k)
        # exact: int_{-1}^{1} (1-t) t^k dt
        exact = (1 - (-1) ** (k + 1)) / (k + 1) - (1 - (-1) ** (k + 2)) / (k + 2)
        assert abs(approx - exact) < 1e-14


def test_keast_tet_rules_exactness():
    """keast1 integrates linears exactly, keast2 quadratics (the
    preconditioner-rule requirement for P1 stiffness/mass rediscretization)."""
    import numpy as np

    from pfhubbenchmarks_tpu.fem.quadrature import (get_tet_rule,
                                                    tet_monomial_integral)

    for name, deg in (("keast1", 1), ("keast2", 2)):
        r = get_tet_rule(name)
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                for c in range(deg + 1 - a - b):
                    got = float(np.sum(
                        r.weights * r.points[:, 0] ** a
                        * r.points[:, 1] ** b * r.points[:, 2] ** c))
                    np.testing.assert_allclose(
                        got, tet_monomial_integral(a, b, c),
                        rtol=1e-13, err_msg=f"{name} x^{a} y^{b} z^{c}")
