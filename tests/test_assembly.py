"""Validate the dense einsum assembly against brute-force sparse FEM."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.fem.assembly import make_functional, make_residual
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid

from fem_reference import BruteForceCrossed

NX, NY, LX, LY = 7, 5, 2.1, 3.3


@pytest.fixture(scope="module")
def setup():
    grid = CrossedTriGrid(NX, NY, LX, LY)
    ref = BruteForceCrossed(NX, NY, LX, LY)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(ref.ndof)
    return grid, ref, x


def _state(ref, x):
    v, m = ref.split(x)
    return jnp.asarray(v)[None], jnp.asarray(m)[None]


def test_mass_apply(setup):
    grid, ref, x = setup
    res = make_residual(grid, lambda ctx: ([ctx.u[0]], [(0.0, 0.0)]), 1)
    rv, rm = res(_state(ref, x), _state(ref, x), 1.0)
    expect = ref.mass_matrix() @ x
    got = ref.join(rv[0], rm[0])
    np.testing.assert_allclose(got, expect, rtol=1e-13, atol=1e-14)


def test_stiffness_apply(setup):
    grid, ref, x = setup
    res = make_residual(grid, lambda ctx: ([0.0], [ctx.du[0]]), 1)
    rv, rm = res(_state(ref, x), _state(ref, x), 1.0)
    expect = ref.stiffness_matrix() @ x
    got = ref.join(rv[0], rm[0])
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-13)


def test_nonlinear_source(setup):
    grid, ref, x = setup
    res = make_residual(grid, lambda ctx: ([ctx.u[0] ** 3 - ctx.u[0]], [(0.0, 0.0)]), 1)
    rv, rm = res(_state(ref, x), _state(ref, x), 1.0)
    expect = ref.nonlinear_source_residual(x, lambda u: u**3 - u)
    got = ref.join(rv[0], rm[0])
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-13)


def test_functional(setup):
    grid, ref, x = setup

    def density(ctx):
        du = ctx.du[0]
        return ctx.u[0] ** 4 + 0.5 * (du[0] ** 2 + du[1] ** 2)

    val = make_functional(grid, density)(_state(ref, x))
    expect = ref.integral(x, lambda u, g2: u**4 + 0.5 * g2)
    np.testing.assert_allclose(float(val), expect, rtol=1e-12)


def test_two_field_coupling(setup):
    """Mixed CH-like structure: field 0 row uses grad of field 1 and vice versa."""
    grid, ref, x = setup
    rng = np.random.default_rng(1)
    y = rng.standard_normal(ref.ndof)

    def terms(ctx):
        src = [ctx.u[0] * ctx.u[1], ctx.u[1]]
        flux = [ctx.du[1], (-2.0 * ctx.du[0][0], -2.0 * ctx.du[0][1])]
        return src, flux

    v = jnp.stack([ref.split(x)[0], ref.split(y)[0]])
    m = jnp.stack([ref.split(x)[1], ref.split(y)[1]])
    rv, rm = make_residual(grid, terms, 2)((v, m), (v, m), 1.0)
    K = ref.stiffness_matrix()
    expect0 = ref.nonlinear_source_residual(np.zeros_like(x), lambda u: 0)  # placeholder
    # row 0: M-weighted source x*y + K @ y
    r0 = np.zeros(ref.ndof)
    pts, wts = ref.rule.points, ref.rule.weights
    lam = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)
    for tri in ref.tris:
        _, _, adet, _ = ref._tri_geom(tri)
        uq = lam @ x[tri]
        vq = lam @ y[tri]
        for k in range(3):
            r0[tri[k]] += np.sum(wts * adet * uq * vq * lam[:, k])
    r0 += K @ y
    r1 = ref.mass_matrix() @ y - 2.0 * (K @ x)
    np.testing.assert_allclose(ref.join(rv[0], rm[0]), r0, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(ref.join(rv[1], rm[1]), r1, rtol=1e-12, atol=1e-13)


def test_node_diagonals(setup):
    grid, ref, _ = setup
    d = grid.node_diagonals()
    M = ref.mass_matrix()
    K = ref.stiffness_matrix()
    np.testing.assert_allclose(
        ref.join(*d["mass"]), M.diagonal(), rtol=1e-13)
    np.testing.assert_allclose(
        ref.join(*d["stiff"]), K.diagonal(), rtol=1e-13)
    np.testing.assert_allclose(
        ref.join(*d["lumped_mass"]), np.asarray(M.sum(axis=1)).ravel(), rtol=1e-12)
