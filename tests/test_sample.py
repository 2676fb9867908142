"""Point sampling: 2D crossed grid + 3D Kuhn tets."""

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
from pfhubbenchmarks_tpu.fem.sample import eval_at_points, sample_grid
from pfhubbenchmarks_tpu.fem.sample3d import eval_at_points3d


def test_sample2d_reproduces_linear_fields():
    """P1 interpolation is exact for linear functions."""
    g = CrossedTriGrid(7, 5, 2.1, 1.5)
    f = lambda x, y: 2.0 * x - 3.0 * y + 0.5
    w = g.interpolate([f])
    w = (jnp.asarray(w[0]), jnp.asarray(w[1]))
    rng = np.random.default_rng(0)
    xs = rng.uniform(0, g.Lx, 200)
    ys = rng.uniform(0, g.Ly, 200)
    vals = np.asarray(eval_at_points(g, w, xs, ys))[0]
    np.testing.assert_allclose(vals, f(xs, ys), rtol=1e-12, atol=1e-12)


def test_sample2d_nodal_values():
    g = CrossedTriGrid(4, 4, 1.0, 1.0)
    rng = np.random.default_rng(1)
    v = rng.standard_normal((1, 5, 5))
    m = rng.standard_normal((1, 4, 4))
    w = (jnp.asarray(v), jnp.asarray(m))
    # vertices
    vx, vy = g.vertex_coords()
    got = np.asarray(eval_at_points(g, w, vx.ravel(), vy.ravel()))[0]
    np.testing.assert_allclose(got, v[0].ravel(), rtol=1e-12)
    # cell centers
    cx, cy = g.center_coords()
    got = np.asarray(eval_at_points(g, w, cx.ravel(), cy.ravel()))[0]
    np.testing.assert_allclose(got, m[0].ravel(), rtol=1e-12)


def test_sample_grid_shape():
    g = CrossedTriGrid(6, 6, 1.0, 1.0)
    w = g.interpolate([lambda x, y: x * y])
    w = (jnp.asarray(w[0]), jnp.asarray(w[1]))
    xs, ys, vals = sample_grid(g, w, 11, 9)
    assert vals.shape == (1, 9, 11)


def test_sample3d_linear_exact_and_nodal():
    g = TetGrid(4, 3, 2, 1.0, 1.0, 1.0)
    f = lambda x, y, z: 1.0 + 2.0 * x - y + 3.0 * z
    (v,) = g.interpolate([f])
    w = (jnp.asarray(v),)
    rng = np.random.default_rng(2)
    xs = rng.uniform(0, 1, 300)
    ys = rng.uniform(0, 1, 300)
    zs = rng.uniform(0, 1, 300)
    vals = np.asarray(eval_at_points3d(g, w, xs, ys, zs))[0]
    np.testing.assert_allclose(vals, f(xs, ys, zs), rtol=1e-12, atol=1e-12)
    # cell center lies on the main diagonal: avg of the two diagonal corners
    rng_v = rng.standard_normal((1, 3, 4, 5))
    w = (jnp.asarray(rng_v),)
    val = float(eval_at_points3d(g, w, 0.5 * g.hx, 0.5 * g.hy, 0.5 * g.hz)[0])
    np.testing.assert_allclose(val, 0.5 * (rng_v[0, 0, 0, 0] + rng_v[0, 1, 1, 1]),
                               rtol=1e-12)
