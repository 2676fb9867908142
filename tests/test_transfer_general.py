"""General-ratio (non-dyadic) nested P1 transfers — the machinery that gives
bench3's 350² grid a real multigrid hierarchy (350 → 175 → 35 → 7)."""

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.solve.gmg import build_hierarchy
from pfhubbenchmarks_tpu.solve.transfer import (
    inject_state, inject_state_general, prolong, prolong_general, restrict,
    restrict_general)


def _rand_state(grid, F=2, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((F, grid.n_vertices_y, grid.n_vertices_x))
    m = rng.standard_normal((F, grid.ny, grid.nx))
    return tuple(jnp.asarray(a) for a in grid.pad_state(v, m))


def test_general_matches_specialized_at_ratio2():
    fine = CrossedTriGrid(16, 16, 2.0, 2.0, pad_to=(1, 1))
    coarse = CrossedTriGrid(8, 8, 2.0, 2.0, pad_to=(1, 1))
    wc = _rand_state(coarse)
    wf = _rand_state(fine, seed=1)
    for a, b in zip(prolong_general(coarse, fine)(wc),
                    prolong(coarse, fine)(wc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-14)
    for a, b in zip(restrict_general(coarse, fine)(wf),
                    restrict(coarse, fine)(wf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-14)
    for a, b in zip(inject_state_general(coarse, fine)(wf),
                    inject_state(coarse, fine)(wf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-14)


def _check_linear_exact(coarse, fine):
    """Prolongation of the coarse interpolant of a global linear function
    must equal the fine interpolant (P1 contains linears; interpolation at
    nested nodes is exact)."""
    f = lambda x, y: 0.7 + 1.3 * x - 2.1 * y
    wc = tuple(jnp.asarray(a) for a in coarse.interpolate([f]))
    wf_expect = fine.interpolate([f])
    vf, mf = prolong_general(coarse, fine)(wc)
    np.testing.assert_allclose(np.asarray(vf), wf_expect[0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(mf), wf_expect[1], atol=1e-12)


def test_prolong_general_linear_exact_ratio3():
    _check_linear_exact(CrossedTriGrid(5, 5, 1.5, 1.5),
                        CrossedTriGrid(15, 15, 1.5, 1.5))


def test_prolong_general_linear_exact_ratio5():
    _check_linear_exact(CrossedTriGrid(7, 7, 2.0, 2.0),
                        CrossedTriGrid(35, 35, 2.0, 2.0))


def test_prolong_general_continuity_ratio5():
    """Interpolating random coarse data must reproduce coarse dof values at
    coincident fine nodes (injection of prolongation is identity)."""
    coarse = CrossedTriGrid(6, 6, 1.0, 1.0)
    fine = CrossedTriGrid(30, 30, 1.0, 1.0)
    wc = _rand_state(coarse, seed=2)
    wf = prolong_general(coarse, fine)(wc)
    back = inject_state_general(coarse, fine)(wf)
    np.testing.assert_allclose(np.asarray(back[0]), np.asarray(wc[0]),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(back[1]), np.asarray(wc[1]),
                               atol=1e-14)


def test_restrict_general_is_exact_transpose_ratio5():
    coarse = CrossedTriGrid(7, 7, 2.0, 2.0)
    fine = CrossedTriGrid(35, 35, 2.0, 2.0)
    wc = _rand_state(coarse, seed=3)
    rf = _rand_state(fine, seed=4)
    Pwc = prolong_general(coarse, fine)(wc)
    Rrf = restrict_general(coarse, fine)(rf)
    lhs = sum(float(jnp.vdot(a, b)) for a, b in zip(Pwc, rf))
    rhs = sum(float(jnp.vdot(a, b)) for a, b in zip(wc, Rrf))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


def test_build_hierarchy_mixed_ratios_350():
    g = CrossedTriGrid(350, 350, 960.0, 960.0, pad_to=(1, 1))
    sizes = [(h.ny, h.nx) for h in build_hierarchy(g)]
    assert sizes == [(350, 350), (175, 175), (35, 35), (7, 7)], sizes


def test_gmg_converges_on_mixed_ratio_hierarchy():
    """bench3 at 70² gets the mixed 70 → 35 → 7 hierarchy (ratios 2, 5);
    Newton + FGMRES/GMG must still converge cleanly."""
    from pfhubbenchmarks_tpu.benchmarks import get_benchmark
    from pfhubbenchmarks_tpu.solve.newton import make_newton_solver

    pb = get_benchmark("bench3", nx=70, ny=70)
    sizes = [(h.ny, h.nx) for h in build_hierarchy(pb.grid)]
    assert sizes == [(70, 70), (35, 35), (7, 7)], sizes
    newton = make_newton_solver(pb.residual(), pb.solver,
                                pb.precond_builder())
    w0 = pb.initial_state()
    res = newton(w0, w0, 0.01)
    assert bool(res.converged), float(res.res_norm)
    res2 = newton(res.x, res.x, 0.02)
    assert bool(res2.converged), float(res2.res_norm)
