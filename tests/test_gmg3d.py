"""3D transfer adjointness + multigrid-preconditioned 3D solve."""

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks.bench1_3d import make
from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
from pfhubbenchmarks_tpu.solve import tree as tr
from pfhubbenchmarks_tpu.solve.transfer3d import prolong3d, restrict3d


def test_transfer3d_adjoint():
    fine = TetGrid(8, 6, 4, 1.0, 1.0, 1.0)
    coarse = TetGrid(4, 3, 2, 1.0, 1.0, 1.0)
    rng = np.random.default_rng(0)
    xc = (jnp.asarray(rng.standard_normal((2, 3, 4, 5))),)
    yf = (jnp.asarray(rng.standard_normal((2, 5, 7, 9))),)
    P = prolong3d(coarse, fine)
    R = restrict3d(coarse, fine)
    a = float(tr.vdot(P(xc), yf))
    b = float(tr.vdot(xc, R(yf)))
    assert abs(a - b) < 1e-10, (a, b)


def test_bench1_3d_gmg_short_run():
    problem = make(nx=8, ny=8, nz=8)
    res = timeloop.run(problem, max_steps=4, verbose=False)
    solute = res.rows[:, 2]
    np.testing.assert_allclose(solute, solute[0], rtol=1e-10)
    assert (np.diff(res.rows[:, 1]) < 0).all()
    # gmg path keeps Krylov counts small
    assert max(s.krylov_iters for s in res.stats) < 200


def test_prolong3d_general_matches_specialized_ratio2():
    import jax.numpy as jnp

    from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
    from pfhubbenchmarks_tpu.solve.transfer3d import (
        prolong3d, prolong3d_general, restrict3d, restrict3d_general)

    coarse = TetGrid(4, 4, 4, 1.0, 1.0, 1.0)
    fine = TetGrid(8, 8, 8, 1.0, 1.0, 1.0)
    rng = np.random.default_rng(0)
    wc = (jnp.asarray(rng.standard_normal((1,) + coarse.vshape)),)
    rf = (jnp.asarray(rng.standard_normal((1,) + fine.vshape)),)
    np.testing.assert_allclose(
        np.asarray(prolong3d_general(coarse, fine)(wc)[0]),
        np.asarray(prolong3d(coarse, fine)(wc)[0]), atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(restrict3d_general(coarse, fine)(rf)[0]),
        np.asarray(restrict3d(coarse, fine)(rf)[0]), atol=1e-13)


def test_prolong3d_general_linear_exact_ratio5():
    import jax.numpy as jnp

    from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
    from pfhubbenchmarks_tpu.solve.transfer3d import prolong3d_general

    coarse = TetGrid(2, 2, 2, 1.0, 1.0, 1.0)
    fine = TetGrid(10, 10, 10, 1.0, 1.0, 1.0)
    f = lambda x, y, z: 0.3 + 1.1 * x - 0.7 * y + 2.2 * z
    wc = tuple(jnp.asarray(a) for a in coarse.interpolate([f]))
    expect = fine.interpolate([f])
    got = prolong3d_general(coarse, fine)(wc)
    np.testing.assert_allclose(np.asarray(got[0]), expect[0], atol=1e-12)


def test_hierarchy3d_mixed_ratios_50():
    from pfhubbenchmarks_tpu.fem.grid3d import TetGrid
    from pfhubbenchmarks_tpu.solve.gmg3d import build_hierarchy3d

    g = TetGrid(50, 50, 50, 100.0, 100.0, 100.0)
    sizes = [h.nz for h in build_hierarchy3d(g)]
    assert sizes == [50, 25, 5], sizes


def test_bench1_3d_kcycle_and_inner_mr_converge():
    """gmg_kcycle=2 (MR-combined coarse visits) and gmg_inner_mr=2 must
    keep the preconditioned solve convergent with iteration counts no
    worse than ~the plain cycle (they are strictly stronger per
    application; this guards the wiring, not the speedup)."""
    import dataclasses

    base = make(nx=10, ny=10, nz=10)
    plain = timeloop.run(base, max_steps=3, verbose=False)
    k_plain = sum(s.krylov_iters for s in plain.stats)

    for knob in ({"gmg_kcycle": 2}, {"gmg_inner_mr": 2}):
        pb = dataclasses.replace(base, solver=dataclasses.replace(
            base.solver, **knob))
        res = timeloop.run(pb, max_steps=3, verbose=False)
        solute = res.rows[:, 2]
        np.testing.assert_allclose(solute, solute[0], rtol=1e-10)
        k = sum(s.krylov_iters for s in res.stats)
        assert k <= k_plain + 2, (knob, k, k_plain)
