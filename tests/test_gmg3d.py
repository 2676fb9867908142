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
