"""Matmul transfers (ops/transfer_mats.py) must equal the strided-slice
transfers (solve/transfer.py) exactly — same P1 interpolation, different
lowering (MXU matmuls, usable inside Pallas kernels)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.ops.transfer_mats import (
    build_transfer_mats, inject_mm, prolong_mm, restrict_mm)
from pfhubbenchmarks_tpu.solve import transfer


@pytest.mark.parametrize("n,pad", [(8, (1, 1)), (12, (4, 4))])
@pytest.mark.parametrize("F", [1, 2])
def test_matmul_transfers_match_strided(n, pad, F):
    fine = CrossedTriGrid(n, n, 1.0, 1.0, pad_to=pad)
    coarse = CrossedTriGrid(n // 2, n // 2, 1.0, 1.0, pad_to=pad)
    mats = build_transfer_mats(coarse, fine, dtype=np.float64)
    rng = np.random.default_rng(0)

    def rand_state(g):
        v = np.zeros((F,) + g.vshape)
        m = np.zeros((F,) + g.mshape)
        v[:, : g.ny + 1, : g.nx + 1] = rng.normal(size=(F, g.ny + 1, g.nx + 1))
        m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx))
        return jnp.asarray(v), jnp.asarray(m)

    wc = rand_state(coarse)
    wf = rand_state(fine)

    ref_p = transfer.prolong(coarse, fine)(wc)
    got_p = prolong_mm(mats, wc)
    np.testing.assert_allclose(got_p[0], ref_p[0], atol=1e-13)
    np.testing.assert_allclose(got_p[1], ref_p[1], atol=1e-13)

    ref_r = transfer.restrict(coarse, fine)(wf)
    got_r = restrict_mm(mats, wf)
    np.testing.assert_allclose(got_r[0], ref_r[0], atol=1e-13)
    np.testing.assert_allclose(got_r[1], ref_r[1], atol=1e-13)

    ref_i = transfer.inject_state(coarse, fine)(wf)
    got_i = inject_mm(mats, wf)
    np.testing.assert_allclose(got_i[0], ref_i[0], atol=1e-13)
    np.testing.assert_allclose(got_i[1], ref_i[1], atol=1e-13)
