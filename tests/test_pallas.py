"""Pallas fused kernels vs the XLA einsum assembly (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.benchmarks import get_benchmark
from pfhubbenchmarks_tpu.ops.pallas_residual import (
    fits_vmem, make_pallas_jvp, make_pallas_residual)


@pytest.fixture(scope="module")
def setup():
    pb = get_benchmark("bench1", nx=12, ny=12)
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    rng = np.random.default_rng(0)
    v = tuple(jnp.asarray(rng.standard_normal(a.shape), jnp.float32) for a in w)
    return pb, w, v


def test_pallas_residual_matches_xla(setup):
    pb, w, v = setup
    r_ref = pb.residual(dtype=jnp.float32)(w, w, 0.1)
    r_pal = make_pallas_residual(pb.grid, pb.terms, 2)(w, w, 0.1, interpret=True)
    for a, b in zip(r_pal, r_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_jvp_matches_xla(setup):
    pb, w, v = setup
    res32 = pb.residual(dtype=jnp.float32)
    _, jvx = jax.linearize(lambda u: res32(u, w, 0.4), w)
    jv_ref = jvx(v)
    jv_pal = make_pallas_jvp(pb.grid, pb.terms, 2)(w, w, 0.4, v, interpret=True)
    for a, b in zip(jv_pal, jv_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fits_vmem_scaling():
    pb = get_benchmark("bench1")
    assert fits_vmem(pb.grid, 2)          # 100^2, 2 fields: easily fits
    big = get_benchmark("bench3")
    # 350^2 fits the RAISED scoped-VMEM budget (CompilerParams
    # vmem_limit_bytes=110MB, probed on TPU) but not the legacy 16 MB
    # Mosaic default — the guard must track the budget actually requested
    assert fits_vmem(big.grid, 2)
    assert not fits_vmem(big.grid, 2, budget=15 * 2**20)
