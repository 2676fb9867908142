"""Split-V-cycle fusion (descend + fused tail + ascend) must reproduce the
whole-V-cycle kernel exactly — same smoothing/transfer/coarse math, only the
launch structure differs. Interpreter mode so the test runs on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfhubbenchmarks_tpu.benchmarks.bench1 import make
from pfhubbenchmarks_tpu.ops.pallas_vcycle import (make_fused_ascend,
                                                   make_fused_descend,
                                                   make_fused_vcycle)
from pfhubbenchmarks_tpu.solve.gmg import build_hierarchy
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi
from pfhubbenchmarks_tpu.solve.transfer import inject_any


def _setup(nx):
    problem = make(nx=nx, ny=nx)
    g = problem.grid
    F = problem.n_fields
    grids = build_hierarchy(g, min_cells=3)
    assert len(grids) >= 3, [gl.ny for gl in grids]
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)
    pinvs = []
    states = []
    wl = w
    for l, gl in enumerate(grids):
        states.append(wl)
        pinvs.append(make_block_jacobi(gl, problem.terms, F,
                                       dtype=jnp.float32)(wl, wl, dt).pinv_planes)
        if l + 1 < len(grids):
            wl = inject_any(grids[l + 1], grids[l])(wl)
    rng = np.random.default_rng(3)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))
    return problem, grids, w, dt, pinvs, states, r


@pytest.mark.parametrize("nx", [12, 27])  # 12-6-3 dyadic; 27-9-3 (R=3)
def test_split_matches_whole_kernel(nx):
    problem, grids, w, dt, pinvs, states, r = _setup(nx)
    F = problem.n_fields
    nu, coarse = 2, 8

    whole = make_fused_vcycle(grids, problem.terms, F, nu_pre=nu,
                              nu_post=nu, coarse_sweeps=coarse,
                              dtype=jnp.float32, interpret=True)
    z_ref = whole(r, states, states, dt, pinvs)

    tail = make_fused_vcycle(grids[1:], problem.terms, F, nu_pre=nu,
                             nu_post=nu, coarse_sweeps=coarse,
                             dtype=jnp.float32, interpret=True)
    descend = make_fused_descend(grids[0], grids[1], problem.terms, F,
                                 nu=nu, dtype=jnp.float32, interpret=True)
    ascend = make_fused_ascend(grids[0], grids[1], problem.terms, F,
                               nu=nu, dtype=jnp.float32, interpret=True)

    x, bc = descend(r, w, w, dt, pinvs[0])
    xc = tail(bc, states[1:], states[1:], dt, pinvs[1:])
    z = ascend(r, x, xc, w, w, dt, pinvs[0])

    for a, b in zip(z, z_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_ascend_matvec_pair():
    import jax

    from pfhubbenchmarks_tpu.fem.assembly import make_residual

    problem, grids, w, dt, pinvs, states, r = _setup(20)
    F = problem.n_fields
    nu, coarse = 2, 8
    tail = make_fused_vcycle(grids[1:], problem.terms, F, nu_pre=nu,
                             nu_post=nu, coarse_sweeps=coarse,
                             dtype=jnp.float32, interpret=True)
    descend = make_fused_descend(grids[0], grids[1], problem.terms, F,
                                 nu=nu, dtype=jnp.float32, interpret=True)
    ascend_mv = make_fused_ascend(grids[0], grids[1], problem.terms, F,
                                  nu=nu, dtype=jnp.float32,
                                  with_matvec=True, interpret=True)

    x, bc = descend(r, w, w, dt, pinvs[0])
    xc = tail(bc, states[1:], states[1:], dt, pinvs[1:])
    z, az = ascend_mv(r, x, xc, w, w, dt, pinvs[0])

    res32 = make_residual(grids[0], problem.terms, F, dtype=jnp.float32)
    _, az_ref = jax.jvp(lambda u: res32(u, w, dt), (w,), (z,))
    for a, b in zip(az, az_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_gmg_uses_split_path_and_matches_unfused():
    """make_gmg with use_pallas + a VMEM-capped fine level must route
    through the split kernels (descend/ascend attached) and agree with the
    plain XLA V-cycle."""
    from pfhubbenchmarks_tpu.solve.gmg import make_gmg

    problem, grids, w, dt, pinvs, states, r = _setup(20)
    F = problem.n_fields
    g = problem.grid

    import pfhubbenchmarks_tpu.ops.pallas_residual as pr
    import pfhubbenchmarks_tpu.ops.pallas_vcycle as pv

    # force: whole-kernel fusion OFF (fine "too big"), split ON — emulate
    # the bench3 regime on a CPU-sized grid by monkeypatching fits_vmem
    real_fits = pr.fits_vmem

    def fake_fits(grid_, n_fields_, nq=4, dtype_bytes=4,
                  budget=100 * 2**20, kernel="jvp"):
        if kernel == "vcycle" and grid_.ny == g.ny:
            return False
        return real_fits(grid_, n_fields_, nq=nq, dtype_bytes=dtype_bytes,
                         budget=budget, kernel=kernel)

    import pfhubbenchmarks_tpu.solve.gmg as gmg_mod
    orig_make_descend = pv.make_fused_descend
    orig_make_ascend = pv.make_fused_ascend
    orig_make_vcycle = pv.make_fused_vcycle
    orig_make_jvp = pr.make_pallas_jvp
    used = {}
    try:
        gmg_mod.make_residual  # sanity: module import intact
        pr.fits_vmem = fake_fits

        def mk_descend(*a, **k):
            used["descend"] = True
            k["interpret"] = True
            return orig_make_descend(*a, **k)

        def mk_ascend(*a, **k):
            used["ascend"] = True
            k["interpret"] = True
            return orig_make_ascend(*a, **k)

        def mk_vcycle(*a, **k):
            k["interpret"] = True
            return orig_make_vcycle(*a, **k)

        def mk_jvp(grid_, terms_, nf_, dtype=jnp.float32):
            fn = orig_make_jvp(grid_, terms_, nf_, dtype=dtype)
            return lambda w_, w0_, dt_, v_: fn(w_, w0_, dt_, v_,
                                               interpret=True)

        pv.make_fused_descend = mk_descend
        pv.make_fused_ascend = mk_ascend
        pv.make_fused_vcycle = mk_vcycle
        pr.make_pallas_jvp = mk_jvp

        build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=True, min_cells=5,
                         dense_coarse_max_dofs=0)
        Minv = build(w, w, dt)
        assert used.get("descend") and used.get("ascend")
        assert hasattr(Minv, "minv_matvec")
        z = Minv(r)
        z2, az = Minv.minv_matvec(r)
    finally:
        pr.fits_vmem = real_fits
        pv.make_fused_descend = orig_make_descend
        pv.make_fused_ascend = orig_make_ascend
        pv.make_fused_vcycle = orig_make_vcycle
        pr.make_pallas_jvp = orig_make_jvp

    build_xla = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=False, min_cells=5,
                         dense_coarse_max_dofs=0)
    z_ref = build_xla(w, w, dt)(r)
    for a, b in zip(z, z_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(z2, z):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("nx", [12, 27])  # dyadic pairs; R=3 general pairs
def test_gmg_split_chain_matches_unfused(nx):
    """fuse_vcycle='split_chain': the whole descent and the whole ascent as
    ONE kernel each around the external dense coarse — must equal the plain
    XLA V-cycle."""
    from pfhubbenchmarks_tpu.solve.gmg import make_gmg

    problem, grids, w, dt, pinvs, states, r = _setup(nx)
    F = problem.n_fields
    g = problem.grid

    import pfhubbenchmarks_tpu.ops.pallas_vcycle as pv

    orig_d = pv.make_fused_descend_chain
    orig_a = pv.make_fused_ascend_chain
    used = {"d": 0, "a": 0}
    try:
        def mk_d(*a, **k):
            used["d"] += 1
            k["interpret"] = True
            return orig_d(*a, **k)

        def mk_a(*a, **k):
            used["a"] += 1
            k["interpret"] = True
            return orig_a(*a, **k)

        pv.make_fused_descend_chain = mk_d
        pv.make_fused_ascend_chain = mk_a
        build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=True, min_cells=3,
                         fuse_vcycle="split_chain")
        z = build(w, w, dt)(r)
    finally:
        pv.make_fused_descend_chain = orig_d
        pv.make_fused_ascend_chain = orig_a
    assert used["d"] == 1 and used["a"] == 1

    build_xla = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=False, min_cells=3)
    z_ref = build_xla(w, w, dt)(r)
    for a, b in zip(z, z_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("nx", [12, 27])  # dyadic pairs; R=3 general pairs
def test_gmg_split_levels_matches_unfused(nx):
    """fuse_vcycle='split_levels': per-level descend/ascend kernels with the
    exact dense coarse solve outside — must equal the plain XLA V-cycle with
    the same dense coarse."""
    from pfhubbenchmarks_tpu.solve.gmg import make_gmg

    problem, grids, w, dt, pinvs, states, r = _setup(nx)
    F = problem.n_fields
    g = problem.grid

    import pfhubbenchmarks_tpu.ops.pallas_vcycle as pv

    orig_make_descend = pv.make_fused_descend
    orig_make_ascend = pv.make_fused_ascend
    used = {"descend": 0, "ascend": 0}
    try:
        def mk_descend(*a, **k):
            used["descend"] += 1
            k["interpret"] = True
            return orig_make_descend(*a, **k)

        def mk_ascend(*a, **k):
            used["ascend"] += 1
            k["interpret"] = True
            return orig_make_ascend(*a, **k)

        pv.make_fused_descend = mk_descend
        pv.make_fused_ascend = mk_ascend
        build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=True, min_cells=3,
                         fuse_vcycle="split_levels")
        z = build(w, w, dt)(r)
    finally:
        pv.make_fused_descend = orig_make_descend
        pv.make_fused_ascend = orig_make_ascend
    assert used["descend"] == 2 and used["ascend"] == 2  # levels 12/27, 6/9

    build_xla = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=False, min_cells=3)
    z_ref = build_xla(w, w, dt)(r)
    for a, b in zip(z, z_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_gmg_split_chain_nu_fine_matches_unfused():
    """split_chain with the finest-level smoothing override
    (gmg_nu_fine_pre/post) must equal the XLA cycle at the same schedule
    (nu_fine threads through the chain kernels' per-level sweep counts)."""
    from pfhubbenchmarks_tpu.solve.gmg import make_gmg

    problem, grids, w, dt, pinvs, states, r = _setup(12)
    F = problem.n_fields
    g = problem.grid

    import pfhubbenchmarks_tpu.ops.pallas_vcycle as pv

    orig_d = pv.make_fused_descend_chain
    orig_a = pv.make_fused_ascend_chain
    try:
        def mk_d(*a, **k):
            k["interpret"] = True
            assert k.get("nu_fine") == 1
            return orig_d(*a, **k)

        def mk_a(*a, **k):
            k["interpret"] = True
            assert k.get("nu_fine") == 1
            return orig_a(*a, **k)

        pv.make_fused_descend_chain = mk_d
        pv.make_fused_ascend_chain = mk_a
        build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=True, min_cells=3,
                         fuse_vcycle="split_chain",
                         nu_fine_pre=1, nu_fine_post=1)
        z = build(w, w, dt)(r)
    finally:
        pv.make_fused_descend_chain = orig_d
        pv.make_fused_ascend_chain = orig_a

    build_xla = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=False, min_cells=3,
                         nu_fine_pre=1, nu_fine_post=1)
    z_ref = build_xla(w, w, dt)(r)
    for a, b in zip(z, z_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
