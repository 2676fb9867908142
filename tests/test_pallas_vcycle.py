"""The fused whole-V-cycle kernel must reproduce the XLA V-cycle exactly
(same smoothing, transfers, and coarse solve — only the lowering differs).
Runs the kernel in interpreter mode so the test works on CPU."""

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.benchmarks.bench1 import make
from pfhubbenchmarks_tpu.ops.pallas_vcycle import make_fused_vcycle
from pfhubbenchmarks_tpu.solve.gmg import build_hierarchy, make_gmg
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi
from pfhubbenchmarks_tpu.solve.transfer import inject_state


def test_fused_vcycle_matches_xla_vcycle():
    problem = make(nx=16, ny=16)
    g = problem.grid
    F = problem.n_fields
    nu_pre, nu_post, coarse = 2, 2, 8

    # dense_coarse_max_dofs=0: the fused kernel solves the coarsest level by
    # sweeps (no dense inverse inside Mosaic), so compare against the
    # sweep-coarse XLA cycle — identical math, different lowering
    xla_build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         nu_pre=nu_pre, nu_post=nu_post, coarse_sweeps=coarse,
                         dense_coarse_max_dofs=0)

    grids = build_hierarchy(g)
    assert len(grids) == 2
    fused = make_fused_vcycle(grids, problem.terms, F, nu_pre=nu_pre,
                              nu_post=nu_post, coarse_sweeps=coarse,
                              dtype=jnp.float32, interpret=True)

    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)

    rng = np.random.default_rng(0)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))

    z_xla = xla_build(w, w, dt)(r)

    pinvs = []
    wl = w
    for l, gl in enumerate(grids):
        pinvs.append(make_block_jacobi(gl, problem.terms, F,
                                       dtype=jnp.float32)(wl, wl, dt).pinv_planes)
        if l + 1 < len(grids):
            wl = inject_state(grids[l + 1], grids[l])(wl)
    z_fused = fused(r, w, w, dt, pinvs)

    # identical math modulo f32 op-order noise in matmul transfers/reductions
    for a, b in zip(z_fused, z_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)

    # with_matvec variant: same z, plus A z equal to the jvp of the fine
    # assembly at the same linearization
    import jax

    from pfhubbenchmarks_tpu.fem.assembly import make_residual

    fused_mv = make_fused_vcycle(grids, problem.terms, F, nu_pre=nu_pre,
                                 nu_post=nu_post, coarse_sweeps=coarse,
                                 dtype=jnp.float32, with_matvec=True,
                                 interpret=True)
    z2, az = fused_mv(r, w, w, dt, pinvs)
    for a, b in zip(z2, z_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    res32 = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, az_ref = jax.jvp(lambda u: res32(u, w, dt), (w,), (z_fused,))
    for a, b in zip(az, az_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_no_fused_matvec_under_precond_rule():
    """A rediscretized (precond_rule) hierarchy must NOT export the fused
    (z, Az) pair: its fine-level Az is the cheap-rule operator, not the
    outer J.v, and feeding it to FGMRES breaks the Arnoldi relation (every
    solve then 'fails' on the true-residual gate — bench2 stalled at dt_min
    the moment its 6-field fused V-cycle first fit VMEM)."""
    problem = make(nx=16, ny=16)
    g = problem.grid
    F = problem.n_fields
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)

    same_rule = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=True)(w, w, dt)
    assert hasattr(same_rule, "minv_matvec")

    cheap_rule = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                          use_pallas=True, precond_rule="dunavant1")(w, w, dt)
    assert not hasattr(cheap_rule, "minv_matvec")
