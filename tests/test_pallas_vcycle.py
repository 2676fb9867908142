"""The fused whole-V-cycle kernel must reproduce the XLA V-cycle exactly
(same smoothing, transfers, and coarse solve — only the lowering differs).
Runs the kernel in interpreter mode so the test works on CPU."""

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.benchmarks.bench1 import make
from pfhubbenchmarks_tpu.ops.pallas_vcycle import make_fused_vcycle
from pfhubbenchmarks_tpu.solve.gmg import build_hierarchy, make_gmg
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi
from pfhubbenchmarks_tpu.solve.transfer import inject_any


def _ladder(grids, terms, F, w, dt, level_bcs=None):
    """Per-level (inject_any) states + block-Jacobi pinvs — the inputs the
    fused kernel takes since the round-4 injection hoist (mirrors
    solve/gmg.py's build)."""
    w_ls, pinvs = [], []
    wl = w
    for l, gl in enumerate(grids):
        w_ls.append(wl)
        bcs = level_bcs[l] if level_bcs else ()
        pinvs.append(make_block_jacobi(
            gl, terms, F, dirichlet=bcs,
            dtype=jnp.float32)(wl, wl, dt).pinv_planes)
        if l + 1 < len(grids):
            wl = inject_any(grids[l + 1], grids[l])(wl)
    return w_ls, pinvs


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

    w_ls, pinvs = _ladder(grids, problem.terms, F, w, dt)
    z_fused = fused(r, w_ls, w_ls, dt, pinvs)

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
    z2, az = fused_mv(r, w_ls, w_ls, dt, pinvs)
    for a, b in zip(z2, z_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    res32 = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, az_ref = jax.jvp(lambda u: res32(u, w, dt), (w,), (z_fused,))
    for a, b in zip(az, az_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_matvec_is_true_rule_under_precond_rule():
    """A rediscretized (precond_rule) hierarchy exports the fused (z, Az)
    pair with Az assembled on the TRUE rule (``matvec_grid``), never the
    cheap rule: a cheap-rule Az breaks FGMRES's Arnoldi relation (every
    solve then 'fails' on the true-residual gate — bench2 stalled at dt_min
    the moment its 6-field fused V-cycle first fit VMEM)."""
    import dataclasses

    import jax

    from pfhubbenchmarks_tpu.fem.assembly import make_residual

    problem = make(nx=16, ny=16)
    g = problem.grid
    F = problem.n_fields
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)

    # the builder exports the pair for both same-rule and cheap-rule builds
    same_rule = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         use_pallas=True)(w, w, dt)
    assert hasattr(same_rule, "minv_matvec")
    cheap_rule = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                          use_pallas=True, precond_rule="dunavant1")(w, w, dt)
    assert hasattr(cheap_rule, "minv_matvec")

    # interpret-mode check of the exported Az: cheap-rule hierarchy +
    # matvec_grid=g must produce the ffc3 J.v, not the dunavant1 J.v
    grids_cheap = [dataclasses.replace(gl, rule_name="dunavant1")
                   for gl in build_hierarchy(g)]
    fused = make_fused_vcycle(grids_cheap, problem.terms, F,
                              dtype=jnp.float32, with_matvec=True,
                              matvec_grid=g, interpret=True)
    w_ls, pinvs = _ladder(grids_cheap, problem.terms, F, w, dt)
    rng = np.random.default_rng(1)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))
    z, az = fused(r, w_ls, w_ls, dt, pinvs)

    res_true = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, az_true = jax.jvp(lambda u: res_true(u, w, dt), (w,), (z,))
    g_cheap = dataclasses.replace(g, rule_name="dunavant1")
    res_cheap = make_residual(g_cheap, problem.terms, F, dtype=jnp.float32)
    _, az_cheap = jax.jvp(lambda u: res_cheap(u, w, dt), (w,), (z,))

    for a, b in zip(az, az_true):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # and it is NOT the cheap-rule product
    diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(az, az_cheap))
    assert diff > 1e-3


def test_fused_vcycle_dirichlet_matches_xla_vcycle():
    """bench6's Dirichlet-on-phi V-cycle: the in-kernel edge-mask BC
    handling (ops/pallas_vcycle._bc_masks) must reproduce the XLA cycle's
    zero_bc_rows / identity-row treatment exactly."""
    import jax

    from pfhubbenchmarks_tpu.benchmarks.bench6 import make as make_b6
    from pfhubbenchmarks_tpu.fem.assembly import make_residual

    problem = make_b6(nx=16, ny=16)
    g = problem.grid
    F = problem.n_fields
    nu_pre, nu_post, coarse = 2, 2, 8
    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.05, jnp.float32)

    xla_build = make_gmg(g, problem.terms, F,
                         dirichlet_for=problem.dirichlet_for,
                         dtype=jnp.float32, nu_pre=nu_pre, nu_post=nu_post,
                         coarse_sweeps=coarse, dense_coarse_max_dofs=0)

    grids = build_hierarchy(g)
    level_bcs = [problem.dirichlet_for(gl) for gl in grids]
    assert any(level_bcs)
    fused = make_fused_vcycle(grids, problem.terms, F, nu_pre=nu_pre,
                              nu_post=nu_post, coarse_sweeps=coarse,
                              dtype=jnp.float32, with_matvec=True,
                              level_bcs=level_bcs, interpret=True)

    rng = np.random.default_rng(3)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))

    z_xla = xla_build(w, w, dt)(r)

    w_ls, pinvs = _ladder(grids, problem.terms, F, w, dt,
                          level_bcs=level_bcs)
    z_fused, az = fused(r, w_ls, w_ls, dt, pinvs)

    for a, b in zip(z_fused, z_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)

    # exported Az: J.v with identity BC rows, matching the outer operator
    res32 = make_residual(g, problem.terms, F,
                          dirichlet=problem.dirichlet_for(g),
                          dtype=jnp.float32)
    _, az_ref = jax.jvp(lambda u: res32(u, w, dt), (w,), (z_fused,))
    for a, b in zip(az, az_ref):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4 * scale)


def test_fused_vcycle_general_ratio_matches_xla_vcycle():
    """Non-dyadic hierarchy (50 -> 25 -> 5: dyadic pair + R=5 general pair,
    the bench3/bench2 deep-hierarchy shape): the SVD-separated in-kernel
    transfers must reproduce the XLA cycle."""
    problem = make(nx=50, ny=50)
    g = problem.grid
    F = problem.n_fields
    nu_pre, nu_post, coarse = 2, 2, 8

    xla_build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         nu_pre=nu_pre, nu_post=nu_post, coarse_sweeps=coarse,
                         dense_coarse_max_dofs=0, min_cells=5)

    grids = build_hierarchy(g, min_cells=5)
    assert [gl.ny for gl in grids] == [50, 25, 5]
    fused = make_fused_vcycle(grids, problem.terms, F, nu_pre=nu_pre,
                              nu_post=nu_post, coarse_sweeps=coarse,
                              dtype=jnp.float32, interpret=True)

    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)

    rng = np.random.default_rng(7)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))

    z_xla = xla_build(w, w, dt)(r)

    w_ls, pinvs = _ladder(grids, problem.terms, F, w, dt)
    z_fused = fused(r, w_ls, w_ls, dt, pinvs)

    for a, b in zip(z_fused, z_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)


def test_fused_inner_mr_matches_xla_inner_mr():
    """gmg_inner_mr=2 (two minimal-residual-combined V-cycles per
    preconditioner application, all in one kernel): fused == the XLA
    vcycle_top wrapper, and the exported Az is the J.v of the combined z."""
    import jax

    from pfhubbenchmarks_tpu.fem.assembly import make_residual

    problem = make(nx=16, ny=16)
    g = problem.grid
    F = problem.n_fields

    xla_build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         nu_pre=2, nu_post=2, coarse_sweeps=8,
                         dense_coarse_max_dofs=0, inner_mr=2)
    grids = build_hierarchy(g)
    fused = make_fused_vcycle(grids, problem.terms, F, nu_pre=2,
                              nu_post=2, coarse_sweeps=8,
                              dtype=jnp.float32, inner_mr=2,
                              with_matvec=True, interpret=True)

    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)
    rng = np.random.default_rng(11)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))

    z_xla = xla_build(w, w, dt)(r)
    w_ls, pinvs = _ladder(grids, problem.terms, F, w, dt)
    z_fused, az = fused(r, w_ls, w_ls, dt, pinvs)
    for a, b in zip(z_fused, z_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)
    # inner_mr=2 must differ from the plain cycle (the accelerated z is a
    # different, better correction) ...
    plain = make_gmg(g, problem.terms, F, dtype=jnp.float32, nu_pre=2,
                     nu_post=2, coarse_sweeps=8,
                     dense_coarse_max_dofs=0)(w, w, dt)(r)
    assert max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(z_xla, plain)) > 1e-5
    # ... and the exported pair is still the true J.v of the combined z
    res32 = make_residual(g, problem.terms, F, dtype=jnp.float32)
    _, az_ref = jax.jvp(lambda u: res32(u, w, dt), (w,), (z_fused,))
    for a, b in zip(az, az_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_wcycle_matches_xla_wcycle():
    """cycle='w' (two coarse corrections per level): fused kernel == XLA."""
    import jax.numpy as jnp
    import numpy as np

    problem = make(nx=16, ny=16)
    g = problem.grid
    F = problem.n_fields

    xla_build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         nu_pre=2, nu_post=2, coarse_sweeps=8,
                         dense_coarse_max_dofs=0, cycle="w")
    grids = build_hierarchy(g)
    fused = make_fused_vcycle(grids, problem.terms, F, nu_pre=2,
                              nu_post=2, coarse_sweeps=8,
                              dtype=jnp.float32, cycle="w", interpret=True)

    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)
    rng = np.random.default_rng(7)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))

    z_xla = xla_build(w, w, dt)(r)
    w_ls, pinvs = _ladder(grids, problem.terms, F, w, dt)
    z_fused = fused(r, w_ls, w_ls, dt, pinvs)
    for a, b in zip(z_fused, z_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)


def test_fused_nu_fine_matches_xla_nu_fine():
    """gmg_nu_fine_pre/post (finest-level-only smoothing override): the
    fused kernel must equal the XLA cycle at the same asymmetric schedule,
    and the override must actually change the cycle (differ from the
    uniform-nu result)."""
    problem = make(nx=16, ny=16)
    g = problem.grid
    F = problem.n_fields

    xla_build = make_gmg(g, problem.terms, F, dtype=jnp.float32,
                         nu_pre=2, nu_post=2, coarse_sweeps=8,
                         dense_coarse_max_dofs=0,
                         nu_fine_pre=1, nu_fine_post=1)
    grids = build_hierarchy(g)
    fused = make_fused_vcycle(grids, problem.terms, F, nu_pre=2, nu_post=2,
                              nu_fine_pre=1, nu_fine_post=1,
                              coarse_sweeps=8, dtype=jnp.float32,
                              interpret=True)

    w = tuple(a.astype(jnp.float32) for a in problem.initial_state())
    dt = jnp.asarray(0.5, jnp.float32)
    rng = np.random.default_rng(7)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    r = (jnp.asarray(r_v), jnp.asarray(r_m))

    z_xla = xla_build(w, w, dt)(r)
    w_ls, pinvs = _ladder(grids, problem.terms, F, w, dt)
    z_fused = fused(r, w_ls, w_ls, dt, pinvs)
    for a, b in zip(z_fused, z_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)

    uniform = make_gmg(g, problem.terms, F, dtype=jnp.float32, nu_pre=2,
                       nu_post=2, coarse_sweeps=8,
                       dense_coarse_max_dofs=0)(w, w, dt)(r)
    assert max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(z_xla, uniform)) > 1e-5
