"""Field-split preconditioning (SolverConfig.field_split).

bench2's terms_precond stops cross-group gradients, so every
preconditioner linearization is block-diagonal: diag(J_CH(c,mu),
J_AC(eta1)..J_AC(eta4)). Checks: (1) the pointwise block-Jacobi blocks
built from terms_precond have EXACTLY zero cross-group entries (the static
kernel skip in ops/pallas_vcycle._bj_apply relies on it); (2) the fused
kernel with field_groups reproduces the XLA split V-cycle; (3) the
exported (z, Az) pair's Az is the TRUE coupled operator, not the split
one; (4) a Newton solve with field_split=True converges to the same state.

The PETSc analog is -pc_fieldsplit (the reference never ships one — its
SOR preconditioner is monolithic, dolfin/bench2.py:107-113)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.benchmarks.bench2 import make as make_b2
from pfhubbenchmarks_tpu.fem.assembly import make_residual
from pfhubbenchmarks_tpu.ops.pallas_vcycle import make_fused_vcycle
from pfhubbenchmarks_tpu.solve.gmg import build_hierarchy, make_gmg
from pfhubbenchmarks_tpu.solve.precond import make_block_jacobi
from tests.test_pallas_vcycle import _ladder


def _rand_r(g, F, seed=0):
    rng = np.random.default_rng(seed)
    r_v = np.zeros((F,) + g.vshape, np.float32)
    r_m = np.zeros((F,) + g.mshape, np.float32)
    r_v[:, : g.ny + 1, : g.nx + 1] = rng.normal(
        size=(F, g.ny + 1, g.nx + 1)).astype(np.float32)
    r_m[:, : g.ny, : g.nx] = rng.normal(size=(F, g.ny, g.nx)).astype(np.float32)
    return jnp.asarray(r_v), jnp.asarray(r_m)


def test_split_blocks_are_exactly_block_diagonal():
    pb = make_b2(nx=8, ny=8)
    g, F = pb.grid, pb.n_fields
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    dt = jnp.asarray(0.05, jnp.float32)
    bj = make_block_jacobi(g, pb.terms_precond, F, dtype=jnp.float32)(
        w, w, dt)
    groups = pb.field_groups
    partners = {}
    for grp in groups:
        for i in grp:
            partners[i] = set(grp)
    for plane in bj.pinv_planes:        # [F, F, Y, X]
        a = np.asarray(plane)
        for i in range(F):
            for j in range(F):
                if j not in partners[i]:
                    assert np.all(a[i, j] == 0.0), (i, j)
    # ... and the unsplit terms give dense blocks (the coupling is real)
    bj_full = make_block_jacobi(g, pb.terms, F, dtype=jnp.float32)(w, w, dt)
    dense = np.asarray(bj_full.pinv_planes[0])
    assert np.abs(dense[0, 2]).max() > 0  # c row couples to eta1


def test_split_fused_vcycle_matches_xla_and_true_matvec():
    pb = make_b2(nx=16, ny=16)
    g, F = pb.grid, pb.n_fields
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    dt = jnp.asarray(0.05, jnp.float32)
    r = _rand_r(g, F, seed=5)

    # XLA V-cycle of the SPLIT operator (einsum bj naturally applies the
    # zero cross-blocks) == fused kernel with the static field_groups skip
    xla_build = make_gmg(g, pb.terms_precond, F, dtype=jnp.float32,
                         nu_pre=2, nu_post=2, coarse_sweeps=8,
                         dense_coarse_max_dofs=0)
    z_xla = xla_build(w, w, dt)(r)

    grids = build_hierarchy(g)
    fused = make_fused_vcycle(grids, pb.terms_precond, F, nu_pre=2,
                              nu_post=2, coarse_sweeps=8, dtype=jnp.float32,
                              with_matvec=True, matvec_terms=pb.terms,
                              field_groups=pb.field_groups, interpret=True)
    w_ls, pinvs = _ladder(grids, pb.terms_precond, F, w, dt)
    z_fused, az = fused(r, w_ls, w_ls, dt, pinvs)
    for a, b in zip(z_fused, z_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)

    # the exported Az must be the TRUE coupled J.v (matvec_terms), not the
    # split operator's
    res_true = make_residual(g, pb.terms, F, dtype=jnp.float32)
    _, az_true = jax.jvp(lambda u: res_true(u, w, dt), (w,), (z_fused,))
    for a, b in zip(az, az_true):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    res_split = make_residual(g, pb.terms_precond, F, dtype=jnp.float32)
    _, az_split = jax.jvp(lambda u: res_split(u, w, dt), (w,), (z_fused,))
    assert max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(az, az_split)) > 1e-5


def test_field_split_newton_converges_same_state():
    """One implicit-Euler step solved with and without field_split: the
    converged states must agree to solver tolerance (the preconditioner
    never changes the root, only the path)."""
    from pfhubbenchmarks_tpu.solve.newton import make_newton_solver

    pb = make_b2(nx=16, ny=16)
    pb_s = dataclasses.replace(pb, solver=dataclasses.replace(
        pb.solver, field_split=True))
    w0 = pb.initial_state()
    dt = 0.02

    states = []
    for prob in (pb, pb_s):
        solve = make_newton_solver(prob.residual(), prob.solver,
                                   prob.precond_builder(),
                                   residual_lowp=prob.residual_lowp())
        res = solve(w0, w0, jnp.asarray(dt, pb.dtype))
        assert bool(res.converged)
        states.append(res.x)
    for a, b in zip(states[0], states[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-8)


def test_per_group_alphas_fused_matches_xla():
    """SolverConfig.field_split_alphas: per-group LMR step sizes. The fused
    kernel with alpha_groups must reproduce the XLA V-cycle built with
    field_groups (which derives the same per-group alphas), and the
    per-group cycle must differ from the global-alpha one (it really is a
    different — strictly better — line search)."""
    pb = make_b2(nx=16, ny=16)
    g, F = pb.grid, pb.n_fields
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    dt = jnp.asarray(0.05, jnp.float32)
    r = _rand_r(g, F, seed=7)

    xla_build = make_gmg(g, pb.terms_precond, F, dtype=jnp.float32,
                         nu_pre=2, nu_post=2, coarse_sweeps=8,
                         dense_coarse_max_dofs=0,
                         field_groups=pb.field_groups,
                         field_split_alphas=True)
    z_xla = xla_build(w, w, dt)(r)

    grids = build_hierarchy(g)
    fused = make_fused_vcycle(grids, pb.terms_precond, F, nu_pre=2,
                              nu_post=2, coarse_sweeps=8, dtype=jnp.float32,
                              field_groups=pb.field_groups,
                              alpha_groups=pb.field_groups, interpret=True)
    w_ls, pinvs = _ladder(grids, pb.terms_precond, F, w, dt)
    z_fused = fused(r, w_ls, w_ls, dt, pinvs)
    for a, b in zip(z_fused, z_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)

    # and it is NOT the global-alpha cycle
    glob = make_fused_vcycle(grids, pb.terms_precond, F, nu_pre=2,
                             nu_post=2, coarse_sweeps=8, dtype=jnp.float32,
                             field_groups=pb.field_groups, interpret=True)
    z_glob = glob(r, w_ls, w_ls, dt, pinvs)
    assert max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(z_fused, z_glob)) > 1e-4


def test_bench6_split_blocks_block_diagonal():
    """bench6's (c,mu)+(phi) split: exact zero cross blocks INCLUDING the
    Dirichlet phi rows (a BC row mixes phi only with itself)."""
    from pfhubbenchmarks_tpu.benchmarks.bench6 import make as make_b6

    pb = make_b6(nx=8, ny=8)
    g, F = pb.grid, pb.n_fields
    w = tuple(a.astype(jnp.float32) for a in pb.initial_state())
    bj = make_block_jacobi(g, pb.terms_precond, F, dirichlet=pb.dirichlet,
                           dtype=jnp.float32)(w, w, 0.05)
    partners = {}
    for grp in pb.field_groups:
        for i in grp:
            partners[i] = set(grp)
    for plane in bj.pinv_planes:
        a = np.asarray(plane)
        for i in range(F):
            for j in range(F):
                if j not in partners[i]:
                    assert np.all(a[i, j] == 0.0), (i, j)
    full = make_block_jacobi(g, pb.terms, F, dirichlet=pb.dirichlet,
                             dtype=jnp.float32)(w, w, 0.05)
    assert np.abs(np.asarray(full.pinv_planes[0])[0, 2]).max() > 0
