"""Benchmark problem container: everything a driver needs, declaratively.

The reference expresses each benchmark as a ~250-line script owning mesh,
parameters, ICs, weak form, solver config, time loop and I/O
(dolfin/bench{1,2,3,6}.py). Here a benchmark is data: a grid, a pointwise
``terms`` function, ICs, observables, and configs — the shared machinery
lives in fem/, solve/ and timeloop.py.
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Callable, Sequence

import jax.numpy as jnp

from pfhubbenchmarks_tpu.config import SolverConfig, TimeConfig
from pfhubbenchmarks_tpu.fem.assembly import DirichletBC, make_functional, make_residual
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.solve.precond import BUILDERS


def is_multidevice_state(state) -> bool:
    """True if any leaf of ``state`` is sharded across more than one device."""
    import jax

    for leaf in jax.tree_util.tree_leaves(state):
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None and len(sharding.device_set) > 1:
            return True
    return False


def gate_pallas_for_state(problem, state):
    """Resolve ``use_pallas='auto'`` to OFF when the state is sharded.

    The production Pallas paths (whole-array fused V-cycle, tiled sweeps,
    fused J.v) are whole-array ``pallas_call``s: handing them operands
    sharded over a device mesh makes XLA all-gather every input per call —
    a silent cliff the reference's MPI+SOR stack doesn't have (it degrades
    gracefully under partitioning, dolfinx/pfbase/pde_problems.py:150-161).
    Multi-chip runs therefore use the pure-XLA assembly/V-cycle, which the
    SPMD partitioner shards properly (tests/test_sharding.py).

    Returns ``(problem, regated)``; ``regated`` means the solver config was
    replaced and any Runner built from the old problem must be rebuilt.
    Explicit ``use_pallas='on'`` with a sharded state is a hard error.
    """
    if not is_multidevice_state(state):
        return problem, False
    s = problem.solver
    if s.use_pallas == "on":
        raise ValueError(
            f"{problem.name}: use_pallas='on' with a state sharded over "
            ">1 device — whole-array Pallas kernels would force a gather "
            "per call. Use use_pallas='auto' (resolves off under sharding) "
            "or run single-device.")
    if s.use_pallas == "off" or not problem._pallas_backend_ok():
        return problem, False
    gated = dataclasses.replace(problem, solver=dataclasses.replace(
        s, use_pallas="off"))
    return gated, True


@dataclasses.dataclass
class BenchmarkProblem:
    name: str
    grid: CrossedTriGrid
    field_names: tuple[str, ...]
    terms: Callable                       # QPContext -> (source, flux)
    ic_fns: Sequence[Callable]            # per-field fn(x, y)
    observables: dict[str, Callable]      # name -> density(QPContext)
    csv_columns: tuple[str, ...]          # e.g. (time, total_free_energy, total_solute)
    time: TimeConfig = TimeConfig()
    solver: SolverConfig = SolverConfig()
    # (field, side, fn(coord)) specs — instantiated per grid so multigrid can
    # rebuild BCs on coarse levels
    dirichlet_spec: tuple = ()
    # Field-split preconditioning (SolverConfig.field_split): a copy of
    # ``terms`` with lax.stop_gradient on cross-group couplings, so every
    # preconditioner linearization is block-diagonal by ``field_groups``
    # (the PETSc -pc_fieldsplit analog; see config.py). The outer
    # residual/Krylov operator always uses ``terms``.
    terms_precond: typing.Optional[Callable] = None
    field_groups: typing.Optional[tuple] = None
    needs_coords: bool = False
    dtype: type = jnp.float64
    # optional scaling applied to an observable value after integration
    observable_scale: dict[str, float] = dataclasses.field(default_factory=dict)
    # optional early-abort predicate on a CSV row dict (bench3: TFE < 0,
    # dolfin/bench3.py:254-258)
    abort_condition: typing.Optional[Callable[[dict], bool]] = None
    # device-side twin of abort_condition for the fused whole-run driver
    # (timeloop.run_fused): fn(row jnp array [1+n_obs]) -> bool scalar
    abort_device: typing.Optional[Callable] = None
    # non-integral observables: name -> fn(state) -> scalar (e.g. point
    # samples via fem/sample.py)
    custom_observables: dict[str, Callable] = dataclasses.field(default_factory=dict)
    # fused-driver segmentation hint: None = whole run as ONE dispatch
    # (the 2D benchmarks, <= ~12 s device time); an int = drive fused runs
    # in segments of this many accepted steps (timeloop.run_fused_segmented)
    # because one whole-run dispatch exceeds what the remote TPU worker
    # tolerates (bench1_3d at 50³ crashes it DURING the run — with and
    # without Pallas — while a ~48 s dispatch completes; chain_r19).
    fused_seg_rows: typing.Optional[int] = None

    @property
    def n_fields(self) -> int:
        return len(self.field_names)

    def dirichlet_for(self, grid) -> tuple[DirichletBC, ...]:
        return tuple(DirichletBC.make(grid, f, side, fn)
                     for (f, side, fn) in self.dirichlet_spec)

    @property
    def dirichlet(self) -> tuple[DirichletBC, ...]:
        return self.dirichlet_for(self.grid)

    def initial_state(self):
        v, m = self.grid.interpolate(self.ic_fns)
        v = jnp.asarray(v, self.dtype)
        m = jnp.asarray(m, self.dtype)
        for bc in self.dirichlet:
            v = bc.apply_value(v)
        return v, m

    def residual(self, dtype=None):
        return make_residual(
            self.grid, self.terms, self.n_fields, dirichlet=self.dirichlet,
            needs_coords=self.needs_coords, dtype=dtype or self.dtype,
        )

    @property
    def mixed_precision(self) -> bool:
        return self.solver.mixed_precision and self.dtype == jnp.float64

    def _krylov_grid(self):
        """Grid whose rule assembles the KRYLOV operator (J.v, fused pair).

        config.krylov_operator='precond_rule': the whole linear solve runs
        on the precond_rule rediscretization (defect-correction inexact
        Newton — see config.py). Default: the true-rule grid."""
        import dataclasses as _dc

        s = self.solver
        if s.krylov_operator == "precond_rule" and s.precond_rule:
            return _dc.replace(self.grid, rule_name=s.precond_rule)
        return self.grid

    def residual_lowp(self):
        """f32 TRUE-rule residual for the mixed-precision path (staged
        Newton residual / fast linesearch stay true-rule even under
        krylov_operator='precond_rule')."""
        return self.residual(dtype=jnp.float32) if self.mixed_precision else None

    def krylov_residual_lowp(self):
        """f32 residual whose linearization is the KRYLOV operator, when it
        differs from the true rule (config.krylov_operator='precond_rule':
        defect-correction inexact Newton). None = use residual_lowp."""
        kg = self._krylov_grid()
        if not self.mixed_precision or kg is self.grid:
            return None
        return make_residual(kg, self.terms, self.n_fields,
                             dirichlet=self.dirichlet,
                             needs_coords=self.needs_coords,
                             dtype=jnp.float32)

    def _pallas_backend_ok(self) -> bool:
        """Backend/flag gate only — VMEM feasibility is judged per grid
        (multigrid levels coarser than the fine grid may fit when it
        doesn't). Periodic grids are excluded: the scalar-FMA kernel
        assembly has no wraparound gather."""
        if (self.solver.use_pallas == "off" or self.needs_coords
                or self.grid.periodic):
            return False
        if self.solver.use_pallas == "on":
            return True
        import jax

        return "TPU" in jax.devices()[0].device_kind

    def _pallas_enabled(self) -> bool:
        if not self._pallas_backend_ok():
            return False
        from pfhubbenchmarks_tpu.ops.pallas_residual import fits_vmem

        return fits_vmem(self.grid, self.n_fields)

    def lowp_jvp_factory(self):
        """Fused Pallas J.v for the Krylov matvec (TPU), else None.

        Whole-array kernel when the grid fits scoped VMEM; otherwise the
        row-block-tiled kernel (ops/pallas_tiled.make_tiled_jvp) — the XLA
        einsum J.v at bench3's 350² measured 1.6-2.2 ms (op-count bound)
        and is the single largest per-Krylov-iteration cost there."""
        if not self.mixed_precision or not self._pallas_backend_ok():
            return None
        bcs = self.dirichlet

        def _with_bcs(jv_fn):
            def factory(x_lp, wprev_lp, dt_lp):
                inner = jv_fn(x_lp, wprev_lp, dt_lp)

                def jvp(v):
                    rv, rm = inner(v)
                    for bc in bcs:
                        f, i = bc.field, bc.index
                        if bc.side in ("left", "right"):
                            rv = rv.at[f, :, i].set(v[0][f, :, i])
                        else:
                            rv = rv.at[f, i, :].set(v[0][f, i, :])
                    return rv, rm

                return jvp

            return factory

        kg = self._krylov_grid()
        if self._pallas_enabled():
            from pfhubbenchmarks_tpu.ops.pallas_residual import make_pallas_jvp

            pjv = make_pallas_jvp(kg, self.terms, self.n_fields,
                                  dtype=jnp.float32)
            return _with_bcs(
                lambda x, w0, dt: (lambda v: pjv(x, w0, dt, v)))

        from pfhubbenchmarks_tpu.ops.pallas_tiled import (
            choose_block_rows_vmem, make_tiled_jvp)

        nq = kg.tab().nq
        bc_rows = choose_block_rows_vmem(kg, self.n_fields, nq)
        if bc_rows is None or bc_rows >= kg.ny:
            return None
        prep, jv = make_tiled_jvp(kg, self.terms, self.n_fields,
                                  dtype=jnp.float32, block_rows=bc_rows)

        def tiled(x, w0, dt):
            staged = prep(x, w0)
            return lambda v: jv(v, staged, dt)

        return _with_bcs(tiled)

    def precond_builder(self):
        kind = self.solver.precond
        # the preconditioner's output must match the Krylov vector dtype
        kry_dtype = jnp.float32 if self.mixed_precision else self.dtype
        if kind == "none":
            return BUILDERS["none"]()
        if kind == "gmg":
            from pfhubbenchmarks_tpu.solve.gmg import make_gmg

            s = self.solver
            # field_split: the preconditioner hierarchy linearizes the
            # stop_gradient'ed terms_precond (block-diagonal Jacobian); the
            # exported matvec / outer operator stays the true terms
            split = s.field_split and self.terms_precond is not None
            pterms = self.terms_precond if split else self.terms
            return make_gmg(
                self.grid, pterms, self.n_fields,
                matvec_terms=(self.terms if split else None),
                field_groups=(self.field_groups if split else None),
                field_split_alphas=s.field_split_alphas,
                dirichlet_for=self.dirichlet_for, dtype=kry_dtype,
                needs_coords=self.needs_coords, nu_pre=s.gmg_nu_pre,
                nu_post=s.gmg_nu_post, nu_fine_pre=s.gmg_nu_fine_pre,
                nu_fine_post=s.gmg_nu_fine_post, omega=s.gmg_omega,
                coarse_sweeps=s.gmg_coarse_sweeps, max_levels=s.gmg_max_levels,
                use_pallas=self._pallas_backend_ok(),
                use_tiled_sweeps=s.use_tiled_sweeps,
                tiled_grid_kernels=s.tiled_grid_kernels,
                fuse_vcycle=s.fuse_vcycle,
                true_matvec=(s.krylov_operator != "precond_rule"),
                precond_rule=s.precond_rule, min_cells=s.gmg_min_cells,
                dense_coarse_max_dofs=s.gmg_dense_coarse_max_dofs,
                cycle=s.gmg_cycle, inner_mr=s.gmg_inner_mr,
            )
        extra = {}
        if kind == "dense":
            extra = dict(impl=self.solver.dense_impl,
                         refine_iters=self.solver.dense_refine_iters)
        return BUILDERS[kind](
            self.grid, self.terms, self.n_fields, dirichlet=self.dirichlet,
            dtype=kry_dtype, needs_coords=self.needs_coords, **extra,
        )

    def observable_fns(self):
        out = {}
        for name, density in self.observables.items():
            fn = make_functional(self.grid, density, needs_coords=self.needs_coords,
                                 dtype=self.dtype)
            s = self.observable_scale.get(name)
            if s is not None:
                base = fn
                fn = (lambda b, sc: (lambda w: b(w) * sc))(base, s)
            out[name] = fn
        out.update(self.custom_observables)
        return out
