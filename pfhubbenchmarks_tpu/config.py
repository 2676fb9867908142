"""Global configuration: precision policy and solver defaults.

The reference (vpuri3/PFHubBenchmarks) hardcodes parameters at the top of each
driver script and relies on two ambient config systems (FFC form-compiler
parameters, PETSc options DB) — see dolfin/bench1.py:14-16, dolfinx/b1.py:164-180.
Here configuration is explicit dataclasses; benchmarks own a ``SolverConfig``
and a physics parameter dataclass each.
"""

from __future__ import annotations

import dataclasses
import os


def setup_compile_cache(directory: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The axon remote-compile path takes ~15 min for the full jitted
    Newton-multigrid program; the persistent cache turns every later run
    (including fresh processes) into a ~10 s load. Verified effective under
    the axon PJRT plugin.
    """
    import jax

    if directory is None:
        directory = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(directory))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # TPU einsums/dots default to bf16 MXU passes in f32 — catastrophic for
    # J.v accuracy in the mixed-precision Krylov path (observed: marginal
    # Newton solves flip to failure and the adaptive-dt trajectory collapses).
    # The assembly einsums contract tiny static dims, so HIGHEST is ~free.
    jax.config.update("jax_default_matmul_precision", "highest")


def enable_x64() -> None:
    """Enable float64. Call before creating arrays.

    Validation parity with the reference CSVs (tolerances ~1e-6) requires
    f64; TPU executes f64 via emulation (~3-4x slower on v5e, still far
    faster than the MPI/FEniCS baseline for these problem sizes).
    """
    import jax

    jax.config.update("jax_enable_x64", True)


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Newton-Krylov settings mirroring the reference's SNES/KSP setup.

    Reference: dolfin/bench1.py:82-111 — SNES atol 1e-6, max 10 iterations,
    line search 'basic'/'cp', GMRES(restart 30, rtol 1e-5, <=1000 iters) + SOR.
    SOR is inherently sequential, so the TPU build uses a pointwise
    block-Jacobi preconditioner instead (solve/precond.py).
    """

    newton_atol: float = 1e-6
    # SNES-equivalent convergence threshold in OUR residual norm, for the
    # iteration count fed to the adaptive-dt controller (solve/newton.py).
    # None = report raw counts. Calibrated with tools/parity_lab.py against
    # the reference time grids (the committed CSVs encode SNES's decisions).
    report_atol: float | None = None
    newton_rtol: float = 1e-8       # PETSc SNES default rtol
    newton_stol: float = 1e-8       # PETSc SNES default stol (step-size test)
    newton_max_iters: int = 10
    newton_div_tol: float = 1e4     # PETSc SNES divergence tolerance
    # Early abort of doomed solve attempts: mark the attempt failed once
    # this many CONSECUTIVE Newton iterations pass without ||F|| improving
    # to < 0.9x its best-so-far. Rationale (failhist_probe, round 4): the
    # adaptive controller's rejected dt attempts walk all newton_max_iters
    # (limit-cycling ||F||) before the halving kicks in — on bench2 that is
    # 43% of ALL Krylov work (krylov_all 14005 vs 8036 accepted). SNES has
    # no such abort (the reference pays the full walk), but the REJECTED
    # verdict is identical either way, so the trajectory is unchanged as
    # long as the rule never fires on an attempt that would have converged
    # — it is therefore gated to best-so-far > report_atol (the SNES-
    # equivalent acceptance threshold) and sized from the measured
    # worst-case stall of converged attempts (per-benchmark probes).
    # 0 = off (the SNES-faithful default).
    newton_stall_abort: int = 0
    line_search: str = "basic"      # 'basic' | 'bt' | 'cp'
    krylov: str = "fgmres"          # 'gmres' | 'fgmres' | 'bicgstab'
    krylov_rtol: float = 1e-5       # PETSc KSP default rtol
    krylov_atol: float = 1e-50
    # Inexact-Newton truncation floor: the linear solve additionally stops at
    # ``krylov_atol_frac * newton_atol`` ABSOLUTE residual — solving the last
    # Newton iterations' systems to rtol*||F_k|| pushes the linear residual
    # decades below the nonlinear tolerance for no benefit (||F_{k+1}|| is
    # bounded by the linear residual, which only needs to sit under
    # newton_atol). Measured (r3 CPU lab, bench1 full adaptive run, frac
    # 0.1): Krylov 11403 -> 9969 (-12.6%) with IDENTICAL time grid, Newton
    # counts, matched-row prefix (21), and curve error (2.68e-3 interp).
    # Default 0.01: bench6's small-magnitude fields lose golden-row TFE
    # accuracy at 0.1 (1.14e-6 rel vs the 1e-6 gate; 1.7e-7 at 0.01 —
    # .scratch/b6_floor_probe.py). bench1/2/3 opt into 0.1 (probed: same
    # trajectories). 0 disables.
    krylov_atol_frac: float = 0.01
    # Eisenstat–Walker adaptive forcing (choice 2, the PETSc -snes_ksp_ew
    # family): Newton iteration k's linear solve stops at relative residual
    # eta_k = gamma*(||F_k||/||F_{k-1}||)^2 (safeguarded, capped at
    # ew_eta_max, floored at krylov_rtol) instead of the fixed KSP rtol —
    # iterations far from the root don't deserve 1e-5 solves. 'fixed'
    # reproduces PETSc's default constant-rtol behavior (what the reference
    # runs). NOTE the dt controller consumes Newton counts, so looser early
    # solves can shift the adaptive trajectory — enable per benchmark only
    # after a trajectory probe.
    krylov_forcing: str = "fixed"   # 'fixed' | 'ew'
    ew_eta0: float = 0.3
    ew_eta_max: float = 0.9
    ew_gamma: float = 0.9
    # dt-gated forcing: EW applies only to solves with dt >= ew_dt_min;
    # below it the fixed KSP rtol is used. Rationale (measured, r3): the
    # SNES-count-calibrated adaptive prefix (report_atol) is walked at small
    # dt, where solves are cheap (~10 Krylov iters/Newton) and full EW
    # perturbs the controller's decisions off the reference grid (bench1
    # matched rows 21 -> 13); the Krylov cost concentrates at large dt
    # (30-45 iters/Newton at dt >= 12.8). Gating keeps the calibrated
    # prefix bit-identical while cutting the expensive tail. 0 = ungated
    # DELIBERATELY; None (the default) = unset — flipping krylov_forcing to
    # 'ew' without choosing a gate warns loudly and runs ungated, because
    # ungated EW was MEASURED to break controller parity on every benchmark
    # that tried it (bench1 matched rows 21 -> 13, bench2 28 -> 13; round-3
    # session G labs). Benchmarks that ship EW set their calibrated gate
    # explicitly (benchmarks/bench1.py: 5.0).
    ew_dt_min: float | None = None
    # Sized so that marginal solves (the ones that decide whether a dt step
    # is accepted) get the same chance as the reference's 1000-iteration SOR
    # budget (dolfin/bench1.py:110) — a premature linear "failure" halves dt
    # off the reference trajectory. With the V-cycle preconditioner 400 is
    # beyond anything a convergent solve needs.
    krylov_max_iters: int = 400
    gmres_restart: int = 30
    # LGMRES-style augmented restarts for fgmres (solve/krylov.py): keep the
    # last k restart-cycle error approximations and spend each later cycle's
    # first k slots on them. Targets restart stall in the large-dt CH solves
    # (30-991 iterations across many GMRES(30) cycles); augmented slots cost
    # one J·v instead of a V-cycle apply. 0 = off.
    fgmres_aug: int = 0
    # Run the Krylov solve (J.v, basis ops, preconditioner) in float32 while
    # Newton-level residuals/norms stay in the solver dtype. See
    # solve/newton.py. No effect when the solver dtype is already float32.
    mixed_precision: bool = True
    # Two-stage precision Newton residuals: evaluate ||F|| in f32 while it
    # is far above the f32 assembly's measured cancellation-noise floor,
    # recompute in emulated f64 near the thresholds — TPU f64 residuals
    # measured 13x the f32 cost (20.7 vs 1.6 ms at 350²). OFF by default:
    # the f32-assembled Krylov RHS injects a forcing term ~floor/||F|| that
    # can shift Newton counts by one near the dt-controller's thresholds
    # (observed on bench1/bench3 CPU labs even at margin=1000), and count
    # parity outranks the ~10%% wall saving until the incremental-residual
    # design lands.
    fast_residual: bool = False
    # f32 is trusted only while ||F|| > margin * (measured f32 assembly
    # noise floor at the initial guess); see solve/newton.py.
    fast_residual_margin: float = 1000.0
    # Two-stage precision for LINE-SEARCH residuals only (cp's secant, bt's
    # decrease test): these steer the step length and never feed the carry,
    # Krylov RHS, or convergence decisions, so the f32 path is count-safe
    # (verified: bench2/bench6 trajectories identical). Saves one emulated
    # f64 residual per Newton iteration on cp/bt benchmarks.
    fast_linesearch: bool = True
    # Fused Pallas kernels for J.v products: 'auto' enables them on TPU
    # backends when the grids fit VMEM (ops/pallas_residual.py).
    use_pallas: str = "auto"        # 'auto' | 'on' | 'off'
    # Row-block-tiled sweep kernels (ops/pallas_tiled.py) for levels that
    # exceed the whole-array VMEM envelope (bench2's 6-field fine level,
    # bench3's 350^2): lax.map over per-block kernels with host-precomputed
    # edge masks (in-kernel iota/bool masking SIGABRTs the remote Mosaic
    # compiler). Measured: bench3 51->40 s, bench2 55->44 s.
    use_tiled_sweeps: bool = True
    # Grid-form tiled kernels (ops/pallas_tiled_grid.py): ONE pallas_call
    # with grid=(nb,) per sweep/J.v instead of nb unrolled launches. The
    # hand-written tangent assembly (jvp of the POINTWISE physics only)
    # retires the round-3 Mosaic grid+jvp SIGABRT; this flag selects it
    # over the unrolled-launch kernels where tiling engages. Measured
    # wall-NEUTRAL at current defaults (chain_r33/r36: bench3 11.096 vs
    # 11.09 s, bench2 10.076 vs 10.08 s with identical iteration counts —
    # the production fused/split paths don't route through the tiled
    # sweeps), so it stays a capability default-off: it matters for the
    # unfused path (use_pallas without fusion) and any future
    # VMEM-exceeding shape the fused paths can't take.
    tiled_grid_kernels: bool = False
    # 3D: allow the z-slab tiled kernels at nb=1 (block_rows == nz) on
    # levels where the fori-loop whole-array kernel exceeds VMEM but one
    # slab kernel fits — bench1_3d's 25³ otherwise falls through to the
    # XLA einsum path, and gmg_kcycle multiplies exactly that level's work
    # (3x at the default kcycle=3). Default OFF until the TPU verdict
    # (tools/probes/b13d_attrib_probe.py times both paths).
    tiled_nb1_3d: bool = False
    # Whole-V-cycle fusion (ops/pallas_vcycle.py): ONE kernel per M^-1
    # application, with the (z, Az) matvec pair fused in. 'auto' engages it
    # whenever the dyadic/no-BC/VMEM gates pass — right for bench1 (2-field
    # 100^2: 0.22 ms/apply). 'off' keeps the per-level whole-phase kernels,
    # which can win on wider systems (bench2 6-field: fused apply measured
    # 1.7 ms vs ~0.04 ms per smoothing phase) and composes with the exact
    # dense coarse solve, which the fused kernel lacks. 'split_levels'
    # builds per-level descend/ascend kernel pairs around the exact dense
    # coarse solve (bench3's production path: VMEM-exceeding fine level,
    # 2(L-1) launches/apply). 'split_chain' fuses the WHOLE descent and the
    # WHOLE ascent into one kernel each around the dense coarse (2 launches
    # + dense/apply) — for hierarchies whose every level fits VMEM together.
    fuse_vcycle: str = "auto"  # 'auto' | 'off' | 'split_levels' | 'split_chain'
    precond: str = "gmg"            # 'none' | 'block_jacobi' | 'gmg'
    # Field-split preconditioning (the PETSc -pc_fieldsplit analog): build
    # the ENTIRE preconditioner hierarchy (level residual linearizations,
    # pointwise block inverses, in-kernel tangents) from the problem's
    # ``terms_precond`` — a copy of ``terms`` with lax.stop_gradient on the
    # cross-group couplings — so the preconditioner Jacobian is block-
    # diagonal by field group (benchmarks declare ``field_groups``). The
    # outer Krylov operator stays the TRUE coupled Jacobian; FGMRES absorbs
    # the dropped coupling as iterations. Wins when the monolithic F-field
    # smoother is apply-cost-bound: bench2's 6-field V-cycle pays ~F² block
    # coupling per sweep (36 pinv plane-FMAs + dense 6-field tangent), the
    # split pays 2²+4 (8) with the AC tangents decoupled. No-op for
    # problems that don't declare ``terms_precond``.
    field_split: bool = False
    # Per-group LMR step sizes when field_split engages: the split
    # operator's Az planes are group-disjoint, so the smoother's line
    # search decouples EXACTLY into per-group scalars (PETSc fieldsplit's
    # separate-block semantics) — strictly better residual reduction per
    # sweep for G extra in-kernel reductions. Separate knob so the TPU
    # verdict can be measured independently of field_split itself.
    field_split_alphas: bool = True
    # When to (re)build the preconditioner: 'newton' = every Newton
    # iteration (SNES default), 'solve' = once per nonlinear solve at the
    # initial guess. FGMRES is flexible, so a lagged preconditioner changes
    # only iteration counts, never correctness; the build (AD node-block
    # inverses at every level + staging) measured 4-8 ms per call on TPU.
    precond_lag: str = "newton"     # 'newton' | 'solve'
    # Dense preconditioner (precond='dense') implementation + refinement.
    # 'auto' = LAPACK on CPU, matmul-only mxu_inverse elsewhere (TPU's
    # LU/TriangularSolve expanders are bf16-poisoned — solve/mxu_inverse.py);
    # 'lapack' / 'mxu' force a path (mxu on CPU emulates the TPU factor
    # quality for labs). dense_refine_iters = Newton–Schulz passes applied
    # to the mxu factor; each pass costs ~2n^3 f64-EMULATED matmuls on TPU
    # (~40 s at elast's n=10.5k), so production configs that polish with an
    # outer f64 loop (mixed-precision Newton-as-iterative-refinement)
    # should set 0 and let FGMRES absorb the factor's error tail.
    dense_impl: str = "auto"        # 'auto' | 'lapack' | 'mxu'
    dense_refine_iters: int = 3
    # Quadrature rule for the PRECONDITIONER's operator only (V-cycle J.v,
    # smoothers, block inverses). The outer Newton residual and Krylov
    # matvec keep the FFC-parity 'ffc3' rule (4 pts/triangle), so converged
    # solutions are bit-identical; the V-cycle merely approximates the
    # inverse of a 1-point-rule rediscretization ('dunavant1') — ~4x fewer
    # physics evaluations and FMA ladders per sweep. None = same rule as
    # the residual.
    precond_rule: str | None = None
    # Krylov OPERATOR rule: 'true' (default) linearizes the full-rule
    # residual for the outer J.v — the exact Jacobian, solutions
    # bit-identical to the reference discretization. 'precond_rule' builds
    # the ENTIRE linear solve (matvec, exported fused pair, initial/restart
    # residuals) on the precond_rule rediscretization instead —
    # defect-correction inexact Newton: each Newton step solves
    # J~ d = -F(true) where J~ is the cheap-rule Jacobian. The Newton
    # residual/convergence stays the true-rule f64 assembly, so converged
    # states still satisfy the true equations to newton_atol; only the
    # step direction is approximate (few-% operator perturbation). Wins
    # twice where the rules differ: the per-iteration J.v drops to the
    # cheap rule's cost (3D: nq 8 -> 4), and M was built from J~ EXACTLY,
    # so M^-1 J~ clusters tighter than M^-1 J. Requires mixed_precision
    # (it rides the residual_lowp path); no-op when precond_rule is None.
    krylov_operator: str = "true"   # 'true' | 'precond_rule'
    # geometric-multigrid settings (precond='gmg')
    gmg_nu_pre: int = 2
    gmg_nu_post: int = 2
    # FINEST-level-only smoothing override (0 = inherit nu_pre/nu_post).
    # The fine level carries ~75% of the per-sweep cost in a dyadic 2D
    # hierarchy, and the fused V-cycle kernel is serial-depth bound
    # (~44 J.v-class evals/apply, vt_b1 r4) — a cheaper fine phase with
    # full-strength smoothing below is the one asymmetry the round-3
    # global-nu ladder (2/1, 1/2, 3/1: all rejected, +24-36% iters)
    # never probed.
    gmg_nu_fine_pre: int = 0
    gmg_nu_fine_post: int = 0
    # 'v' | 'w': W-cycle takes two coarse corrections per level (residual
    # recomputed between) — stronger on stiff large-dt systems for ~the
    # cost of extra coarse-level visits (cheap in the fused kernels).
    gmg_cycle: str = "v"
    # K(s)-style inner acceleration at the top of the cycle: each
    # preconditioner application runs s >= 2 minimal-residual-combined
    # V-cycles (z_acc += alpha_j V(r_j), r_{j+1} = r_j - alpha_j A z_j)
    # instead of one. The outer FGMRES then needs ~s-fold fewer iterations,
    # and in the fully fused kernel the s V-cycles share ONE launch — on
    # launch-latency-bound problems (bench1's 100² pair is ~0.32 ms of
    # which most is launch/staging) this converts per-iteration overhead
    # into useful smoothing. 1 = plain V-cycle (default).
    gmg_inner_mr: int = 1
    # K-cycle (Notay): >= 2 makes every coarse-level visit a K-step MR
    # combination of recursive cycle applications instead of one — the
    # standard fix when a weak coarse correction (e.g. bench1_3d's ratio-5
    # 25³ -> 5³ jump) caps V-cycle quality. Extra visits land on coarse
    # levels (1/8 the fine work in 3D), so cycle cost grows ~15-25% while
    # stiff-regime convergence can improve several-fold. Currently honored
    # by the 3D cycle (solve/gmg3d.py); the fused 2D kernels keep plain
    # V/W cycles (in-kernel depth is their binding cost, see gmg_inner_mr).
    gmg_kcycle: int = 1
    gmg_omega: float = 0.8
    gmg_coarse_sweeps: int = 24
    gmg_max_levels: int = 10
    # Exact dense coarse solve threshold (solve/gmg.make_dense_coarse):
    # coarsest levels at or below this dof count get a materialized
    # row-equilibrated f32 inverse instead of LMR sweeps (unfused path; the
    # fused kernel keeps in-kernel sweeps).
    gmg_dense_coarse_max_dofs: int = 1500
    # hierarchy floor: stop coarsening an axis below this many cells
    gmg_min_cells: int = 7


@dataclasses.dataclass(frozen=True)
class TimeConfig:
    """Adaptive implicit-Euler driver settings (dolfin/bench1.py:136-183)."""

    t0: float = 0.0
    dt0: float = 1e-1
    dt_min: float = 1e-2
    # Optional ceiling applied after the grow rule. The reference has no
    # explicit dt_max, but a benchmark's committed trajectory can encode an
    # EFFECTIVE one: bench6's SNES+SOR linear solver fails every dt=0.64
    # attempt (verified with tools/parity_lab.py: steps 7-14 each show one
    # implied failure at 0.64 where our FGMRES+GMG converges in 3
    # iterations), so its 14-row grid is exactly the dt_max=0.32 walk.
    dt_max: float | None = None
    end_time: float = 1e3
    # Reference rule: double dt if Newton converged in < grow_threshold
    # iterations, else halve (floored at dt_min). dolfin/bench1.py:179-183.
    grow_threshold: int = 5
    # Hysteresis variant (dolfinx/b13d.py:306-310): halve only when iters >
    # shrink_threshold, keep dt in between. None = the classic 2-way rule.
    shrink_threshold: int | None = None


def default_device_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Factor n devices into a near-square (my, mx) 2D mesh."""
    my = int(n_devices**0.5)
    while n_devices % my:
        my -= 1
    return my, n_devices // my


def running_under_pytest() -> bool:
    return "PYTEST_CURRENT_TEST" in os.environ
