"""Benchmark registry + shared CLI runner.

Run any benchmark as::

    python -m pfhubbenchmarks_tpu.benchmarks.bench1 [--end-time T] [--out CSV]

(replaces the reference's per-script ``python dolfin/bench<N>.py`` entry
points, README.md:18-29).
"""

from __future__ import annotations

import argparse
import importlib
import time

_BENCHMARKS = {
    "bench1": "pfhubbenchmarks_tpu.benchmarks.bench1",
    "bench2": "pfhubbenchmarks_tpu.benchmarks.bench2",
    "bench3": "pfhubbenchmarks_tpu.benchmarks.bench3",
    "bench6": "pfhubbenchmarks_tpu.benchmarks.bench6",
    "bench1_3d": "pfhubbenchmarks_tpu.benchmarks.bench1_3d",
    "bench6_3d": "pfhubbenchmarks_tpu.benchmarks.bench6_3d",
    "elast": "pfhubbenchmarks_tpu.benchmarks.elast",
    "poisson": "pfhubbenchmarks_tpu.benchmarks.poisson",
    "poisson3d": "pfhubbenchmarks_tpu.benchmarks.poisson3d",
}


def get_benchmark(name: str, **kwargs):
    # reduced BM2 variants (dolfin/bench2_eta1.py / bench2_eta2.py)
    if name in ("bench2_eta1", "bench2_eta2"):
        kwargs.setdefault("num_eta", int(name[-1]))
        name = "bench2"
    # the periodic BM1 the reference authored but never enabled
    # (dolfin/pfbase.py:11-37)
    if name == "bench1_periodic":
        kwargs.setdefault("periodic", True)
        name = "bench1"
    if name not in _BENCHMARKS:
        raise ValueError(f"unknown benchmark {name!r}; have {sorted(_BENCHMARKS)}")
    mod = importlib.import_module(_BENCHMARKS[name])
    return mod.make(**kwargs)


def main(name: str, argv=None) -> None:
    ap = argparse.ArgumentParser(description=f"PFHub {name} (TPU-native)")
    ap.add_argument("--end-time", type=float, default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--out", type=str, default=f"results/{name}_out.csv")
    ap.add_argument("--nx", type=int, default=None)
    ap.add_argument("--ny", type=int, default=None)
    ap.add_argument("--nz", type=int, default=None, help="3D benchmarks only")
    ap.add_argument("--f32", action="store_true", help="float32 state (perf mode)")
    ap.add_argument("--mesh", type=str, default=None, metavar="MYxMX",
                    help="shard the run over a MYxMX device mesh "
                         "(spatial domain decomposition, e.g. 2x4)")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--replay", type=str, default=None, metavar="CSV",
                    help="replay the time grid of a reference CSV (column 0) "
                         "instead of running the adaptive controller")
    ap.add_argument("--no-damped-rescue", action="store_true",
                    help="replay mode: skip the damped-Newton rescue rungs "
                         "(a separate large compile that can crash the "
                         "tunneled TPU worker on the largest grids; the "
                         "2x(dt/2) substep fallback still applies)")
    ap.add_argument("--fused", action="store_true",
                    help="whole run as one device dispatch (timeloop."
                         "run_fused); excludes checkpoints/stats/fields "
                         "hooks and abort conditions")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="directory for checkpoint/resume")
    ap.add_argument("--resume", action="store_true", help="resume from --checkpoint")
    ap.add_argument("--save-fields", type=int, default=0, metavar="N",
                    help="write VTI field snapshots every N steps (+ PVD index)")
    ap.add_argument("--fields-dir", type=str, default=None)
    ap.add_argument("--stats-log", type=str, default=None,
                    help="append per-step solver stats as JSONL")
    ap.add_argument("--trace", type=str, default=None,
                    help="jax.profiler trace directory (TensorBoard)")
    args = ap.parse_args(argv)

    from pfhubbenchmarks_tpu.config import enable_x64, setup_compile_cache

    setup_compile_cache()
    if not args.f32:
        enable_x64()

    kwargs = {}
    if args.nx:
        kwargs["nx"] = args.nx
    if args.ny:
        kwargs["ny"] = args.ny
    if args.nz:
        kwargs["nz"] = args.nz
    if args.f32:
        import jax.numpy as jnp

        kwargs["dtype"] = jnp.float32

    mesh_shape = None
    if args.mesh:
        mesh_shape = tuple(int(v) for v in args.mesh.lower().split("x"))
        if len(mesh_shape) != 2:
            raise SystemExit(f"--mesh wants MYxMX, got {args.mesh!r}")

    problem = get_benchmark(name, **kwargs)
    if mesh_shape is not None:
        # rebuild with mesh-divisible padded storage (2D: both grids;
        # 3D: the horizontal plane, z local — parallel/mesh.py)
        is3d = problem.initial_state()[0].ndim == 4
        kwargs["pad_to"] = ((1, *mesh_shape) if is3d else mesh_shape)
        problem = get_benchmark(name, **kwargs)
    if args.f32:
        # f32-native state needs f32-reachable tolerances: the f64 defaults
        # (newton_atol 1e-6, SNES rtol 1e-8) sit below the f32 assembly's
        # cancellation floor (~3e-4 absolute for bench1's step 1), so the
        # unrescaled run fails its very first step at dt_min. Rescaled:
        # ~sqrt(f32 eps)-class, validated to track the f64 trajectory
        # (bench1 to t=22: identical 14 steps, TFE ~3e-7 rel).
        import dataclasses as _dc

        problem = _dc.replace(problem, solver=_dc.replace(
            problem.solver, newton_atol=1e-4, newton_rtol=1e-5,
            krylov_rtol=1e-4, mixed_precision=False))

    from pfhubbenchmarks_tpu import timeloop
    from pfhubbenchmarks_tpu.io.csvout import write_csv

    resume_kwargs = {}
    ckpt = None
    if args.checkpoint:
        from pfhubbenchmarks_tpu.io.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.checkpoint, problem.name)
        if args.resume:
            resume_kwargs = ckpt.restore_kwargs()

    hooks = []
    if ckpt:
        hooks.append(ckpt.on_step)
    if args.stats_log:
        from pfhubbenchmarks_tpu.utils.observability import StatsLogger

        hooks.append(StatsLogger(args.stats_log).on_step)
    if args.save_fields:
        from pfhubbenchmarks_tpu.io.fields import FieldWriter

        fw = FieldWriter(args.fields_dir or f"results/{problem.name}", problem,
                         every=args.save_fields)
        hooks.append(fw.on_step)

    def on_step(stats, state):
        for h in hooks:
            h(stats, state)

    if mesh_shape is not None:
        # shard the starting state (fresh or checkpoint-restored); the
        # jitted step keeps it sharded end-to-end (tests/test_sharding.py
        # multistep test asserts no silent gather-back)
        from pfhubbenchmarks_tpu.parallel.mesh import (
            make_device_mesh, shard_state, shard_state3d)

        mesh = make_device_mesh(shape=mesh_shape)
        w0 = resume_kwargs.get("state0") or problem.initial_state()
        sharder = shard_state3d if w0[0].ndim == 4 else shard_state
        resume_kwargs["state0"] = sharder(w0, mesh)

    from pfhubbenchmarks_tpu.utils.observability import profile

    t0 = time.time()
    with profile(args.trace):
        if args.fused:
            if hooks:
                raise SystemExit("--fused excludes --checkpoint/--stats-log/"
                                 "--save-fields (per-step host hooks)")
            seg = getattr(problem, "fused_seg_rows", None)
            if seg and not resume_kwargs:
                # bounded-device-time segments (see base.fused_seg_rows)
                result = timeloop.run_fused_segmented(
                    problem, end_time=args.end_time, seg_rows=seg,
                    max_rows=args.max_steps or 512)
            else:
                result = timeloop.run_fused(
                    problem, end_time=args.end_time,
                    max_rows=args.max_steps or 512,
                    allow_partial=args.max_steps is not None,
                    **resume_kwargs)
        else:
            time_grid = None
            if args.replay:
                import numpy as np

                time_grid = np.loadtxt(args.replay, delimiter=",",
                                       skiprows=1)[:, 0]
            result = timeloop.run(problem, end_time=args.end_time,
                                  max_steps=args.max_steps,
                                  verbose=not args.quiet,
                                  time_grid=time_grid,
                                  replay_partial=time_grid is not None,
                                  replay_substep_fallback=time_grid is not None,
                                  replay_damped=not args.no_damped_rescue,
                                  on_step=(on_step if hooks else None),
                                  **resume_kwargs)
    wall = time.time() - t0
    rows = result.rows
    if ckpt is not None and ckpt.restored_rows is not None and len(rows):
        import numpy as np

        rows = np.concatenate([ckpt.restored_rows, rows])
    write_csv(args.out, rows, result.columns)
    n = len(result.rows)
    print(f"{name}: {n} steps to t={result.rows[-1, 0]:.6g} in {wall:.2f}s "
          f"({wall / max(n, 1):.3f}s/step) -> {args.out}")
