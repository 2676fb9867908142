"""Adaptive-dt parity lab: align our Newton counts with the reference's.

The committed reference CSVs (results/bench*_out.csv) encode, through their
time grids, every decision PETSc SNES made under the reference's adaptive
rule (dolfin/bench1.py:179-183): dt doubles when Newton converged in
< grow_threshold iterations, halves otherwise, and failed attempts at a
doubled dt leave a visible "plateau" signature. This tool

1. infers the reference controller's implied per-step decisions (first
   attempted dt, number of failed attempts, grow/shrink) from the time grid,
2. replays the accepted grid with OUR solver (state stays on-trajectory),
3. probes our solver at the same first-attempt dts the reference tried,
4. reports every step where our Newton count or failure behavior would have
   sent the adaptive controller off the reference trajectory.

Usage:
    python tools/parity_lab.py bench1 [--max-steps N] [--krylov-rtol X] ...

This is the instrument for VERDICT round-1 item 3 (row-exact adaptive-dt
parity): tune solver knobs until the mismatch table is empty.
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/results"


def infer_schedule(times, dt0, dt_min, t0=0.0):
    """Infer (first_attempt_dt, implied_failures, grew) per accepted step.

    ``grew`` is the reference's decision AFTER step k (None for the last row,
    or when growing vs shrinking is ambiguous: a first attempt that failed
    >= 2 times is indistinguishable from a shrink that failed fewer times —
    we pick the interpretation with the fewest failures).
    """
    steps = []
    tprev = t0
    dt_ctrl = dt0
    for k, tk in enumerate(times):
        dt_acc = tk - tprev
        # halving ladder from the controller's first attempt down to dt_acc
        ladder = [dt_ctrl]
        while ladder[-1] > dt_acc * (1 + 1e-9) and ladder[-1] > dt_min * (1 - 1e-12):
            ladder.append(max(ladder[-1] * 0.5, dt_min))
        ok = math.isclose(ladder[-1], dt_acc, rel_tol=1e-6)
        n_fail = len(ladder) - 1
        steps.append(dict(step=k + 1, t=tk, dt_acc=dt_acc,
                          attempts=ladder if ok else [dt_acc],
                          n_fail=n_fail if ok else None,
                          consistent=ok, grew=None, ambiguous=False))
        # decision: what first attempt does the NEXT accepted dt imply?
        if k + 1 < len(times):
            dt_next_acc = times[k + 1] - tk

            def fails_from(first):
                d, m = first, 0
                while d > dt_next_acc * (1 + 1e-9) and d > dt_min * (1 - 1e-12):
                    d = max(d * 0.5, dt_min)
                    m += 1
                return m if math.isclose(d, dt_next_acc, rel_tol=1e-6) else None

            m_grow = fails_from(2.0 * dt_acc)
            m_shrink = fails_from(max(dt_acc * 0.5, dt_min))
            # grow-with-(m+2)-failures and shrink-with-m-failures are
            # indistinguishable from the grid alone (first attempts differ by
            # exactly 4x); prefer the minimal-failure interpretation (SNES
            # failures are the exception, not the rule) and mark ambiguity.
            if m_shrink is not None:
                steps[-1]["grew"] = False
                steps[-1]["ambiguous"] = True
                dt_ctrl = max(dt_acc * 0.5, dt_min)
            elif m_grow is not None:
                steps[-1]["grew"] = True
                dt_ctrl = 2.0 * dt_acc
            else:
                steps[-1]["consistent"] = False
                dt_ctrl = dt_next_acc
        tprev = tk
    return steps


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("bench", choices=["bench1", "bench2", "bench3", "bench6"])
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--probe-failures", action="store_true", default=True)
    ap.add_argument("--no-probe-failures", dest="probe_failures",
                    action="store_false",
                    help="skip solving at implied-failed dts (faster)")
    ap.add_argument("--dump-state", type=str, default=None, metavar="STEPS",
                    help="comma-separated steps whose pre-step state to save "
                         "to .scratch/")
    ap.add_argument("--csv", type=str, default=None,
                    help="also write our on-grid rows to CSV")
    # solver knob overrides
    ap.add_argument("--krylov-rtol", type=float, default=None)
    ap.add_argument("--krylov-max-iters", type=int, default=None)
    ap.add_argument("--newton-atol", type=float, default=None)
    ap.add_argument("--line-search", type=str, default=None)
    ap.add_argument("--no-mixed-precision", action="store_true")
    ap.add_argument("--gmg-nu-pre", type=int, default=None)
    ap.add_argument("--gmg-nu-post", type=int, default=None)
    ap.add_argument("--gmg-coarse-sweeps", type=int, default=None)
    args = ap.parse_args(argv)

    from pfhubbenchmarks_tpu.config import enable_x64, setup_compile_cache

    setup_compile_cache()
    enable_x64()

    import numpy as np

    from pfhubbenchmarks_tpu import timeloop
    from pfhubbenchmarks_tpu.benchmarks import get_benchmark

    problem = get_benchmark(args.bench)
    overrides = {}
    for field, attr in [("krylov_rtol", "krylov_rtol"),
                        ("krylov_max_iters", "krylov_max_iters"),
                        ("newton_atol", "newton_atol"),
                        ("line_search", "line_search"),
                        ("gmg_nu_pre", "gmg_nu_pre"),
                        ("gmg_nu_post", "gmg_nu_post"),
                        ("gmg_coarse_sweeps", "gmg_coarse_sweeps")]:
        v = getattr(args, attr)
        if v is not None:
            overrides[field] = v
    if args.no_mixed_precision:
        overrides["mixed_precision"] = False
    if overrides:
        problem.solver = dataclasses.replace(problem.solver, **overrides)
        print(f"solver overrides: {overrides}")

    ref = np.loadtxt(f"{REF}/{args.bench}_out.csv", delimiter=",", skiprows=1)
    times = ref[:, 0]
    if args.max_steps:
        times = times[: args.max_steps]
    tc = problem.time
    sched = infer_schedule(times, tc.dt0, tc.dt_min, tc.t0)

    runner = timeloop.Runner(problem)
    newton = runner.newton
    obs_fns = runner.obs_fns

    _newton_rescue = [None]

    def rescue_solve(w, dt_acc):
        """Converge a step our production config failed on, so the walk can
        continue on-trajectory. bt line search + a bigger Krylov budget finds
        the SAME discrete solution (the path differs, the root doesn't)."""
        if _newton_rescue[0] is None:
            from pfhubbenchmarks_tpu.solve.newton import make_newton_solver

            cfg = dataclasses.replace(
                problem.solver, line_search="bt", newton_max_iters=40,
                krylov_max_iters=1500, report_atol=None)
            lowp = getattr(problem, "residual_lowp", lambda: None)()
            _newton_rescue[0] = make_newton_solver(
                problem.residual(), cfg, problem.precond_builder(),
                residual_lowp=lowp)
        return _newton_rescue[0](w, w, jnp.asarray(dt_acc, jnp.float64))

    import jax.numpy as jnp

    dump_steps = (set(int(x) for x in args.dump_state.split(","))
                  if args.dump_state else set())
    w = problem.initial_state()
    mismatches = []
    rows = []
    hists = []
    print(f"{'step':>4} {'t':>10} {'dt':>9} {'ref':>14} {'ours':>18} verdict")
    for s in sched:
        k, dt_acc = s["step"], s["dt_acc"]
        if k in dump_steps:
            path = f".scratch/{args.bench}_state_step{k}.npz"
            np.savez(path, **{f"leaf_{i}": np.asarray(a) for i, a in enumerate(w)},
                     t=s["t"] - dt_acc, dt=dt_acc)
            print(f"  [dumped pre-step state to {path}]")
        probe_notes = []
        fail_match = True
        rescue_note = ""
        if args.probe_failures and s["n_fail"]:
            # the reference failed at every attempt above dt_acc; do we?
            for dtp in s["attempts"][:-1]:
                rp = newton(w, w, jnp.asarray(dtp, jnp.float64))
                ours_conv = bool(rp.converged)
                probe_notes.append(f"dt={dtp:g}:"
                                   f"{'CONV' if ours_conv else 'fail'}"
                                   f"({int(rp.iters)})")
                hists.append(dict(step=k, dt=dtp, kind="probe_fail",
                                  hist=np.asarray(rp.norm_hist)))
                if ours_conv:
                    fail_match = False
        res = newton(w, w, jnp.asarray(dt_acc, jnp.float64))
        niters = int(res.iters)
        conv = bool(res.converged)
        hists.append(dict(step=k, dt=dt_acc, kind="accept",
                          grew=s["grew"], amb=s["ambiguous"],
                          hist=np.asarray(res.norm_hist)))
        if not conv:
            rescue = rescue_solve(w, dt_acc)
            if not bool(rescue.converged):
                print(f"{k:4d} {s['t']:10.4f} {dt_acc:9.4g}  OUR SOLVE FAILED "
                      f"(|F|={float(res.res_norm):.3e}), rescue failed too "
                      f"(|F|={float(rescue.res_norm):.3e}) — trajectory broken")
                mismatches.append((k, "accepted-dt solve failed; rescue failed"))
                break
            mismatches.append((k, "accepted-dt solve failed (walk rescued)"))
            rescue_note = " RESCUED"
            res = rescue
            niters = int(res.iters)
        w = res.x
        obs = [float(obs_fns[c](w)) for c in problem.csv_columns[1:]]
        rows.append([s["t"]] + obs)
        ours_grew = niters < tc.grow_threshold
        ref_txt = ("?" if s["grew"] is None
                   else ("grow" if s["grew"] else "shrink")
                   + ("(amb)" if s["ambiguous"] else "")
                   + (f"+{s['n_fail']}f" if s["n_fail"] else ""))
        ours_txt = (f"n={niters} {'grow' if ours_grew else 'shrink'}"
                    + rescue_note
                    + (f" [{' '.join(probe_notes)}]" if probe_notes else ""))
        bad = []
        if s["grew"] is not None and ours_grew != s["grew"]:
            bad.append("decision flip")
        if not fail_match:
            bad.append("converged where ref failed")
        verdict = "MISMATCH: " + ", ".join(bad) if bad else "ok"
        if bad:
            mismatches.append((k, verdict))
        print(f"{k:4d} {s['t']:10.4f} {dt_acc:9.4g} {ref_txt:>14} {ours_txt:>18} {verdict}")

    rows = np.asarray(rows)
    if args.csv and len(rows):
        from pfhubbenchmarks_tpu.io.csvout import write_csv

        write_csv(args.csv, rows, problem.csv_columns)
    if len(rows):
        n = len(rows)
        relerr = np.abs(rows[:, 1] - ref[:n, 1]) / np.abs(ref[:n, 1])
        print(f"\non-grid TFE rel-err: max {relerr.max():.3e} "
              f"(row {int(relerr.argmax()) + 1}), final {relerr[-1]:.3e}")
    print(f"steps walked: {len(rows)}/{len(sched)}; mismatches: {len(mismatches)}")
    for k, v in mismatches:
        print(f"  step {k}: {v}")

    # persist norm histories for offline analysis + scan SNES-equivalent atol
    import json

    os.makedirs(".scratch", exist_ok=True)
    with open(f".scratch/parity_{args.bench}_hists.json", "w") as f:
        json.dump([{**{k: v for k, v in h.items() if k != "hist"},
                    "hist": [float(x) for x in h["hist"]]} for h in hists], f)
    scan_report(hists, tc.grow_threshold)


def scan_report(hists, grow_threshold):
    """For candidate SNES-equivalent atols, how many reference decisions do
    the recorded ||F_k|| histories reproduce?"""
    import numpy as np

    cands = np.geomspace(1e-6, 3e-4, 60)
    best = None
    lines = []
    for A in cands:
        bad = 0
        total = 0
        for h in hists:
            hist = h["hist"]
            if h["kind"] == "probe_fail":
                total += 1
                if np.nanmin(np.where(np.isinf(hist), np.nan, hist)) < A:
                    bad += 1          # we'd converge where SNES failed
            else:
                if h.get("grew") is None:
                    continue
                total += 1
                hit = hist < A
                n = int(np.argmax(hit)) if hit.any() else len(hist)
                grew_em = n < grow_threshold
                # ref grew (unambiguous) -> need grow; ref shrank (the
                # minimal-failure reading when ambiguous) -> need shrink
                if (not hit.any()) or (grew_em != bool(h["grew"])):
                    bad += 1
        lines.append((A, bad, total))
        if best is None or bad < best[1]:
            best = (A, bad, total)
    print("\nSNES-equivalent atol scan (candidate, decision mismatches/steps):")
    prev = None
    for A, bad, total in lines:
        if prev != bad:
            print(f"  atol={A:.3e}  mismatches={bad}/{total}")
        prev = bad
    print(f"best: atol={best[0]:.3e} with {best[1]}/{best[2]} mismatches")


if __name__ == "__main__":
    main()
