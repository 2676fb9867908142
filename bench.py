"""Headline benchmark: PFHub BM1 wall-clock to final time on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline derivation (no BM1 wall-clock is recorded in the reference; see
BASELINE.md): the reference documents BM2 end_time=100 at 22-29 s on 32 MPI
cores (dolfin/bench2.py:139-143). Scaling 32 -> 8 ranks (~3.3x on a
memory-bound FEM assembly+GMRES workload) gives ~70-95 s; BM1 runs 73 steps
vs BM2's 120 with a 2-field (vs 6-field) system (~0.4x per-step system cost,
partially offset by BM1's larger late-time dt stiffness). Estimate used:
**60 s for the canonical `mpirun -np 8 python dolfin/bench1.py`**
(README.md:18-23). Pinned by a measured anchor (round 3): a conventional
single-rank scipy-CSR implementation of the identical problem
(tools/cpu_anchor.py) takes 508 s on this host, so 60 s at 8 ranks assumes
~8.5x parallel speedup — at/beyond linear, i.e. conservative (see
BASELINE.md). vs_baseline = baseline_seconds / our_seconds (>1 means
faster than the baseline).

Accuracy is reported alongside: max relative error of total_free_energy on
the prefix of rows where our adaptive time grid coincides with
results/bench1_out.csv, plus solute conservation drift.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_BM1_8RANK_SECONDS = 60.0
REF_CSV = "/root/reference/results/bench1_out.csv"


def supervise(cmd, attempts: int = 3, timeout_s: float = 2700.0,
              retry_wait_s: float = 75.0, metric: str = "",
              _sleep=time.sleep) -> dict:
    """Run ``cmd`` (a child process that prints the result JSON as its last
    stdout line) with retries, and ALWAYS return a result dict.

    The measured run talks to a remote TPU worker that can crash mid-run or
    be down outright (observed: multi-hour outages where backend init fails
    after ~1500 s; kernel-heavy runs occasionally killing the worker, which
    recovers in ~1 min — CLAUDE.md environment notes). bench.py's contract
    with the driver is ONE JSON line, unattended; a worker crash must
    surface as a JSON line with an "error" field, not a dead process.
    """
    errors = []
    for attempt in range(attempts):
        if attempt:
            _sleep(retry_wait_s)
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout_s)
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {attempt}: timeout after {timeout_s:g}s")
            continue
        for line in reversed(p.stdout.strip().splitlines()):
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    break
        tail = (p.stderr.strip().splitlines() or ["<no stderr>"])[-1]
        errors.append(f"attempt {attempt}: rc={p.returncode} {tail[-300:]}")
    return {"metric": metric, "value": None, "unit": "seconds",
            "vs_baseline": None, "error": "; ".join(errors)}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pfhubbenchmarks_tpu.config import enable_x64, setup_compile_cache

    setup_compile_cache()
    enable_x64()
    import numpy as np

    from pfhubbenchmarks_tpu import timeloop
    from pfhubbenchmarks_tpu.benchmarks.bench1 import make

    problem = make()
    runner = timeloop.Runner(problem)
    # warm up tracing+compilation outside the timed region (one-off toolchain
    # cost, amortized by the persistent compilation cache across processes).
    # The timed region uses the fused whole-run driver (timeloop.run_fused):
    # ONE device dispatch for the entire adaptive run — the host loop
    # measured 46% of wall-clock in host/tunnel overhead (r2 breakdown).
    runner.run_fused(end_time=0.2)

    t0 = time.time()
    result = runner.run_fused()
    wall = time.time() - t0

    rows = result.rows
    # per-phase attribution (VERDICT r1 item 8): quantifies the
    # latency-vs-FLOP balance round over round. With the fused driver the
    # whole run is one dispatch; host_s is result assembly + transfer only.
    agg = result.stats[0]
    # wall-per-iteration divides by EVERY attempt's iterations (failed
    # ones ran too); accepted-only counts stay for host-loop parity
    n_krylov_all = agg.krylov_iters_all or agg.krylov_iters
    breakdown = {
        "steps": agg.step,
        "solve_attempts": agg.step + agg.retries,
        "newton_iters": agg.newton_iters,
        "krylov_iters": agg.krylov_iters,
        "krylov_iters_all": n_krylov_all,
        "solve_s": round(agg.wall, 3),
        "host_s": round(wall - agg.wall, 3),
        "ms_per_krylov_iter": round(1e3 * agg.wall / max(n_krylov_all, 1), 3),
        "dispatches": 1,
    }
    out = {
        "metric": "bench1_wall_clock_to_final_time",
        "value": round(wall, 3),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_BM1_8RANK_SECONDS / wall, 3),
    }
    if os.path.exists(REF_CSV):
        ref = np.loadtxt(REF_CSV, delimiter=",", skiprows=1)
        # accuracy on the reference's EXACT time grid (replay mode): the
        # controller-level decisions of the reference run depend on its
        # 8-rank SOR partitioning (unreproducible in principle — see
        # ROADMAP parity notes), so solution parity is measured by solving
        # the same implicit-Euler steps on its committed grid.
        # replay_partial + substep fallback: a rescue-ladder failure on one
        # replayed step must not kill the run AFTER the timed result exists —
        # bench.py's contract is one JSON line, unattended (ADVICE round 2).
        # No _runner reuse: the production config runs dt-gated EW forcing,
        # and the replay parity number is defined at fixed forcing
        # (timeloop.run's replay_forcing override builds the fixed-forcing
        # program; the persistent compile cache keeps that cheap).
        try:
            replay = timeloop.run(problem, time_grid=ref[:, 0], verbose=False,
                                  replay_partial=True,
                                  replay_substep_fallback=True)
            nrep = len(replay.rows)
            out["replay_rows"] = nrep
            out["tfe_relerr_ref_grid"] = float(
                (np.abs(replay.rows[:, 1] - ref[:nrep, 1])
                 / np.abs(ref[:nrep, 1])).max())
        except Exception as e:  # primary metric still gets emitted
            out["replay_error"] = f"{type(e).__name__}: {e}"
        n = min(len(rows), len(ref))
        match = np.isclose(rows[:n, 0], ref[:n, 0], rtol=1e-9)
        k = int(np.argmin(match)) if not match.all() else n
        if k > 0:
            out["tfe_relerr_matched_rows"] = float(
                (np.abs(rows[:k, 1] - ref[:k, 1]) / ref[:k, 1]).max())
            out["matched_time_rows"] = k
        out["ref_rows"] = int(len(ref))
        # curve-level error: our TFE(t) interpolated onto the reference's
        # time grid (robust to adaptive-dt row misalignment)
        tmax = min(rows[-1, 0], ref[-1, 0])
        sel = ref[:, 0] <= tmax
        interp = np.interp(ref[sel, 0], rows[:, 0], rows[:, 1])
        out["tfe_relerr_interp"] = float(
            (np.abs(interp - ref[sel, 1]) / ref[sel, 1]).max())
    out["breakdown"] = breakdown
    out["steps"] = int(len(rows))
    out["final_time"] = float(rows[-1, 0])
    out["solute_drift_rel"] = float(
        abs(rows[-1, 2] - rows[0, 2]) / abs(rows[0, 2]))
    print(json.dumps(out))


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        # Supervisor path (what the driver invokes): the measured run goes in
        # a child process so a TPU-worker crash can be retried; jax is only
        # imported in the child (never two TPU processes at once).
        print(json.dumps(supervise(
            [sys.executable, os.path.abspath(__file__), "--child"],
            metric="bench1_wall_clock_to_final_time")))
