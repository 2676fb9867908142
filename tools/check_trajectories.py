"""Full-trajectory regression check: committed CSVs vs the reference's.

Compares every results/bench*_out.csv against /root/reference/results/ at
curve level — matched-time-prefix length, on-prefix TFE relative error, and
TFE interpolated onto the reference time grid (robust to adaptive-dt row
misalignment). This is the opt-in long-horizon check the unit-test goldens
(tests/test_golden.py, first rows only) cannot afford in CI; run it after
regenerating any committed benchmark CSV.

Usage: python tools/check_trajectories.py [bench1 bench2 ...]
Exit code 1 if any benchmark regresses past the recorded bounds.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference/results"
OURS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results")

# regression bounds: (min matched rows, max interp TFE rel-err) per benchmark,
# set to the best committed state — tighten as parity work lands
BOUNDS = {
    # bench1's adaptive walk measures interp TFE 2.838e-3 at the HEAD
    # defaults (BENCH_r04.json); the old 3e-3 bound left 5% headroom, so
    # ordinary solver-noise wiggle could fail CI without a regression
    # (round-4 VERDICT weak 5). Bound = measured x ~1.75 slack; the matched
    # 21-row prefix is SNES-calibrated and stays exact.
    "bench1": (21, 5e-3),
    "bench2": (28, 3e-2),
    "bench3": (14, 2e-4),
    # bench6's committed adaptive walk matches all 14 reference rows at
    # TFE 3.4e-7 (round-3 controller calibration); bound = ~2x slack
    "bench6": (14, 1e-6),
}

# replay CSVs (results/bench*_replay.csv): solved on the reference's exact
# time grid, so ALL rows must match and the TFE bound is the solver-noise
# floor (see ROADMAP "Adaptive-dt parity"). These bounds ARE the adjudicated
# accuracy contract — BASELINE.md "Adjudicated accuracy contract" states the
# per-benchmark floor proofs they encode.
REPLAY_BOUNDS = {
    # (min rows, max TFE rel-err). bench1/bench6 sit at the solver-noise
    # floor; bench2/bench3 carry chaotic-event amplification (BM2 particle
    # dissolutions at t~30 and t~81.5, BM3 dendrite tip) — both sides solve
    # legitimately, trajectories diverge through the events (ROADMAP).
    "bench1": (73, 1e-5),
    "bench2": (120, 3e-2),
    "bench3": (46, 5e-4),
    "bench6": (14, 1e-6),
}


def compare(name: str):
    ours = np.loadtxt(f"{OURS}/{name}_out.csv", delimiter=",", skiprows=1)
    ref = np.loadtxt(f"{REF}/{name}_out.csv", delimiter=",", skiprows=1)
    n = min(len(ours), len(ref))
    match = np.isclose(ours[:n, 0], ref[:n, 0], rtol=1e-9)
    k = int(np.argmin(match)) if not match.all() else n
    prefix_err = (np.abs(ours[:k, 1] - ref[:k, 1]) / np.abs(ref[:k, 1])).max() \
        if k else np.inf
    tmax = min(ours[-1, 0], ref[-1, 0])
    sel = ref[:, 0] <= tmax
    interp = np.interp(ref[sel, 0], ours[:, 0], ours[:, 1])
    interp_err = (np.abs(interp - ref[sel, 1]) / np.abs(ref[sel, 1])).max()
    return dict(rows=len(ours), ref_rows=len(ref), matched=k,
                prefix_relerr=float(prefix_err),
                interp_relerr=float(interp_err))


def compare_replay(name: str):
    ours = np.loadtxt(f"{OURS}/{name}_replay.csv", delimiter=",", skiprows=1)
    ref = np.loadtxt(f"{REF}/{name}_out.csv", delimiter=",", skiprows=1)
    n = min(len(ours), len(ref))
    assert np.allclose(ours[:n, 0], ref[:n, 0], rtol=1e-9), \
        f"{name}_replay.csv time grid deviates from the reference grid"
    rel = (np.abs(ours[:n, 1] - ref[:n, 1]) / np.abs(ref[:n, 1])).max()
    return dict(rows=len(ours), ref_rows=len(ref), relerr=float(rel))


def main(argv=None):
    names = (argv or sys.argv[1:]) or sorted(BOUNDS)
    bad = []
    print(f"{'bench':8} {'rows':>9} {'matched':>8} {'prefix_err':>11} "
          f"{'interp_err':>11}  verdict")
    for name in names:
        r = compare(name)
        min_rows, max_err = BOUNDS.get(name, (0, np.inf))
        ok = r["matched"] >= min_rows and r["interp_relerr"] <= max_err
        if not ok:
            bad.append(name)
        print(f"{name:8} {r['rows']:>4}/{r['ref_rows']:<4} {r['matched']:>8} "
              f"{r['prefix_relerr']:>11.3e} {r['interp_relerr']:>11.3e}  "
              f"{'ok' if ok else 'REGRESSED'}")
    print(f"\n{'replay':8} {'rows':>9} {'TFE_relerr':>11}  verdict")
    for name in names:
        if not os.path.exists(f"{OURS}/{name}_replay.csv"):
            continue
        r = compare_replay(name)
        min_rows, max_err = REPLAY_BOUNDS.get(name, (0, np.inf))
        ok = r["rows"] >= min_rows and r["relerr"] <= max_err
        if not ok:
            bad.append(name + "_replay")
        print(f"{name:8} {r['rows']:>4}/{r['ref_rows']:<4} "
              f"{r['relerr']:>11.3e}  {'ok' if ok else 'REGRESSED'}")
    if bad:
        print(f"regressions: {bad}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
