"""Newton ||F|| histories of FAILED vs CONVERGED solve attempts (CPU host
loop) — the data for designing an early-abort rule for doomed dt attempts.

Motivation (round-4 session P): the fused bench2 run burns 43% of its Krylov
work in rejected dt attempts (krylov_all 14005 vs accepted 8036, 19 retries
~ 314 iters each ~ newton_max_iters x restart) — failing attempts walk all
10 Newton iterations before the controller halves dt. The reference pays the
same price (SNES has no stagnation abort either), but our wall target does
not: an abort rule that fires only on attempts that were going to fail
anyway leaves the trajectory bit-identical and cuts the waste.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/probes/failhist_probe.py <bench>
Prints one line per solve attempt: dt, outcome, and the ||F_k|| ladder.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pfhubbenchmarks_tpu.config import enable_x64

enable_x64()
import numpy as np

from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks import get_benchmark

bench = sys.argv[1]
pb = get_benchmark(bench)
runner = timeloop.Runner(pb)

orig_step = runner.step
attempt_log = []


def spy_step(w_guess, w_prev, dt):
    out = orig_step(w_guess, w_prev, dt)
    res = out[0] if isinstance(out, tuple) else out
    hist = np.asarray(res.norm_hist)
    hist = hist[np.isfinite(hist)]
    attempt_log.append((float(dt), bool(res.converged), int(res.iters),
                        hist))
    return out


runner.step = spy_step
res = timeloop.run(pb, _runner=runner)

n_fail = sum(1 for _, c, _, _ in attempt_log if not c)
print(f"{bench}: {len(attempt_log)} attempts, {n_fail} failed, "
      f"{len(res.rows)} rows")
for dt, conv, iters, hist in attempt_log:
    tag = "ok  " if conv else "FAIL"
    ladder = " ".join(f"{h:.3e}" for h in hist)
    print(f"{tag} dt={dt:<8.4g} it={iters:<3d} |F|: {ladder}")

# summarize: for converged attempts, worst-case "looked doomed" profile =
# max over attempts of (||F_k|| / min_{j<=k} ||F_j||) and the latest k at
# which a new minimum (0.9x improvement) was still being set.
print("\n-- abort-rule safety envelope over CONVERGED attempts --")
worst_stall = 0
worst_rise = 0.0
for dt, conv, iters, hist in attempt_log:
    if not conv or len(hist) < 2:
        continue
    best = hist[0]
    last_improve = 0
    for k in range(1, len(hist)):
        if hist[k] < 0.9 * best:
            last_improve = k
        best = min(best, hist[k])
        stall = k - last_improve
        worst_stall = max(worst_stall, stall)
    worst_rise = max(worst_rise, float((hist[1:] / hist[0]).max()))
print(f"max iters-without-0.9x-improvement on a converged attempt: {worst_stall}")
print(f"max ||F_k||/||F_0|| rise on a converged attempt: {worst_rise:.3f}")
