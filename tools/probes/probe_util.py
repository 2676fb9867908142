"""Shared helpers for TPU probe scripts (recreated after .scratch wipe)."""
import numpy as np

REF = "/root/reference/results"


def traj_check(rows, ref_csv, label=""):
    """Prefix match + interpolated-TFE error vs a reference CSV (the
    tools/check_trajectories.py metrics, computed on in-memory rows)."""
    ref = np.loadtxt(ref_csv, delimiter=",", skiprows=1)
    rows = np.asarray(rows)
    n = min(len(rows), len(ref))
    m = np.isclose(rows[:n, 0], ref[:n, 0], rtol=1e-9, atol=1e-9)
    k = int(np.argmin(m)) if not m.all() else n
    pref_err = (np.abs(rows[:k, 1] - ref[:k, 1]) / np.abs(ref[:k, 1])).max() if k else float("nan")
    t0, t1 = rows[0, 0], rows[-1, 0]
    sel = (ref[:, 0] >= t0) & (ref[:, 0] <= t1)
    ours_i = np.interp(ref[sel, 0], rows[:, 0], rows[:, 1])
    interp_err = (np.abs(ours_i - ref[sel, 1]) / np.abs(ref[sel, 1])).max()
    print(f"[{label}] prefix_match={k} prefix_TFE={pref_err:.3e} "
          f"interp_TFE={interp_err:.3e} rows={len(rows)} t_end={rows[-1,0]:.4g}")
    return k, interp_err


def agg_counts(result):
    """Accepted + all-attempt iteration totals from a host or fused result."""
    st = result.stats
    if len(st) == 1 and getattr(st[0], "krylov_iters_all", 0):
        a = st[0]
        return dict(newton=a.newton_iters, krylov=a.krylov_iters,
                    krylov_all=a.krylov_iters_all, steps=a.step,
                    retries=a.retries)
    return dict(newton=sum(s.newton_iters for s in st),
                krylov=sum(s.krylov_iters for s in st),
                # host StepStats now carries per-step all-attempt totals;
                # fall back to the accepted count for pre-round-4 results
                krylov_all=sum((s.krylov_iters_all or s.krylov_iters)
                               for s in st),
                steps=len(st), retries=sum(s.retries for s in st))
