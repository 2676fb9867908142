"""run_fused (whole adaptive run as one device dispatch) must reproduce the
host loop's trajectory decision-for-decision."""

import numpy as np

from pfhubbenchmarks_tpu import timeloop
from pfhubbenchmarks_tpu.benchmarks import get_benchmark


def test_run_fused_matches_host_loop_bench1():
    problem = get_benchmark("bench1", nx=16, ny=16)
    host = timeloop.run(problem, max_steps=8, verbose=False)
    fused = timeloop.run_fused(problem, max_rows=8, allow_partial=True)
    assert len(fused.rows) == len(host.rows)
    np.testing.assert_allclose(fused.rows, host.rows, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(fused.state[0]),
                               np.asarray(host.state[0]), rtol=1e-12)
    agg = fused.stats[0]
    assert agg.newton_iters == sum(s.newton_iters for s in host.stats)
    assert agg.krylov_iters == sum(s.krylov_iters for s in host.stats)
    assert agg.retries == sum(s.retries for s in host.stats)


def test_run_fused_matches_host_loop_bench1_3d():
    """The 3D path through the fused whole-run driver (Kuhn-tet grid +
    3D GMG): decision-for-decision parity with the host loop. The TPU-size
    (50^3) fused program is exercised separately on hardware; this guards
    the tracing path."""
    problem = get_benchmark("bench1_3d", nx=12, ny=12, nz=12)
    host = timeloop.run(problem, max_steps=6, verbose=False)
    fused = timeloop.run_fused(problem, max_rows=6, allow_partial=True)
    assert len(fused.rows) == len(host.rows)
    np.testing.assert_allclose(fused.rows, host.rows, rtol=1e-13)


def test_run_fused_matches_host_loop_bench6_dirichlet():
    problem = get_benchmark("bench6", nx=16, ny=16)
    host = timeloop.run(problem, max_steps=5, verbose=False)
    fused = timeloop.run_fused(problem, max_rows=5, allow_partial=True)
    assert len(fused.rows) == len(host.rows)
    np.testing.assert_allclose(fused.rows, host.rows, rtol=1e-13)


def test_hysteresis_dt_rule_host_and_fused():
    """dolfinx/b13d.py:306-310 rule: keep dt while iters sit in the band."""
    import dataclasses

    problem = get_benchmark("bench1", nx=16, ny=16)
    problem.time = dataclasses.replace(problem.time, grow_threshold=1,
                                       shrink_threshold=9)
    host = timeloop.run(problem, max_steps=5, verbose=False)
    # every solve takes 1-4 iterations here: inside the band -> dt constant
    assert all(s.dt == host.stats[0].dt for s in host.stats)
    fused = timeloop.run_fused(problem, max_rows=5, allow_partial=True)
    np.testing.assert_allclose(fused.rows, host.rows, rtol=1e-13)


def test_replay_reproduces_adaptive_trajectory():
    """Replaying a run's own accepted time grid must land on the same rows
    (same discrete systems solved in the same order)."""
    problem = get_benchmark("bench1", nx=16, ny=16)
    adaptive = timeloop.run(problem, max_steps=6, verbose=False)
    replay = timeloop.run(problem, time_grid=adaptive.rows[:, 0],
                          verbose=False)
    assert len(replay.rows) == len(adaptive.rows)
    np.testing.assert_allclose(replay.rows, adaptive.rows, rtol=1e-12)


def test_replay_overrides_ew_forcing_to_fixed(monkeypatch):
    """Replay mode measures solve-accuracy parity, so timeloop.run must
    silently swap Eisenstat–Walker forcing back to the fixed KSP rtol
    (measured on bench6: replay TFE 4.1e-7 fixed vs 4.8e-6 EW). An
    EW-configured problem replayed over a grid therefore lands on the
    fixed-forcing rows bit-for-bit; replay_forcing=None keeps EW."""
    import dataclasses

    built = []
    real_runner = timeloop.Runner

    def spy(problem, *a, **k):
        built.append(problem.solver.krylov_forcing)
        return real_runner(problem, *a, **k)

    monkeypatch.setattr(timeloop, "Runner", spy)
    problem = get_benchmark("bench1", nx=16, ny=16)
    adaptive = timeloop.run(problem, max_steps=5, verbose=False)
    grid = adaptive.rows[:, 0]
    fixed_problem = dataclasses.replace(problem, solver=dataclasses.replace(
        problem.solver, krylov_forcing="fixed"))
    fixed_replay = timeloop.run(fixed_problem, time_grid=grid, verbose=False)
    ew_problem = dataclasses.replace(problem, solver=dataclasses.replace(
        problem.solver, krylov_forcing="ew", ew_eta0=0.3, ew_eta_max=0.9))
    ew_replay = timeloop.run(ew_problem, time_grid=grid, verbose=False)
    np.testing.assert_array_equal(ew_replay.rows, fixed_replay.rows)
    # the escape hatch: replay_forcing=None keeps the problem's EW forcing
    timeloop.run(ew_problem, time_grid=grid, verbose=False,
                 replay_forcing=None)
    # adaptive walk keeps the problem's (gated-EW) forcing; both replays
    # were rebuilt at fixed forcing; the escape hatch kept EW
    assert built == ["ew", "fixed", "fixed", "ew"]


def test_replay_damped_false_skips_damped_rescue(monkeypatch):
    """``replay_damped=False`` (CLI --no-damped-rescue) must keep the rescue
    ladder away from the host-damped rungs: the bt-variant rescue program is
    a separate large compile that can crash the tunneled TPU worker on the
    largest grids (bench3 350² replay, chain_r31 + chain_r40), and a worker
    crash loses every live buffer — it cannot be caught in-process. The
    substep/continuation/2x(dt/2) rungs (production program only) stay."""
    import dataclasses

    calls = []

    def spy_damped(self):
        def fake(warm, w0, dt):
            calls.append(float(dt))
            return warm, False, None

        return fake

    monkeypatch.setattr(timeloop.Runner, "host_damped", spy_damped)
    problem = get_benchmark("bench1", nx=16, ny=16)
    # one replayed step over a hopeless gap at newton_max_iters=1: every
    # production rung fails, so the ladder reaches the damped rungs iff
    # they are enabled, then ends via replay_partial with zero rows
    problem = dataclasses.replace(problem, solver=dataclasses.replace(
        problem.solver, newton_max_iters=1))
    grid = np.array([500.0])
    res = timeloop.run(problem, time_grid=grid, verbose=False,
                       replay_partial=True, replay_substep_fallback=True,
                       replay_damped=False)
    assert calls == []
    assert len(res.rows) == 0
    timeloop.run(problem, time_grid=grid, verbose=False,
                 replay_partial=True, replay_substep_fallback=True)
    assert calls  # default keeps the damped rungs


def test_run_fused_bench3_abort_device_matches_host():
    """bench3's TFE<0 abort has a device-side twin, so the fused driver
    reproduces the host loop including the abort semantics."""
    problem = get_benchmark("bench3", nx=32, ny=32)
    assert problem.abort_condition is not None
    host = timeloop.run(problem, max_steps=4, verbose=False)
    fused = timeloop.run_fused(problem, max_rows=4, allow_partial=True)
    np.testing.assert_allclose(fused.rows, host.rows, rtol=1e-13)


def test_run_fused_rejects_host_only_abort_condition():
    import dataclasses

    import pytest

    problem = get_benchmark("bench3", nx=32, ny=32)
    problem = dataclasses.replace(problem, abort_device=None)
    with pytest.raises(ValueError):
        timeloop.run_fused(problem, max_rows=2)


def test_run_fused_segmented_matches_whole_run():
    """Segmented fused driver (bounded-device-time dispatches, resuming
    from (state, t, dt) — the 50^3 bench1_3d path where one whole-run
    dispatch crashes the remote worker): identical rows, state, and
    iteration totals to the single-dispatch fused run."""
    problem = get_benchmark("bench1", nx=16, ny=16)
    whole = timeloop.run_fused(problem, max_rows=9, allow_partial=True)
    seg = timeloop.run_fused_segmented(problem, seg_rows=4, max_rows=9)
    assert len(seg.rows) == len(whole.rows)
    np.testing.assert_allclose(seg.rows, whole.rows, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(seg.state[0]),
                               np.asarray(whole.state[0]), rtol=1e-12)
    a, b = seg.stats[0], whole.stats[0]
    assert (a.newton_iters, a.krylov_iters, a.krylov_iters_all) == \
        (b.newton_iters, b.krylov_iters, b.krylov_iters_all)


def test_run_fused_segmented_3d():
    """3D segmented run reaches end_time and matches the host loop rows
    (the production shape: bench1_3d driven in segments)."""
    problem = get_benchmark("bench1_3d", nx=12, ny=12, nz=12)
    host = timeloop.run(problem, max_steps=6, verbose=False)
    seg = timeloop.run_fused_segmented(problem, seg_rows=3, max_rows=6)
    n = min(len(seg.rows), len(host.rows))
    np.testing.assert_allclose(seg.rows[:n], host.rows[:n], rtol=1e-13)
