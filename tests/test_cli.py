"""End-to-end CLI surface test (subprocess, CPU)."""

import os
import subprocess
import sys

import numpy as np


def test_bench1_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "b1.csv"
    stats = tmp_path / "steps.jsonl"
    fields = tmp_path / "fields"
    cmd = [sys.executable, "-m", "pfhubbenchmarks_tpu.benchmarks.bench1",
           "--nx", "8", "--ny", "8", "--max-steps", "2", "--quiet",
           "--out", str(out), "--stats-log", str(stats),
           "--save-fields", "1", "--fields-dir", str(fields)]
    # env= must be passed: without it an ambient PYTHONPATH containing
    # .axon_site would make this child grab the single TPU chip
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                       cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = np.loadtxt(out, delimiter=",", skiprows=1)
    assert rows.shape == (2, 3)
    assert len(stats.read_text().splitlines()) == 2
    assert (fields / "bench1.pvd").exists()
    assert (fields / "bench1_000001.vti").exists()


def test_bench1_cli_f32_native(tmp_path):
    """--f32 (f32-native throughput mode) must run with the rescaled
    tolerances applied automatically — the f64 defaults sit below the f32
    assembly's cancellation floor and fail the first step (regression:
    the flag shipped without the rescale and died at dt_min)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "b1_f32.csv"
    # production 100^2 grid: the rescaled tolerances are calibrated to the
    # full-size residual scale (a tiny 8^2 grid's f32 floor sits above them)
    cmd = [sys.executable, "-m", "pfhubbenchmarks_tpu.benchmarks.bench1",
           "--f32", "--max-steps", "2", "--quiet", "--out", str(out)]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                       cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = np.loadtxt(out, delimiter=",", skiprows=1)
    assert rows.shape == (2, 3)
    # solute conservation at f32 resolution
    assert abs(rows[1, 2] - rows[0, 2]) / abs(rows[0, 2]) < 1e-5


def test_bench1_cli_mesh_sharded(tmp_path):
    """--mesh MYxMX shards the run over a device mesh (spatial domain
    decomposition as a first-class CLI feature); rows must match the
    single-device trajectory of the same padded problem."""
    out = tmp_path / "b1_mesh.csv"
    # env= must be passed (as in the other CLI tests): without it an
    # ambient PYTHONPATH containing .axon_site makes this child grab the
    # single TPU chip — racing any TPU job and flaking the suite
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--xla_force_host_platform_device_count" not in env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
    base = [sys.executable, "-m", "pfhubbenchmarks_tpu.benchmarks.bench1",
            "--nx", "16", "--ny", "16", "--max-steps", "3", "--quiet"]
    r = subprocess.run(base + ["--mesh", "2x4", "--out", str(out)],
                       capture_output=True, text=True, timeout=300,
                       cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = np.loadtxt(out, delimiter=",", skiprows=1)
    assert rows.shape == (3, 3)
    # single-device reference on the same mesh-padded grid
    out1 = tmp_path / "b1_single.csv"
    r1 = subprocess.run(base + ["--out", str(out1)], capture_output=True,
                        text=True, timeout=300, cwd=str(tmp_path), env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    rows1 = np.loadtxt(out1, delimiter=",", skiprows=1)
    # same time grid; observables to reduction-order noise. NOTE: the
    # unsharded run uses pad_to=(1,1) (different padded storage), so this
    # also checks padding-size independence of the trajectory.
    np.testing.assert_allclose(rows[:, 0], rows1[:, 0], rtol=0)
    np.testing.assert_allclose(rows, rows1, rtol=1e-9)


def test_bench_supervisor_retries_and_always_emits_json():
    """bench.py's supervisor must return a result dict on flaky-child
    success (retry) and an error dict when every attempt dies — the
    driver's one-JSON-line contract (worker crashes mid-run happen)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    # child fails on first run, succeeds on second (state via a temp file)
    import tempfile
    marker = tempfile.mktemp()
    flaky = [sys.executable, "-c",
             "import os,sys,json\n"
             f"m = {marker!r}\n"
             "if not os.path.exists(m):\n"
             "    open(m,'w').close(); sys.exit(7)\n"
             "print('noise line')\n"
             "print(json.dumps({'metric': 'x', 'value': 1.5}))"]
    out = bench.supervise(flaky, attempts=3, retry_wait_s=0.0, timeout_s=30,
                          metric="x")
    assert out == {"metric": "x", "value": 1.5}

    dead = [sys.executable, "-c", "import sys; sys.exit(3)"]
    out = bench.supervise(dead, attempts=2, retry_wait_s=0.0, timeout_s=30,
                          metric="m")
    assert out["value"] is None and "rc=3" in out["error"]
    assert out["metric"] == "m"
