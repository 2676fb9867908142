"""Tracing, profiling, structured step logs, numerical-sanity checks.

The reference's observability is wall-clock prints + PETSc monitors, mostly
commented out (SURVEY.md section 5: dolfin/bench1.py:143-203,
dolfinx/b1.py:167-174). Here:

- ``StatsLogger``: per-step JSONL records (t, dt, Newton/Krylov iters,
  retries, residual norm, wall) — the machine-readable counterpart of the
  reference's rank-0 prints;
- ``profile``: context manager around ``jax.profiler.trace`` for TensorBoard
  traces of the jitted solver;
- ``check_finite``: pytree NaN/Inf assertion (the jax_debug_nans equivalent
  usable in production paths; the reference's nearest analog is the TFE<0
  abort, dolfin/bench3.py:254-258).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import time


class StatsLogger:
    """Append per-step solver statistics as JSON lines."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def on_step(self, stats, state) -> None:
        rec = dataclasses.asdict(stats)
        rec["ts"] = time.time()
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


@contextlib.contextmanager
def profile(trace_dir: str | None):
    """jax.profiler trace wrapper; no-op if trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


def check_finite(tree, where: str = "") -> None:
    """Raise if any leaf contains NaN/Inf (host-side check)."""
    import jax.numpy as jnp
    from jax import tree_util as jtu

    for i, leaf in enumerate(jtu.tree_leaves(tree)):
        if not bool(jnp.isfinite(leaf).all()):
            raise FloatingPointError(f"non-finite values in leaf {i} {where}")
