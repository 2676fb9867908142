"""Checkpoint / resume of the full time-loop state.

The reference serializes fields to HDF5 but never restarts from them
(dolfin/b1.py:115-133; SURVEY.md section 5 'checkpoint/resume'). Here the
complete restart state — ``(t, dt, step, field pytree, csv rows so far)`` —
is one npz file, written atomically, so any run can resume bit-exactly.

The field state is stored pytree-generically (one npz entry per flattened
leaf), so every registered benchmark works: bench1's (v, m) two-grid state,
bench1_3d's single-grid 1-tuple, and any future pytree layout.
"""

from __future__ import annotations

import os

import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, name: str, every: int = 10):
        self.dir = directory
        self.name = name
        self.every = every
        self._rows: list = []
        self._count = 0
        self.restored_rows: np.ndarray | None = None
        os.makedirs(directory, exist_ok=True)

    @property
    def path(self) -> str:
        return os.path.join(self.dir, f"{self.name}.npz")

    def on_step(self, stats, state) -> None:
        self._count += 1
        self._rows.append(stats.row)
        if self._count % self.every == 0:
            self.save(stats, state)

    def save(self, stats, state) -> None:
        import jax.tree_util as jtu

        leaves, treedef = jtu.tree_flatten(state)
        payload = {f"leaf_{i}": np.asarray(a) for i, a in enumerate(leaves)}
        tmp = self.path + ".tmp.npz"
        np.savez(
            tmp, t=stats.t, dt=stats.dt_next, step=stats.step,
            rows=np.asarray(self._rows, dtype=np.float64),
            n_leaves=len(leaves), **payload,
        )
        os.replace(tmp, self.path)

    def restore_kwargs(self) -> dict:
        """kwargs for timeloop.run to resume: state0, t0, dt0, step0.

        Also stashes the pre-resume CSV rows on ``self.restored_rows`` (and
        re-seeds the internal row accumulator) so the final CSV covers the
        whole trajectory, not just post-resume steps.
        """
        if not os.path.exists(self.path):
            return {}
        import jax.numpy as jnp

        z = np.load(self.path)
        n = int(z["n_leaves"])
        leaves = tuple(jnp.asarray(z[f"leaf_{i}"]) for i in range(n))
        rows = z["rows"]
        self.restored_rows = rows if rows.size else None
        self._rows = [list(r) for r in rows]
        return {
            "state0": leaves,
            "t0": float(z["t"]),
            "dt0": float(z["dt"]),
            "step0": int(z["step"]),
        }
