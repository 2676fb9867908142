"""Checkpoint / resume of the full time-loop state.

The reference serializes fields to HDF5 but never restarts from them
(dolfin/b1.py:115-133; SURVEY.md section 5 'checkpoint/resume'). Here the
complete restart state — ``(t, dt, step, fields, csv rows so far)`` — is one
npz file, written atomically, so any run can resume bit-exactly.
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
        os.makedirs(directory, exist_ok=True)

    @property
    def path(self) -> str:
        return os.path.join(self.dir, f"{self.name}.npz")

    def on_step(self, stats, state) -> None:
        self._count += 1
        self._rows.append(stats)
        if self._count % self.every == 0:
            self.save(stats, state)

    def save(self, stats, state) -> None:
        v, m = state
        tmp = self.path + ".tmp.npz"
        np.savez(
            tmp, v=np.asarray(v), m=np.asarray(m), t=stats.t, dt=stats.dt,
            step=stats.step,
        )
        os.replace(tmp, self.path)

    def restore_kwargs(self) -> dict:
        """kwargs for timeloop.run to resume: state0, t0, dt0."""
        if not os.path.exists(self.path):
            return {}
        import jax.numpy as jnp

        z = np.load(self.path)
        return {
            "state0": (jnp.asarray(z["v"]), jnp.asarray(z["m"])),
            "t0": float(z["t"]),
            "dt0": float(z["dt"]),
        }
