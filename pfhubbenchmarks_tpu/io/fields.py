"""Per-step field snapshot writer (VTI series + PVD index).

The on_step hook counterpart of the reference's ``file << (c, t)`` pattern
(dolfin/bench2.py:267-275): one .vti per sampled step, indexed by a .pvd
collection that ParaView opens directly.
"""

from __future__ import annotations

import os

from pfhubbenchmarks_tpu.io.vti import PVDSeries, write_state_vti, write_state_vti_3d


class FieldWriter:
    def __init__(self, directory: str, problem, every: int = 1):
        self.dir = directory
        self.problem = problem
        self.every = every
        self.count = 0
        os.makedirs(directory, exist_ok=True)
        self.pvd = PVDSeries(os.path.join(directory, f"{problem.name}.pvd"))

    def on_step(self, stats, state) -> None:
        self.count += 1
        if self.count % self.every:
            return
        fname = f"{self.problem.name}_{stats.step:06d}.vti"
        path = os.path.join(self.dir, fname)
        grid = self.problem.grid
        if getattr(grid, "dim", 2) == 3:
            write_state_vti_3d(path, grid, state, self.problem.field_names)
        else:
            write_state_vti(path, grid, state, self.problem.field_names)
        self.pvd.add(stats.t, fname)
