"""SPMD domain decomposition over a TPU device mesh.

The reference scales by MPI mesh partitioning (SCOTCH) + PETSc ghost updates
(SURVEY.md section 2.2: `mpirun -np N`, ghostUpdate, allreduce). The TPU
counterpart: shard the (y, x) grid axes of every field over a 2D
``jax.sharding.Mesh``. All assembly ops are slices/pads/elementwise, so XLA's
SPMD partitioner inserts the 1-deep halo exchanges over ICI automatically
(the ghost machinery), and reductions in dots/functionals become
all-reduces. No communication code is written by hand — the partitioner IS
the communication backend.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pfhubbenchmarks_tpu.config import default_device_mesh_shape


def make_device_mesh(n_devices: int | None = None,
                     shape: tuple[int, int] | None = None,
                     devices=None) -> Mesh:
    """2D device mesh with axes ('y', 'x') for spatial domain decomposition."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if shape is None:
        shape = default_device_mesh_shape(n_devices)
    my, mx = shape
    dev = np.asarray(devices[: my * mx]).reshape(my, mx)
    return Mesh(dev, axis_names=("y", "x"))


def state_sharding(mesh: Mesh) -> NamedSharding:
    """Fields are [F, Y, X]: replicate F, shard Y over 'y', X over 'x'."""
    return NamedSharding(mesh, P(None, "y", "x"))


def shard_state(w, mesh: Mesh):
    s = state_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in w)


def state_sharding3d(mesh: Mesh) -> NamedSharding:
    """3D fields are [F, Z, Y, X]: shard Y over 'y', X over 'x', keep Z
    local. A 2D device decomposition of the horizontal plane is the right
    cut for pencil-shaped stencil halos (1-deep in y/x only); the z axis
    stays contiguous for the Kuhn-tet slab kernels (ops/pallas3d.py)."""
    return NamedSharding(mesh, P(None, None, "y", "x"))


def shard_state3d(w, mesh: Mesh):
    s = state_sharding3d(mesh)
    return tuple(jax.device_put(a, s) for a in w)


def shard_problem_fns(mesh: Mesh):
    """Sharding constraint function to apply inside jitted step functions."""
    s = state_sharding(mesh)

    def constrain(w):
        return tuple(jax.lax.with_sharding_constraint(a, s) for a in w)

    return constrain
