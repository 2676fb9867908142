"""TPU-native PFHub phase-field benchmark framework.

A ground-up re-design of the PFHub benchmark suite (reference:
vpuri3/PFHubBenchmarks, FEniCS/PETSc/MPI) for TPU hardware:

- structured crossed-triangle / hex P1 grids as dense ``[F, Y, X]`` field
  arrays (replaces DOLFIN mesh + dofmaps + SCOTCH partitioning),
- matrix-free residual / Jacobian-vector evaluation via traced pointwise
  physics + fixed element tabulations (replaces UFL + FFC codegen),
- on-device Newton-Krylov in ``lax.while_loop`` (replaces PETSc SNES/KSP),
- ``jax.sharding`` SPMD over a device mesh (replaces MPI domain decomposition).
"""

__version__ = "0.1.0"

from pfhubbenchmarks_tpu import config as config
