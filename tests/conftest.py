"""Test configuration: CPU backend with 8 virtual devices, float64.

The reference tests distributed behavior only by re-running under
``mpirun -np N`` (SURVEY.md section 4.6); here multi-device correctness is
tested hermetically on a virtual 8-device CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
