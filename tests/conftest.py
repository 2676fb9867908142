"""Test configuration: CPU backend with 8 virtual devices, float64.

The reference tests distributed behavior only by re-running under
``mpirun -np N`` (SURVEY.md section 4.6); here multi-device correctness is
tested hermetically on a virtual 8-device CPU mesh.
"""

import os

if os.environ.get("PFHUB_TPU_TESTS"):
    # on-TPU kernel tests (tests/test_tpu_kernels.py): keep the axon plugin
    # active and run single-device. Invoke by hand from /root/repo:
    #   PFHUB_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -v
    # (ambient PYTHONPATH must include .axon_site; never alongside another
    # TPU process.)
    pass
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
