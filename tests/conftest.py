"""
Test configuration: run the suite on the CPU backend with full float64 and a
virtual 8-device mesh, mirroring the reference's strategy of testing MPI code
on small real meshes (dedalus/tests_parallel uses 4-rank 2x2 meshes).
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (TPU), which lacks
# f64 FFT / c128; the test suite needs exact f64 and a virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# jax may already be imported (e.g. by a pytest plugin) with the environment's
# JAX_PLATFORMS=axon; force the platform through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
