"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Physics validation follows the reference's checksum strategy
(ref: /root/reference/tests/checksum/checksum.py) which requires double
precision; the CPU backend provides that while TPU runs use f32 by default.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# the container's sitecustomize registers an 'axon' TPU backend at
# interpreter startup; route tests to the virtual CPU mesh instead
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
