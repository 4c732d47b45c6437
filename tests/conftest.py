"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on the host platform with
``xla_force_host_platform_device_count`` (the JAX analogue of a fake
distributed backend), as the CI machine has no multi-chip TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Some environments register a TPU platform plugin that ignores
# JAX_PLATFORMS; pin the default device to CPU explicitly as well.
import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
