"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on the host platform with
``xla_force_host_platform_device_count`` (the JAX analogue of a fake
distributed backend), as the CI machine has no multi-chip TPU.

Some environments register a TPU platform plugin at interpreter start
and force ``jax_platforms`` to include it; re-forcing the config to
"cpu" before any backend initializes keeps tests off the (single,
possibly busy) TPU tunnel entirely.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
