"""Test configuration: run everything on an 8-device virtual CPU mesh.

The runtime environment force-registers a TPU backend via sitecustomize
(ignoring JAX_PLATFORMS), so we pin the default device to CPU after
import. The driver benchmarks on real TPU; tests exercise multi-device
sharding on ``xla_force_host_platform_device_count=8`` virtual CPUs
(SURVEY.md section 4 test strategy).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "ATTNSHIFT_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]
