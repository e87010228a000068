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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# In-process CPU collectives SIGABRT when a participant is >40 s late to
# a rendezvous — routine when 8 virtual devices timeshare a few cores.
for _f in (
    "--xla_cpu_collective_call_terminate_timeout_seconds=3600",
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300",
):
    if _f.split("=")[0] not in flags:
        flags += " " + _f
os.environ["XLA_FLAGS"] = flags

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
