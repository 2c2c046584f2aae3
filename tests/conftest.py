"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is validated single-process per SURVEY §4(d): the host
platform is forced to expose 8 devices so `jax.sharding.Mesh` collectives
execute without real TPU hardware (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

This environment preloads a TPU PJRT plugin from sitecustomize at
interpreter startup, so mutating env vars here is too late — jax is already
imported and configured. Instead, re-exec pytest once with the backend
selection pinned to CPU (JAX_PLATFORM_NAME is honored at process start; set
GSPLAT_TEST_BACKEND=tpu to run the suite on real TPU instead).
"""

import os
import sys

_want = os.environ.get("GSPLAT_TEST_BACKEND", "cpu")

if _want == "cpu" and os.environ.get("_GSPLAT_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["_GSPLAT_TEST_REEXEC"] = "1"
    env["JAX_PLATFORM_NAME"] = "cpu"
    # The TPU PJRT plugin is registered from sitecustomize only when
    # PALLAS_AXON_POOL_IPS is set, and once registered it can override
    # platform selection (and flake if the chip tunnel is down) — drop it
    # and pin JAX_PLATFORMS so the CPU pin is deterministic.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)

# Per-op XLA compiles are slow here; cache them across runs and keep test
# code jitted so each pipeline is one compile.
jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()} devices: {jax.device_count()}"
