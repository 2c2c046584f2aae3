"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is validated single-process per SURVEY §4(d): the host
platform is forced to expose 8 devices so `jax.sharding.Mesh` collectives
execute without real TPU hardware (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)

# Per-op XLA-CPU compiles cost ~0.4 s each here; cache them across runs and
# keep test code jitted so each pipeline is one compile.
jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
