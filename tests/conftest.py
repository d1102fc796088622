"""Test config: run JAX on a virtual 8-device CPU mesh so sharding code paths
are exercised without TPU hardware (the driver separately compiles the
multi-chip path via __graft_entry__.dryrun_multichip)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# NOTE: the JAX_PLATFORMS env var is ignored by this jax build (the 'axon'
# TPU plugin still wins); the config flag below is what actually forces the
# virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

# Full f32 accumulation so golden tests against torch CPU are bit-stable.
jax.config.update("jax_default_matmul_precision", "highest")

# CPU XLA compiles convs slowly (~1-2s each); persist compiled executables
# across test processes so the suite stays fast after the first run.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
