"""Platform pinning that actually works in this environment.

The axon TPU plugin registers at interpreter start and can stall any process
inside ``jax.devices()`` while the tunnel is degraded — even with
``JAX_PLATFORMS=cpu`` in the environment. The only reliable pin is the
config flag set after ``import jax``. Every CLI entry point calls
:func:`pin_platform_from_env` first so ``JAX_PLATFORMS=cpu python -m ...``
behaves the way users expect.
"""
from __future__ import annotations

import os


def pin_platform_from_env() -> None:
    """Mirror the JAX_PLATFORMS env var into the jax config flag (a no-op
    when the variable is unset or names the default device plugin), and
    enable the persistent compile cache — remote TPU compiles take minutes
    here, so every CLI entry point wants cache hits across runs."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms and platforms != "axon":
        import jax

        jax.config.update("jax_platforms", platforms)
    enable_compile_cache()


def enable_compile_cache() -> None:
    """Point jax at a persistent compilation cache. JAX_COMPILATION_CACHE_DIR
    overrides; the default is the repo-local .cache/jax that tests/conftest
    and the probe scripts already share."""
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(repo, ".cache", "jax"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
