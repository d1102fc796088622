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
    when the variable is unset or names the default device plugin)."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms and platforms != "axon":
        import jax

        jax.config.update("jax_platforms", platforms)
