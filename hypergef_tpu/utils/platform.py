"""Platform selection helper.

The ambient sitecustomize pins jax to the tunneled TPU plugin via
``jax.config.update`` at interpreter start, so the ``JAX_PLATFORMS``
environment variable alone is silently ignored.  Scripts that honor the
env var must re-assert it after importing jax.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat and "axon" not in plat:
        import jax

        jax.config.update("jax_platforms", plat)
