"""Honor a user-requested JAX platform in CLI entry points.

This environment registers a TPU PJRT plugin from a sitecustomize hook that
re-pins the platform selection, so ``JAX_PLATFORMS=cpu python -m ...`` alone
does not take effect — the first device op then dials the TPU transport
(and hangs indefinitely if it is down). Every CLI calls
``apply_platform_env()`` right after importing jax; tests/conftest.py does
the same dance for the test suite.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """If JAX_PLATFORMS names explicit platform(s), force them through the
    config (which wins over plugin hooks). No-op otherwise."""
    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if want and want != "axon":
        import jax

        jax.config.update("jax_platforms", want)
