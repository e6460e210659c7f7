"""Matmul-precision control.

TPU's default matmul precision is bf16. That is the right default for the
detector's bulk image work, but geometry/solver math (3x3 rotations, camera
models, 9x9/15x15 solver systems) needs full f32: measured on v5e, bf16
degrades the solved robot pose from ~2e-5 m to ~0.26 m error. Every
geometry/solver entry point is wrapped with ``highest_precision``; the cost is
negligible because those matrices are tiny.
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Force HIGHEST (full f32) matmul precision while tracing ``fn``."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
