"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding code
paths (jax.sharding.Mesh + shard_map) are exercised without TPU hardware, per
the driver contract. f64 is enabled so parity tests against the reference's
f64 semantics are meaningful; TPU-dtype (f32/bf16) behavior is tested
explicitly with tolerances.
"""

import os
import sys

# CHALKYDRI_TEST_PLATFORM overrides the default CPU forcing — e.g.
# `CHALKYDRI_TEST_PLATFORM=axon pytest -k "kernel or fused"` re-runs the
# Pallas kernel parity tests on the real TPU chip (x64 stays off there:
# the TPU has no f64).
_platform = os.environ.get("CHALKYDRI_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if _platform == "cpu" and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU PJRT plugin and pins
# JAX_PLATFORMS before this file runs; override explicitly so the test suite
# runs where it's told (default: the virtual 8-device CPU mesh).
jax.config.update("jax_platforms", _platform)
if _platform == "cpu":
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_field_json():
    """Path to a WPILib-schema 2026 field layout: the reference's own
    ``field.json`` when the read-only mount is present, else the in-tree
    example layout (examples/field_2026.json — same schema, dimensions,
    and tag-1 anchor pose, so the suite is self-contained without the
    reference mounted)."""
    path = os.path.join(REFERENCE_DIR, "field.json")
    if not os.path.exists(path):
        path = os.path.join(
            os.path.dirname(__file__), "..", "examples", "field_2026.json"
        )
    return os.path.abspath(path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
