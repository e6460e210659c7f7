"""Tag corner geometry.

Port of the reference's tag corner model
(``/root/reference/crates/chalkydri_sqpnp/src/lib.rs:37-39,379-394``):
tags are squares of side ``TAG_SIZE`` (0.1651 m for 2026) lying in the tag
frame's YZ plane (X is the outward normal), with corners ordered

    0: (0, -S, -S)   image bottom-left for an upright tag
    1: (0, +S, -S)   image bottom-right
    2: (0, +S, +S)   image top-right
    3: (0, -S, +S)   image top-left

where S = TAG_SIZE / 2. This matches libapriltag's detection corner order
(counter-clockwise starting bottom-left), which the detector reproduces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chalkydri_tpu.geometry.transforms import SE3
from chalkydri_tpu.utils.precision import highest_precision

TAG_SIZE = 0.1651  # meters, 2026 season (sqpnp/src/lib.rs:38)
CORNER_DISTANCE = TAG_SIZE / 2.0


def corner_offsets(dtype=jnp.float64, tag_size: float = TAG_SIZE) -> jax.Array:
    """[4, 3] corner offsets in the tag frame."""
    s = tag_size / 2.0
    return jnp.array(
        [
            [0.0, -s, -s],
            [0.0, s, -s],
            [0.0, s, s],
            [0.0, -s, s],
        ],
        dtype=dtype,
    )


@highest_precision
def corners_world(tag_pose: SE3, tag_size: float = TAG_SIZE) -> jax.Array:
    """World-frame corners [..., 4, 3] for tag pose(s) with leading batch dims.

    Mirrors ``corner_points_from_center``
    (``crates/chalkydri_sqpnp/src/lib.rs:379-394``).
    """
    offs = corner_offsets(tag_pose.translation.dtype, tag_size)  # [4, 3]
    rot = tag_pose.rotation[..., None, :, :]  # [..., 1, 3, 3]
    t = tag_pose.translation[..., None, :]  # [..., 1, 3]
    return jnp.einsum("...ij,...j->...i", rot, offs) + t
