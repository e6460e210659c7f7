"""Robot-pose layer on top of SQPnP: std-devs, gyro disambiguation + pivot.

Port of ``SqPnP::solve_robot_pose`` and ``compute_std_devs``
(``/root/reference/crates/chalkydri_sqpnp/src/lib.rs:224-246,297-377``),
re-shaped for batching: one call solves a whole batch of frames (one per
camera) with padded tag sets.

Reference constants (sqpnp/src/lib.rs:28-39):
  XY_STD_DEV_SCALAR = 5.0
  THETA_STD_DEV_SCALAR = 2.0
  MAX_TRUSTABLE_RMS = 0.1     (vision auto-distrust: std-devs -> MAX above it)
  MAX_GYRO_DELTA = 30 deg     (full pivot to the gyro heading at/after 30 deg)
  TAG_SIZE = 0.1651 m
and the caller passes SIGN_FLIP_CONST = 600.0 as the gyro energy penalty
weight (``crates/apriltags/src/lib.rs:6,337``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from chalkydri_tpu.geometry.tags import TAG_SIZE, corners_world
from chalkydri_tpu.geometry.transforms import SE3, matrix_to_yaw, smoothstep, wrap_angle
from chalkydri_tpu.solver.sqpnp import MAX_ITER, highest_precision, solve_sqpnp

XY_STD_DEV_SCALAR = 5.0
THETA_STD_DEV_SCALAR = 2.0
MAX_TRUSTABLE_RMS = 0.1
MAX_GYRO_DELTA_DEG = 30.0
SIGN_FLIP_CONST = 600.0  # crates/apriltags/src/lib.rs:6


class RobotPoseResult(NamedTuple):
    rotation: jax.Array  # [..., 3, 3] robot rotation in world (gyro-pivoted)
    position: jax.Array  # [..., 3]
    std_devs: jax.Array  # [..., 3] (x, y, theta)
    valid: jax.Array  # [...] bool


def compute_std_devs(pure_energy, distance, n_tags, dtype):
    """Distance/tag-count-scaled measurement std-devs.

    Port of ``compute_std_devs`` (``sqpnp/src/lib.rs:224-246``). Above
    MAX_TRUSTABLE_RMS the std-devs are driven to the dtype max so the robot's
    pose filter ignores the solve (vision auto-distrust, SURVEY.md section 5.3).
    """
    n_points = n_tags.astype(dtype) * 4.0
    rms = jnp.sqrt(jnp.maximum(pure_energy, 0.0) / jnp.maximum(n_points, 1.0))

    mult = 1.0 + distance / TAG_SIZE
    sqrt_n = jnp.sqrt(jnp.maximum(n_tags.astype(dtype), 1.0))

    xy = jnp.clip(rms * mult / sqrt_n * XY_STD_DEV_SCALAR, 0.01, 10.0)
    theta = jnp.clip(
        (rms / TAG_SIZE) * mult / sqrt_n * THETA_STD_DEV_SCALAR, 0.05, jnp.pi
    )

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    distrust = rms > MAX_TRUSTABLE_RMS
    xy = jnp.where(distrust, big, xy)
    theta = jnp.where(distrust, big, theta)
    return jnp.stack([xy, xy, theta], axis=-1)


@highest_precision
def solve_robot_pose(
    tag_rotations: jax.Array,  # [T, 3, 3] world tag rotations (padded)
    tag_translations: jax.Array,  # [T, 3]
    tag_mask: jax.Array,  # [T] bool
    camera_rays: jax.Array,  # [T, 4, 3] unprojected corner rays
    robot_to_cam: SE3,  # robot -> camera(CV) extrinsic
    gyro: jax.Array,  # scalar gyro heading (rad)
    sign_change_error=SIGN_FLIP_CONST,
    max_iter: int = MAX_ITER,
    tag_size: float = TAG_SIZE,
) -> RobotPoseResult:
    """Single-frame robot pose solve. vmap over a leading axis for batches.

    Port of ``solve_robot_pose`` (``sqpnp/src/lib.rs:297-377``):

    1. world->cam SQPnP over the 4 corners of every visible tag,
    2. std-devs from the pure geometric energy,
    3. robot pose = (world->cam)^-1 o robot_to_cam,
    4. yaw pivot toward the gyro heading, smoothstep-weighted by the yaw
       delta, rotating about the tag centroid.
    """
    dtype = tag_translations.dtype
    t_cap = tag_rotations.shape[0]

    # Corner points: [T, 4, 3] -> flat [4T, 3] with per-corner mask.
    world_pts = corners_world(SE3(tag_rotations, tag_translations), tag_size)
    world_flat = world_pts.reshape(t_cap * 4, 3)
    rays_flat = camera_rays.reshape(t_cap * 4, 3)
    mask_flat = jnp.repeat(tag_mask, 4)

    fwd_in_cam = robot_to_cam.rotation[..., :, 0]  # column 0 (lib.rs:313-318)

    def ground_plane_plausibility(r_mats, t_all):
        """|robot z| per candidate — the physical tiebreak for the planar
        two-fold ambiguity (see solve_sqpnp's plaus_fn doc): an FRC robot
        drives ON the floor (world z = 0); the mirror pose of a tag-wall
        scene puts it meters in the air at an energy that TIES the true
        pose at the corner-noise floor. Extension beyond the reference,
        active only inside the energy resolution band."""
        w2c = SE3(r_mats, t_all)  # [6] batched world->cam candidates
        t_world_robot = w2c.inverse().compose(robot_to_cam)
        return jnp.abs(t_world_robot.translation[..., 2])

    res = solve_sqpnp(
        world_flat,
        rays_flat,
        mask_flat,
        fwd_in_cam,
        jnp.cos(gyro),
        jnp.sin(gyro),
        sign_change_error,
        max_iter=max_iter,
        plaus_fn=ground_plane_plausibility,
    )

    n_tags = jnp.sum(tag_mask)
    distance = jnp.linalg.norm(res.translation)
    std_devs = compute_std_devs(res.energy, distance, n_tags, dtype)

    world_to_cam = SE3(res.rotation, res.translation)
    t_world_robot = world_to_cam.inverse().compose(robot_to_cam)

    robot_pos = t_world_robot.translation
    robot_rot = t_world_robot.rotation

    tag_centroid = jnp.sum(
        tag_translations * tag_mask.astype(dtype)[:, None], axis=0
    ) / jnp.maximum(n_tags.astype(dtype), 1.0)

    # Gyro pivot (lib.rs:344-376).
    vision_yaw = matrix_to_yaw(robot_rot)
    delta_yaw = wrap_angle(gyro - vision_yaw)
    delta_deg = jnp.abs(jnp.rad2deg(delta_yaw))
    weight = smoothstep(delta_deg / MAX_GYRO_DELTA_DEG)
    applied = delta_yaw * weight

    c, s = jnp.cos(applied), jnp.sin(applied)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rot_z = jnp.stack(
        [c, -s, zero, s, c, zero, zero, zero, one], axis=-1
    ).reshape(*jnp.shape(c), 3, 3)

    pivoted_pos = tag_centroid + rot_z @ (robot_pos - tag_centroid)
    pivoted_rot = rot_z @ robot_rot

    return RobotPoseResult(
        rotation=pivoted_rot,
        position=pivoted_pos,
        std_devs=std_devs,
        valid=res.valid,
    )


@partial(jax.jit, static_argnames=("max_iter", "tag_size"))
def solve_robot_pose_batched(
    tag_rotations,  # [B, T, 3, 3]
    tag_translations,  # [B, T, 3]
    tag_mask,  # [B, T]
    camera_rays,  # [B, T, 4, 3]
    robot_to_cam_rot,  # [B, 3, 3]
    robot_to_cam_t,  # [B, 3]
    gyro,  # [B]
    sign_change_error=SIGN_FLIP_CONST,
    max_iter: int = MAX_ITER,
    tag_size: float = TAG_SIZE,
) -> RobotPoseResult:
    """Batched (one element per camera frame) robot pose solve.

    The reference runs one solver per camera task on the CPU
    (``crates/apriltags/src/lib.rs:331-338``); here all cameras solve in one
    fused device program (SURVEY.md section 2.4 mapping #1).
    """
    def one(rot, t, m, rays, rc_r, rc_t, g):
        return solve_robot_pose(
            rot, t, m, rays, SE3(rc_r, rc_t), g,
            sign_change_error=sign_change_error,
            max_iter=max_iter, tag_size=tag_size,
        )

    return jax.vmap(one)(
        tag_rotations, tag_translations, tag_mask, camera_rays,
        robot_to_cam_rot, robot_to_cam_t, gyro,
    )


class SqPnP:
    """Object-style facade mirroring the reference's ``SqPnP`` builder API
    (``sqpnp/src/lib.rs:200-222``): ``SqPnP().max_iter(n).tolerance(t)``.

    Stateless under the hood — each solve is a pure jitted call.
    """

    def __init__(self, max_iter: int = MAX_ITER, tol: float = 1e-8):
        self._max_iter = max_iter
        self._tol = tol

    def max_iter(self, n: int) -> "SqPnP":
        return SqPnP(n, self._tol)

    def tolerance(self, tol: float) -> "SqPnP":
        return SqPnP(self._max_iter, tol)

    def solve_robot_pose(self, tag_rotations, tag_translations, tag_mask,
                         camera_rays, robot_to_cam: SE3, gyro,
                         sign_change_error=SIGN_FLIP_CONST):
        res = solve_robot_pose(
            tag_rotations, tag_translations, tag_mask, camera_rays,
            robot_to_cam, gyro, sign_change_error=sign_change_error,
            max_iter=self._max_iter,
        )
        return res
