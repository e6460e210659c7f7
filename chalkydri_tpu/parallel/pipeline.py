"""Multi-chip vision pipeline: the fused detect->pose step over a device mesh.

Public packaging of the scaling recipe the driver dryrun exercises
(__graft_entry__.dryrun_multichip) and SURVEY.md section 2.4/5.7 call for:

- cameras/frames ride the ``data`` mesh axis (frames are independent — the
  reference's per-camera task parallelism becomes pure data parallelism),
- per-camera parameters (intrinsics, extrinsics) shard with their frames,
- the field layout replicates (every chip needs every tag pose),
- jit + committed input shardings let GSPMD partition the whole fused
  program; collectives ride ICI.

For frames too large per chip, the ``space`` axis row-shards the
stencil-heavy early stages with explicit ppermute halo/seam exchange
(parallel/sharded_stages.py); this module's step keeps frames whole per
chip, which is the right layout for multi-camera rigs of normal frames
(N cameras -> N/devices cameras per chip).

Usage:

    mesh = make_mesh(8)
    step, place = make_sharded_vision_pipeline(layout, params, rc, mesh)
    out = step(*place(frames_np, gyro_np))   # out fields sharded over 'data'
"""

from __future__ import annotations

import jax

from chalkydri_tpu.geometry.field_layout import FieldLayout
from chalkydri_tpu.geometry.transforms import SE3
from chalkydri_tpu.parallel.mesh import batch_sharding, frame_sharding
from chalkydri_tpu.pipeline import make_vision_pipeline


def make_sharded_vision_pipeline(
    layout: FieldLayout,
    camera_params: jax.Array,  # [B, 9]
    robot_to_cam: SE3,  # batched [B, 3, 3] / [B, 3]
    mesh,
    **pipeline_kwargs,
):
    """Build (step, place) for a camera rig sharded over mesh axis 'data'.

    ``step`` is the same fused program as ``make_vision_pipeline``'s; GSPMD
    partitions it from the input shardings ``place`` commits. The batch B
    (camera count, possibly x frames-in-flight) must be a MULTIPLE of the
    'data' axis size. ``place(frames, gyro)`` device_puts host arrays with
    the right shardings — call it once per iteration with fresh capture
    data.
    """
    n_data = mesh.shape["data"]
    b = camera_params.shape[0]
    assert b % n_data == 0, (
        f"camera batch {b} must be a multiple of the data axis {n_data}"
    )

    # Per-camera parameters shard with their frames; the closed-over layout
    # tables replicate automatically (jit constants).
    bs = batch_sharding(mesh)
    camera_params = jax.device_put(camera_params, bs)
    robot_to_cam = SE3(
        jax.device_put(robot_to_cam.rotation, bs),
        jax.device_put(robot_to_cam.translation, bs),
    )

    step = make_vision_pipeline(
        layout, camera_params, robot_to_cam, **pipeline_kwargs
    )

    fs = frame_sharding(mesh, spatial=False)

    def place(frames, gyro):
        return jax.device_put(frames, fs), jax.device_put(gyro, bs)

    return step, place
