"""Batched SQPnP solver (layer 2 of the build plan, SURVEY.md section 7.1).

Ports the semantics of the reference's ``chalkydri_sqpnp`` crate
(``/root/reference/crates/chalkydri_sqpnp/src/lib.rs``) into fixed-shape,
vmappable JAX.
"""

from chalkydri_tpu.solver.sqpnp import (  # noqa: F401
    MAX_ITER,
    NUM_CANDIDATES,
    TOL_SQ,
    SqPnPResult,
    build_linear_system,
    constraints_and_jacobian,
    nearest_so3,
    newton_refine,
    solve_candidates,
    solve_sqpnp,
)
from chalkydri_tpu.solver.robot_pose import (  # noqa: F401
    MAX_GYRO_DELTA_DEG,
    MAX_TRUSTABLE_RMS,
    SIGN_FLIP_CONST,
    THETA_STD_DEV_SCALAR,
    XY_STD_DEV_SCALAR,
    RobotPoseResult,
    SqPnP,
    compute_std_devs,
    solve_robot_pose,
    solve_robot_pose_batched,
)
