"""Pure-JAX geometry core: transforms, camera models, field layout, tag model.

This is layer 1 of the build plan (SURVEY.md section 7.1): no I/O on the hot
path, fully batched and testable.
"""

from chalkydri_tpu.geometry.transforms import (  # noqa: F401
    SE3,
    euler_to_matrix,
    matrix_to_quat,
    matrix_to_yaw,
    quat_to_matrix,
    robot_to_cam_from_offsets,
    smoothstep,
    wrap_angle,
)
from chalkydri_tpu.geometry.camera import OpenCVModel5, stack_models  # noqa: F401
from chalkydri_tpu.geometry.field_layout import (  # noqa: F401
    MAX_TAG_ID,
    FieldLayout,
    load_field_layout,
    parse_field_layout,
)
from chalkydri_tpu.geometry.tags import (  # noqa: F401
    CORNER_DISTANCE,
    TAG_SIZE,
    corner_offsets,
    corners_world,
)
