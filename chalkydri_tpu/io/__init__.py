"""Host I/O edges: robot comm (whacknet), config, capture, NT hooks
(layer 5 of the build plan, SURVEY.md section 7.1)."""

from chalkydri_tpu.io.whacknet import (  # noqa: F401
    Comm,
    RobotPose,
    VisionUncertainty,
    decode_measurement,
    encode_measurement,
    team_ip,
)
