"""Robot-side client libraries (chalkydrilib / chalkydrilibj parity)."""

from chalkydri_tpu.clients.python_client import Chalkydri, Pose2d  # noqa: F401
