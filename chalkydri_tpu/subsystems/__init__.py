"""Host-side subsystem tasks around the fused vision core.

Parity targets (SURVEY.md section 2.1): Calibrator, Monitor, AprilAdapter,
PythonSubsys (custom user code), MlSubsys (the Coral slot, now a jitted JAX
model hook), and the AAEC exposure-control stub — implemented, not stubbed.
"""

from chalkydri_tpu.subsystems.calibration import CALIB, Calibrator  # noqa: F401
from chalkydri_tpu.subsystems.monitor import Monitor  # noqa: F401
from chalkydri_tpu.subsystems.apriltags_adapter import AprilAdapter  # noqa: F401
from chalkydri_tpu.subsystems.custom import PythonSubsys  # noqa: F401
from chalkydri_tpu.subsystems.ml import MlSubsys  # noqa: F401
from chalkydri_tpu.subsystems.aaec import compute_exposure_gradients  # noqa: F401
