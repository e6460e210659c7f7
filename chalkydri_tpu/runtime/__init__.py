"""Runtime: dataflow graph, task model, scheduler, clock, unified logging
(layer 4 of the build plan, SURVEY.md section 7.1) — the Copper (cu29)
replacement."""

from chalkydri_tpu.runtime.clock import RobotClock, Stamped, Tov  # noqa: F401
from chalkydri_tpu.runtime.graph import Edge, ResourceDecl, TaskGraph, TaskNode  # noqa: F401
from chalkydri_tpu.runtime.tasks import (  # noqa: F401
    REGISTRY,
    BaseTask,
    ResourceManager,
    SinkTask,
    SrcTask,
    Task,
    register_task,
)
from chalkydri_tpu.runtime.logging import UnifiedLogger, read_log, replay_frames  # noqa: F401
from chalkydri_tpu.runtime.app import App  # noqa: F401

# Importing subsystems registers their task types.
import chalkydri_tpu.subsystems  # noqa: F401,E402
