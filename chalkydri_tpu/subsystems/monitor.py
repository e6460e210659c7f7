"""Monitor sink: JPEG-compressed frame telemetry.

Port of the reference's rerun monitor (``crates/configurator/src/monitor.rs:
11-102``): JPEG-compress each frame (quality 20, grayscale) and hand it to a
telemetry backend. The reference streams to a rerun gRPC server on :6767
with a 25%-of-RAM cap; rerun isn't available in this environment, so the
default backend is an MJPEG ring buffer + optional on-disk dump, and the
MJPEG HTTP streamer (io/mjpeg.py) can serve it to a driver station —
covering the reference's MjpegProc role too
(``crates/chalkydri/src/cameras/mjpeg.rs:18-144``).
"""

from __future__ import annotations

import collections
import os
import threading

import numpy as np

from chalkydri_tpu.runtime.clock import RobotClock, Stamped
from chalkydri_tpu.runtime.tasks import SinkTask, register_task

JPEG_QUALITY = 20  # monitor.rs:92 (quality 20, gray subsampling)


class FrameRing:
    """Bounded ring of (ts_us, jpeg bytes); newest-first access."""

    def __init__(self, capacity: int = 64):
        self._dq = collections.deque(maxlen=capacity)
        self._lock = threading.Lock()

    def push(self, ts_us: int, jpeg: bytes) -> None:
        with self._lock:
            self._dq.append((ts_us, jpeg))

    def latest(self):
        with self._lock:
            return self._dq[-1] if self._dq else None

    def __len__(self):
        with self._lock:
            return len(self._dq)


@register_task("Monitor")
class Monitor(SinkTask):
    """config: {quality, dump_dir, ring_capacity}."""

    def __init__(self, config=None, resources=None):
        super().__init__(config, resources)
        self.quality = int(self.config.get("quality", JPEG_QUALITY))
        self.dump_dir = self.config.get("dump_dir")
        self.ring = FrameRing(int(self.config.get("ring_capacity", 64)))
        self._n = 0

    def process(self, clock: RobotClock, msg: Stamped) -> None:
        if msg.payload is None:
            return
        import cv2

        frame = np.asarray(msg.payload)
        ok, enc = cv2.imencode(
            ".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, self.quality]
        )
        if not ok:
            return
        ts = msg.tov.time_us or clock.now_us()
        self.ring.push(ts, enc.tobytes())
        if self.dump_dir:
            os.makedirs(self.dump_dir, exist_ok=True)
            path = os.path.join(self.dump_dir, f"frame_{self._n:06d}.jpg")
            with open(path, "wb") as f:
                f.write(enc.tobytes())
        self._n += 1
