"""On-device color -> grayscale conversion.

The reference converts to GRAY8 on the CPU inside its GStreamer pipeline
(``videoconvert`` -> GRAY8 capsfilter,
``/root/reference/crates/chalkydri/src/cameras/pipeline.rs:103-121``).
BASELINE config #2 moves that conversion on-device as the first fused stage:
raw color frames upload once and the grayscale pass fuses into the threshold
kernel's input (SURVEY.md section 2.3 GStreamer row).

Supported formats mirror ``compute_buffer_size``
(``gst_to_cu.rs:171-188``): GREY (no-op), RGB/BGR(A) interleaved, YUYV
packed, NV12/I420 planar (Y plane extraction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Integer BT.601 luma coefficients (x256).
_R, _G, _B = 77, 150, 29


@partial(jax.jit, static_argnames=("fourcc",))
def to_gray_device(frames: jax.Array, fourcc: str = "GREY") -> jax.Array:
    """Convert a batch of raw frames to GRAY8 on device.

    Shapes by format:
      GREY: [B, H, W] u8 (passthrough)
      RGB/BGR: [B, H, W, 3] u8 (RGBA/BGRA: [B, H, W, 4])
      YUYV: [B, H, 2*W] u8 packed (Y0 U Y1 V)
      NV12/I420: [B, 3*H/2, W] u8 planar (Y plane is the top H rows)
    """
    f = fourcc.upper()
    if f in ("GREY", "GRAY", "GRAY8", "Y800"):
        return frames
    if f in ("RGB", "RGB3", "RGBA", "BGR", "BGR3", "BGRA"):
        c = frames.astype(jnp.uint16)
        if f.startswith("RGB"):
            r, g, b = c[..., 0], c[..., 1], c[..., 2]
        else:
            b, g, r = c[..., 0], c[..., 1], c[..., 2]
        return ((_R * r + _G * g + _B * b) >> 8).astype(jnp.uint8)
    if f in ("YUYV", "YUY2"):
        return frames[..., 0::2]
    if f in ("NV12", "I420", "YU12"):
        h = (frames.shape[1] * 2) // 3
        return frames[:, :h, :]
    raise ValueError(f"unsupported fourcc {fourcc!r}")
