"""Synthetic AprilTag scene renderer — the detector's ground-truth oracle.

Renders tags onto a canvas with known sub-pixel corner positions (via
cv2.warpPerspective), optionally through the OpenCVModel5 lens model, so
detector output can be compared against exact ground truth (SURVEY.md
section 4: "golden-image unit tests per detector stage against synthetic
rendered 36h11 frames").
"""

from __future__ import annotations

import numpy as np

from chalkydri_tpu.detector.families import TagFamily, render_tag


def place_tag(
    canvas: np.ndarray,
    family: TagFamily,
    tag_id: int,
    corners_dst: np.ndarray,
    cell_px: int = 16,
    rot90: int = 0,
) -> np.ndarray:
    """Warp a rendered tag onto the canvas.

    Args:
      canvas: [H, W] uint8, modified in place.
      corners_dst: [4, 2] float — where the OUTER black-border corners land,
        in the canonical order (BL, BR, TR, TL in image coords for an upright
        tag, i.e. counter-clockwise in y-up convention).
      rot90: rotate the tag image by rot90 * 90 degrees counter-clockwise
        before warping (simulates a physically rotated tag; ground-truth
        canonical corners stay at the same image positions but the canonical
        corner 0 moves).

    Returns the ground-truth canonical corners [4, 2] — i.e. where a correct
    detector must report corner 0..3 after decode rotation correction.
    """
    import cv2

    img = render_tag(family, tag_id, cell_px=cell_px, white_border=1)
    if rot90:
        img = np.rot90(img, rot90).copy()
    side = img.shape[0]
    b = cell_px  # white border width in pixels
    # Outer black-border corners in the (possibly rotated) tag image,
    # ordered BL, BR, TR, TL in IMAGE coords (y down).
    src = np.array(
        [
            [b, side - b],  # BL
            [side - b, side - b],  # BR
            [side - b, b],  # TR
            [b, b],  # TL
        ],
        dtype=np.float32,
    )
    # warpPerspective samples at pixel centers; the corner grid positions
    # above are cell boundaries, i.e. located at pixel-center coordinate - 0.5.
    src -= 0.5

    # If the tag image was rotated by rot90 (CCW), the canonical corner 0
    # (data-frame BL) is now at a different image position. The destination
    # quad pins the IMAGE positions; ground truth canonical corners are the
    # destination corners rolled accordingly.
    dst = np.asarray(corners_dst, np.float32)
    h, _ = cv2.findHomography(src, dst)
    cv2.warpPerspective(
        img,
        h,
        (canvas.shape[1], canvas.shape[0]),
        dst=canvas,
        flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_TRANSPARENT,
    )
    # Physical rotation by rot90 CCW (in image coords with y down, np.rot90
    # turns the top-left to bottom-left): canonical corner 0 lands rot90
    # steps around the destination quad.
    gt = np.roll(dst, rot90, axis=0)
    return gt


def simple_scene(
    family: TagFamily,
    tags: list[tuple[int, np.ndarray]],
    size: tuple[int, int] = (480, 640),
    background: int = 160,
    noise: float = 0.0,
    rot90s: list[int] | None = None,
    seed: int = 0,
):
    """Render a multi-tag scene. tags: [(id, corners [4,2]), ...].

    Returns (canvas [H, W] uint8, gt_corners {id: [4, 2]}).
    """
    h, w = size
    canvas = np.full((h, w), background, np.uint8)
    gts = {}
    rot90s = rot90s or [0] * len(tags)
    for (tid, corners), r in zip(tags, rot90s):
        gts[tid] = place_tag(canvas, family, tid, corners, rot90=r)
    if noise > 0:
        rng = np.random.default_rng(seed)
        noisy = canvas.astype(np.float32) + rng.normal(0, noise, canvas.shape)
        canvas = np.clip(noisy, 0, 255).astype(np.uint8)
    return canvas, gts


def axis_aligned_corners(cx: float, cy: float, half: float) -> np.ndarray:
    """Upright square: BL, BR, TR, TL in image coords (y down)."""
    return np.array(
        [
            [cx - half, cy + half],
            [cx + half, cy + half],
            [cx + half, cy - half],
            [cx - half, cy - half],
        ],
        dtype=np.float32,
    )
