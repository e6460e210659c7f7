"""The shared detector-parity corpus: >= 50 rendered 36h11 scenes with
perspective jitter, blur, and noise.

One definition used by BOTH the live parity test
(tests/test_detector.py::TestArucoParityCorpus) and the golden-corpus
generator (tests/golden/gen_golden.py) — the golden file is only meaningful
if it was produced on exactly these scenes (seeded, deterministic).
"""

from __future__ import annotations

import numpy as np

from chalkydri_tpu.detector import load_family

from tests.reference_impl.render import axis_aligned_corners, simple_scene

N_SCENES = 56
FAM = load_family("tag36h11")


def build_parity_corpus(n_scenes: int = N_SCENES):
    """Deterministic scene list [(canvas uint8 [480, 640], {id: corners})]."""
    from scipy import ndimage

    rng = np.random.default_rng(20260816)
    scenes = []
    for i in range(n_scenes):
        slots = [(170.0, 240.0), (470.0, 240.0)]
        n_tags = int(rng.integers(1, 3))
        placed, used = [], set()
        for k in range(n_tags):
            tid = int(rng.integers(0, 587))
            while tid in used:
                tid = int(rng.integers(0, 587))
            used.add(tid)
            cx = slots[k][0] + float(rng.uniform(-25, 25))
            cy = slots[k][1] + float(rng.uniform(-50, 50))
            half = float(rng.uniform(40, 75))
            base = axis_aligned_corners(cx, cy, half)
            base = base + rng.uniform(-0.18 * half, 0.18 * half, (4, 2))
            placed.append((tid, base.astype(np.float32)))
        canvas, gts = simple_scene(FAM, placed, seed=1000 + i)
        blur = float(rng.uniform(0.0, 1.1))
        if blur > 0.2:
            canvas = ndimage.gaussian_filter(canvas.astype(np.float32), blur)
        noise = float(rng.uniform(0.0, 5.0))
        if noise > 0:
            canvas = canvas + rng.normal(0, noise, canvas.shape)
        canvas = np.clip(canvas, 0, 255).astype(np.uint8)
        scenes.append((canvas, gts))
    return scenes
