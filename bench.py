"""Benchmark: fused batched detect+pose throughput on one chip.

Measures BASELINE config #5's shape: a 4-camera batch of 1280x800 grayscale
frames with real 36h11 tags through the full fused pipeline (threshold ->
CCL -> cluster -> quad -> refine -> decode -> unproject -> SQPnP), steady
state, on whatever device JAX provides (the driver runs this on one TPU
chip).

Baseline denominator: the reference's Rust/C detector publishes no numbers
(BASELINE.md) and can't be built here (no cargo), so the measured stand-in is
OpenCV's AprilTag 36h11 detector (the same detection problem, C++ on this
host's CPU, single process) on identical frames. ``vs_baseline`` is
tpu_fps / cpu_fps — the north-star target is >= 4.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

H, W = 800, 1280
BATCH = 4
WARMUP = 3
# Iterations inside the ONE lax.scan dispatch. The per-call wall time is
# dispatch RTT + ITERS * step; on this environment's remote-TPU tunnel the
# RTT is ~30 ms (measured with an empty-body scan: total wall ~30 ms
# whether the scan runs 50 or 200 iterations), so at 20 iters it inflated
# the reported step by ~1.5 ms. 400 iters amortizes the bias below 0.1 ms
# (kept in the number rather than subtracted — conservative); steady-state
# production dispatches asynchronously (pipeline_depth >= 1), so per-
# dispatch RTT does not bound deployed throughput.
ITERS = 400


def build_scene():
    """Render a 1280x800 frame with several 36h11 tags at varied poses."""
    from chalkydri_tpu.detector import load_family
    from tests.reference_impl.render import place_tag

    fam = load_family("tag36h11")
    canvas = np.full((H, W), 150, np.uint8)
    quads = {
        1: np.array([[150, 500], [330, 500], [330, 320], [150, 320]], np.float32),
        5: np.array([[520, 560], [700, 530], [690, 360], [530, 390]], np.float32),
        9: np.array([[880, 480], [1020, 480], [1020, 340], [880, 340]], np.float32),
        13: np.array([[1080, 700], [1220, 690], [1215, 560], [1085, 570]], np.float32),
    }
    for tid, q in quads.items():
        place_tag(canvas, fam, tid, q)
    return canvas


def bench_tpu(frames_np):
    import jax
    import jax.numpy as jnp

    from chalkydri_tpu.geometry.field_layout import parse_field_layout
    from chalkydri_tpu.pipeline import build_rig_from_config, make_vision_pipeline

    calib = {
        "fx": 1100.0, "fy": 1100.0, "cx": W / 2, "cy": H / 2,
        "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
        "width": W, "height": H,
    }
    tags = [
        {
            "ID": t,
            "pose": {
                "translation": {"x": 10.0 + 0.5 * t, "y": 4.0, "z": 1.0},
                "rotation": {"quaternion": {"W": 0.0, "X": 0.0, "Y": 0.0, "Z": 1.0}},
            },
        }
        for t in (1, 5, 9, 13)
    ]
    layout = parse_field_layout(
        {"tags": tags, "field": {"length": 16.5, "width": 8.0}}, dtype=jnp.float32
    )
    cams = [
        {
            "calib": json.dumps({"OpenCVModel5": calib}),
            "robot_to_cam": json.dumps(
                {"roll": 0, "pitch": 0, "yaw": 0, "x": 0, "y": 0, "z": 1.0}
            ),
        }
    ] * BATCH
    params, rc = build_rig_from_config(cams, layout)
    step = make_vision_pipeline(layout, params, rc)

    frames = jnp.asarray(frames_np)
    gyro = jnp.zeros(BATCH, jnp.float32)

    out = step(frames, gyro)
    n_det = int(np.asarray(out.detections.valid[0]).sum())

    # Device-true timing: ITERS steps inside ONE lax.scan dispatch with a
    # per-iteration input perturbation (LSB toggle) so nothing is hoisted,
    # and a forced host fetch of the reduced result. block_until_ready is
    # not a reliable completion barrier on remote-tunnel platforms, and
    # per-dispatch wall timing would include network RTT per iteration.
    @jax.jit
    def many(frames, gyro):
        def body(c, i):
            f = frames ^ (i % 2).astype(frames.dtype)
            o = step(f, gyro)
            leaves = jax.tree_util.tree_leaves(o)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    float(many(frames, gyro))  # compile + drain
    best = float("inf")
    for _ in range(WARMUP):
        t0 = time.perf_counter()
        float(many(frames, gyro))  # fetch forces completion
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return BATCH / best, n_det, str(jax.devices()[0])


def bench_cpu_reference(frame):
    """OpenCV AprilTag 36h11 detect on the same frame, single process.

    Hygiene (VERDICT round-2 item 10 — the denominator swung 13x-33x with
    host load while the TPU numerator was stable):
    - runs FIRST, before JAX initializes or any other bench work loads the
      host (keeping the denominator's thread pool and best-of-N definition
      identical to rounds 1-2 so the multiple stays comparable),
    - more batches (10x10) and the per-batch BEST as the denominator — the
      machine's honest best, conservative for vs_baseline,
    - the spread across batches is REPORTED (cpu_ref_fps + cpu_ref_cv in
      the JSON) so a loaded run is visible in the record instead of
      silently shifting the multiple.
    Returns (best_fps, [per-batch fps]).
    """
    import cv2

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    det = cv2.aruco.ArucoDetector(d)
    det.detectMarkers(frame)  # warm
    batch_fps = []
    for _ in range(10):
        t0 = time.perf_counter()
        for _ in range(10):
            corners, ids, _ = det.detectMarkers(frame)
        batch_fps.append(10 / (time.perf_counter() - t0))
    return max(batch_fps), batch_fps


_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "float(jnp.sum(jax.jit(lambda a: a @ a)(jnp.ones((8, 8)))));"
    "print(jax.devices()[0])"
)


def _wait_device_reachable(attempts: int = 3, probe_timeout_s: float = 120.0,
                           backoff_s: tuple = (30.0, 60.0)) -> None:
    """Wait for the TPU transport with bounded retries, then fail (exit 2).

    Round-3 lesson: a single in-process fail-fast probe turned one transient
    tunnel outage into a lost round of perf evidence (BENCH_r03.json is a
    device-unreachable record; VERDICT round 3). A hung PJRT backend init
    can't be retried in-process — the first init attempt poisons the
    process — so each probe runs in a SUBPROCESS that can be killed on
    timeout, and only after one succeeds does this process touch JAX."""
    import subprocess

    last = "no attempt"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=probe_timeout_s,
                env=os.environ.copy(),
            )
            if r.returncode == 0:
                print(f"# device probe ok: {r.stdout.strip()}", file=sys.stderr)
                return
            last = (r.stderr.strip() or "probe failed")[-300:]
        except subprocess.TimeoutExpired:
            last = f"backend init exceeded {probe_timeout_s:.0f}s"
        if i < attempts - 1:
            wait = backoff_s[min(i, len(backoff_s) - 1)]
            print(f"# device probe attempt {i + 1}/{attempts} failed "
                  f"({last}); retrying in {wait:.0f}s", file=sys.stderr)
            time.sleep(wait)
    print(
        json.dumps({"error": "device unreachable",
                    "detail": f"{attempts} probe attempts failed; last: {last}"}),
        file=sys.stderr,
    )
    os._exit(2)


def _enable_persistent_cache() -> None:
    """Warm-start compiles from the same persistent cache main.py uses, so a
    bench rerun (or a retry after an outage) skips the ~30-60 s compile."""
    import jax

    cache_dir = os.environ.get(
        "CHALKYDRI_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "chalkydri-tpu"),
    )
    if cache_dir and cache_dir.lower() != "none":
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    frame = build_scene()
    frames = np.broadcast_to(frame, (BATCH, H, W)).copy()

    # Denominator first: JAX/TPU init and compilation load the host; the
    # CPU reference must see a quiet machine.
    cpu_fps, cpu_samples = bench_cpu_reference(frame)
    _wait_device_reachable()
    _enable_persistent_cache()
    tpu_fps, n_det, dev = bench_tpu(frames)

    mean = sum(cpu_samples) / len(cpu_samples)
    var = sum((s - mean) ** 2 for s in cpu_samples) / len(cpu_samples)
    cpu_cv = (var ** 0.5) / mean if mean else 0.0
    print(
        json.dumps(
            {
                "metric": "fps_per_chip_1280x800_batch4_detect_pose",
                "value": round(tpu_fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(tpu_fps / cpu_fps, 3),
                "cpu_ref_fps": round(cpu_fps, 2),
                "cpu_ref_cv": round(cpu_cv, 4),
            }
        )
    )
    print(
        f"# device={dev} cpu_ref={cpu_fps:.1f} fps (cv {cpu_cv:.3f}, "
        f"best-of-10) detections_frame0={n_det}/4 batch={BATCH}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
