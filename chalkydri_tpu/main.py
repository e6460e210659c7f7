"""chalkydri-tpu entrypoint.

Port of the reference main (``/root/reference/crates/chalkydri/src/main.rs:
49-114``): banner, TOML config with /boot -> /etc -> ./ fallback, graph load
(RON), unified logger, app loop. The Pi-specific kernel-module eviction and
GStreamer init have no TPU equivalents; device init is JAX backend init.

Run:  python -m chalkydri_tpu.main [--graph chalkydri.ron] [--config path]
      [--iters N] [--rate HZ] [--log chalkydri.ctlog]
"""

from __future__ import annotations

import argparse
import os
import sys

BANNER = r"""
        chalkydri-tpu
   multi-camera AprilTag vision on TPU
"""


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="chalkydri-tpu", description=__doc__)
    p.add_argument("--graph", default="chalkydri.ron", help="RON task graph")
    p.add_argument("--config", default=None, help="TOML config path")
    p.add_argument("--field", default=None, help="field.json path")
    p.add_argument("--iters", type=int, default=None, help="stop after N iterations")
    p.add_argument("--rate", type=float, default=None, help="iteration rate cap (Hz)")
    p.add_argument("--log", default=None, help="unified log output path")
    p.add_argument("--mjpeg-port", type=int, default=None,
                   help="serve a driver-station MJPEG preview on this port")
    p.add_argument("--no-synthetic", action="store_true",
                   help="fail instead of synthesizing frames for absent cameras")
    p.add_argument("--cache-dir", default=None,
                   help="persistent XLA compilation cache directory "
                        "(default ~/.cache/chalkydri-tpu; 'none' disables)")
    args = p.parse_args(argv)

    from chalkydri_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    print(BANNER, file=sys.stderr)

    # Persistent compilation cache: the deployment story is systemd
    # Restart=always (build/chalkydri-tpu.service) — without a cache every
    # restart pays the full ~30-60 s fused-program compile before the first
    # pose goes out. With it, warm restarts reload the compiled executable
    # in seconds.
    cache_dir = args.cache_dir or os.environ.get(
        "CHALKYDRI_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "chalkydri-tpu"),
    )
    if cache_dir and cache_dir.lower() != "none":
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from chalkydri_tpu.io.config import Cfg, Config
    from chalkydri_tpu.runtime.graph import TaskGraph
    from chalkydri_tpu.runtime.logging import UnifiedLogger
    from chalkydri_tpu.runtime.app import App
    from chalkydri_tpu.io.camera import PROVIDER

    # Config: explicit path or the reference's fallback chain (main.rs:76-87).
    config = Config.load(args.config) if args.config else Config.load_with_fallback()
    Cfg.write(config)

    graph = TaskGraph.load(args.graph)

    layout = None
    if args.field:
        import jax.numpy as jnp

        from chalkydri_tpu.geometry.field_layout import load_field_layout

        layout = load_field_layout(args.field, dtype=jnp.float32)

    logger = UnifiedLogger(args.log, meta={"graph": args.graph}) if args.log else None

    PROVIDER.start()
    detector_kwargs = {}
    if any(
        cam.subsystems.capriltags is not None
        and getattr(cam.subsystems.capriltags, "capacity_fallback", False)
        for cam in (config.cameras or [])
    ):
        # TOML-configured texture-flood recovery (io/config.py
        # CAprilTagsSubsys.capacity_fallback -> App capacity redispatch).
        detector_kwargs["capacity_fallback"] = True
    app = App(
        graph,
        field_layout=layout,
        team_number=config.team_number,
        synthetic_cameras=not args.no_synthetic,
        logger=logger,
        detector_kwargs=detector_kwargs,
        ntables_ip=config.ntables_ip,
        device_name=config.device_name or "chalkydri-tpu",
        mesh=config.mesh,
    )

    # Driver-station MJPEG preview (the reference's MjpegProc/Monitor role):
    # enabled by --mjpeg-port or any camera's mjpeg subsystem config.
    mjpeg_server = None
    wants_mjpeg = args.mjpeg_port is not None or any(
        cam.subsystems.mjpeg is not None for cam in (config.cameras or [])
    )
    if wants_mjpeg:
        from chalkydri_tpu.io.mjpeg import MjpegServer
        from chalkydri_tpu.subsystems.field_view import FieldView
        from chalkydri_tpu.subsystems.overlay import PreviewOverlay

        overlay = PreviewOverlay()
        app.add_frame_observer(overlay.on_frame)
        app.add_detection_observer(overlay.on_detections)
        # Top-down field view (tag layout + pose trace + frusta) at /field —
        # the rerun 3D-state parity surface (monitor.rs:22-31).
        field_view = FieldView(layout=layout)
        app.add_pose_observer(field_view.on_pose)
        mjpeg_server = MjpegServer(
            {"/stream": overlay.ring, "/field": field_view.ring},
            port=args.mjpeg_port or 8080,
        )
        mjpeg_server.start()
        print(
            f"MJPEG preview: http://0.0.0.0:{mjpeg_server.port}/stream | "
            f"field view: http://0.0.0.0:{mjpeg_server.port}/field",
            file=sys.stderr,
        )

    try:
        app.run(max_iters=args.iters, rate_hz=args.rate)
    except KeyboardInterrupt:
        pass
    finally:
        if logger:
            logger.close()
        if mjpeg_server is not None:
            mjpeg_server.stop()
        PROVIDER.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
