"""IO layer tests: TOML config schema, RON parser, NT4 client/server, MJPEG
streamer, frame conversion, robot-side client, logread CLI."""

import json
import os
import socket
import struct
import time
import urllib.request

import numpy as np
import pytest

from chalkydri_tpu.io import ron
from chalkydri_tpu.io.config import (
    CAprilTagsSubsys,
    Camera,
    Config,
    VideoOrientation,
)

REF = "/root/reference"


class TestConfig:
    def test_defaults_match_reference(self):
        c = Config()
        assert c.team_number == 0xFFFF  # u16::MAX (config.rs:130)
        cam = Camera()
        assert cam.subsystems.mjpeg.width == 1280  # config.rs:153-156
        assert cam.subsystems.capriltags.max_frame_rate == 40  # config.rs:157
        assert cam.auto_exposure is True
        assert cam.orientation == VideoOrientation.NONE

    def test_toml_roundtrip(self):
        text = """
team_number = 4533
ntables_ip = "10.45.33.2"
field_layout = "2026"

[rerun]
server_address = "0.0.0.0:6767"

[[cameras]]
id = "pci-0000:00:14.0-usb-0:4:1.0"
name = "front"
auto_exposure = false
manual_exposure = 120
orientation = "rotate-180"
calib = "{}"

[cameras.settings]
width = 1600
height = 1304

[cameras.subsystems]
custom = ["foo"]

[cameras.subsystems.capriltags]
max_frame_rate = 40

[cameras.cam_offsets.translation]
x = 0.1
y = 0.0
z = 0.5

[cameras.cam_offsets.rotation]
x = 0.0
y = 0.0
z = 180.0

[custom_subsystems.foo]
code = "def run(frame):\\n    return {}"
"""
        c = Config.loads(text)
        assert c.team_number == 4533
        assert c.cameras[0].settings.width == 1600
        assert c.cameras[0].orientation == VideoOrientation.ROTATE_180
        assert c.cameras[0].manual_exposure == 120
        assert c.cameras[0].cam_offsets.rotation.z == 180.0
        assert c.custom_subsystems["foo"].code.startswith("def run")

        c2 = Config.loads(c.dumps())
        assert c2.team_number == 4533
        assert c2.cameras[0].settings.width == 1600
        assert c2.cameras[0].orientation == VideoOrientation.ROTATE_180

    def test_fallback_chain(self, tmp_path):
        p = tmp_path / "chalkydri.toml"
        p.write_text("team_number = 254\n")
        c = Config.load_with_fallback([str(tmp_path / "missing.toml"), str(p)])
        assert c.team_number == 254
        c = Config.load_with_fallback([str(tmp_path / "missing.toml")])
        assert c.team_number == 0xFFFF


class TestRon:
    def test_reference_files_parse(self):
        for rel in ("chalkydri.ron", "config/calibration.ron",
                    "crates/chalkydri/copperconfig.ron"):
            path = os.path.join(REF, rel)
            if not os.path.exists(path):
                continue
            data = ron.load(path)
            assert "tasks" in data

    def test_value_types(self):
        assert ron.loads("( a: 1, b: -2.5, c: \"x\\ny\", d: true, e: None, f: Some(3), )") == {
            "a": 1, "b": -2.5, "c": "x\ny", "d": True, "e": None, "f": 3,
        }
        assert ron.loads("[1, 2, 3]") == [1, 2, 3]
        assert ron.loads('{ "k": (v: 1) }') == {"k": {"v": 1}}

    def test_errors(self):
        with pytest.raises(ron.RonError):
            ron.loads("( a: )")
        with pytest.raises(ron.RonError):
            ron.loads('"unterminated')


class TestNetworkTables:
    def test_publish_roundtrip(self):
        from chalkydri_tpu.io.networktables import MiniNTServer, NT4Client

        srv = MiniNTServer().start()
        c = NT4Client("127.0.0.1", srv.port)
        c.connect()
        try:
            c.publish("/chalkydri/subsystems/demo/val", 2.5)
            c.publish("/Chalkydri/Robot/Position/X", 9.5)
            c.publish("/chalkydri/ok", True)
            deadline = time.time() + 3
            while time.time() < deadline and len(srv.values) < 3:
                time.sleep(0.02)
            assert srv.values["/chalkydri/subsystems/demo/val"] == 2.5
            assert srv.values["/Chalkydri/Robot/Position/X"] == 9.5
            assert srv.values["/chalkydri/ok"] is True
        finally:
            c.close()
            srv.stop()

    def test_msgpack_roundtrip(self):
        from chalkydri_tpu.io.networktables import msgpack_decode, msgpack_encode

        for v in [0, 127, -5, 3.14, "topic", True, None,
                  [1, 123456789012, 1, 2.5], ["a", [1, 2]]]:
            out, _ = msgpack_decode(msgpack_encode(v))
            assert out == v


class TestFrameConvert:
    def test_gray_passthrough_and_color(self):
        from chalkydri_tpu.runtime.convert import to_gray

        g = np.arange(48, dtype=np.uint8).reshape(6, 8)
        assert to_gray(g, "GREY") is g
        bgr = np.zeros((4, 4, 3), np.uint8)
        bgr[..., 2] = 255  # red in BGR
        luma = to_gray(bgr, "BGR")
        assert 70 <= int(luma[0, 0]) <= 82  # BT.601 red weight ~0.299

    def test_task_pool_copy(self):
        from chalkydri_tpu.runtime.clock import RobotClock, Stamped, Tov
        from chalkydri_tpu.runtime.convert import GstToCuImage

        t = GstToCuImage(config={"width": 8, "height": 6, "fourcc": "GREY"})
        clock = RobotClock()
        t.start(clock)
        out = t.process(clock, Stamped(np.zeros((6, 8), np.uint8), Tov(123)))
        assert out.payload.shape == (6, 8)
        assert out.tov.time_us == 123
        t.stop(clock)


class TestMjpeg:
    def test_stream_serves_frames(self):
        cv2 = pytest.importorskip("cv2")
        from chalkydri_tpu.io.mjpeg import MjpegServer
        from chalkydri_tpu.subsystems.monitor import FrameRing

        ring = FrameRing()
        ok, enc = cv2.imencode(".jpg", np.full((32, 32), 200, np.uint8))
        ring.push(1, enc.tobytes())
        srv = MjpegServer(ring, host="127.0.0.1", port=0)
        srv.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/stream", timeout=3
            ) as r:
                head = r.read(200)
            assert b"--frame" in head and b"image/jpeg" in head
        finally:
            srv.stop()


class TestRobotClient:
    def test_fused_pose_and_gyro(self):
        from chalkydri_tpu.clients.python_client import Chalkydri
        from chalkydri_tpu.io.whacknet import (
            RobotPose,
            VisionUncertainty,
            encode_measurement,
        )

        client = Chalkydri(listen_port=18700, coprocessor_addr="127.0.0.1",
                           gyro_port=18701)
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            # two cameras, one more confident than the other
            tx.sendto(
                encode_measurement(RobotPose(1.0, 2.0, 0.1),
                                   VisionUncertainty(0.01, 0.01, 0.05), 5, 0, 2),
                ("127.0.0.1", 18700),
            )
            tx.sendto(
                encode_measurement(RobotPose(3.0, 4.0, 0.1),
                                   VisionUncertainty(1.0, 1.0, 0.5), 5, 1, 1),
                ("127.0.0.1", 18700),
            )
            deadline = time.time() + 3
            while time.time() < deadline and client.get_camera(1) is None:
                time.sleep(0.02)
            pose = client.get_robot_pose()
            assert pose is not None
            # weighted strongly toward camera 0
            assert abs(pose.x - 1.0) < 0.01
            assert abs(pose.rotation - 0.1) < 1e-6

            # gyro uplink reaches a whacknet listener
            rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            rx.bind(("127.0.0.1", 18701))
            rx.settimeout(3)
            client.send_gyro(1.57)
            data, _ = rx.recvfrom(8)
            assert struct.unpack("<d", data)[0] == 1.57
            rx.close()
        finally:
            client.close()
            tx.close()

    def test_heartbeats_dont_pollute_pose(self):
        from chalkydri_tpu.clients.python_client import Chalkydri
        from chalkydri_tpu.io.whacknet import (
            RobotPose,
            VisionUncertainty,
            encode_measurement,
        )

        client = Chalkydri(listen_port=18710)
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            tx.sendto(
                encode_measurement(RobotPose(), VisionUncertainty(), 5, 0, 0),
                ("127.0.0.1", 18710),
            )
            deadline = time.time() + 2
            while time.time() < deadline and client.get_camera(0) is None:
                time.sleep(0.02)
            assert client.get_robot_pose() is None  # tag_count 0 ignored
        finally:
            client.close()
            tx.close()


class TestLogread:
    def test_dump_and_replay_cli(self, tmp_path, capsys):
        from chalkydri_tpu.io.whacknet import RobotPose, VisionUncertainty
        from chalkydri_tpu.runtime.logging import UnifiedLogger
        from chalkydri_tpu.tools import logread

        path = str(tmp_path / "s.ctlog")
        log = UnifiedLogger(path)
        log.log_frame(0, 10, np.zeros((8, 8), np.uint8))
        log.log_pose(0, 99, RobotPose(1, 2, 3), VisionUncertainty(1, 1, 1))
        log.close()

        assert logread.main(["dump", path]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        kinds = [json.loads(line)["kind"] for line in out]
        assert kinds == ["frame", "pose"]
