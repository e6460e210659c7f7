"""whacknet wire-format and loopback tests.

The reference's only unit test is the 64-byte packet assertion
(crates/whacknet/src/lib.rs:92-95); we test that plus actual UDP loopback for
both the Python and native C++ paths.
"""

import socket
import struct
import time

import pytest

from chalkydri_tpu.io.whacknet import (
    PACKET_SIZE,
    Comm,
    RobotPose,
    VisionUncertainty,
    decode_measurement,
    encode_measurement,
    team_ip,
)


class TestPacket:
    def test_size_is_64(self):
        pkt = encode_measurement(RobotPose(1, 2, 3), VisionUncertainty(4, 5, 6), 7, 8, 9)
        assert len(pkt) == 64 == PACKET_SIZE

    def test_layout(self):
        """Field-by-field layout parity with the #[repr(C)] struct
        (whacknet/src/lib.rs:41-66): 6 little-endian f64, u64 ts, u8 cam,
        u8 tag_count, 6 reserved."""
        pkt = encode_measurement(
            RobotPose(1.5, -2.5, 0.25), VisionUncertainty(0.1, 0.2, 0.3),
            123456789, 3, 2,
        )
        assert struct.unpack_from("<d", pkt, 0)[0] == 1.5
        assert struct.unpack_from("<d", pkt, 8)[0] == -2.5
        assert struct.unpack_from("<d", pkt, 16)[0] == 0.25
        assert struct.unpack_from("<d", pkt, 24)[0] == 0.1
        assert struct.unpack_from("<d", pkt, 32)[0] == 0.2
        assert struct.unpack_from("<d", pkt, 40)[0] == 0.3
        assert struct.unpack_from("<Q", pkt, 48)[0] == 123456789
        assert pkt[56] == 3 and pkt[57] == 2
        assert pkt[58:64] == b"\x00" * 6

    def test_roundtrip(self):
        pose, std, ts, cam, n = decode_measurement(
            encode_measurement(RobotPose(1, 2, 3), VisionUncertainty(4, 5, 6), 7, 8, 9)
        )
        assert (pose.x, pose.y, pose.rot) == (1, 2, 3)
        assert (std.x, std.y, std.rot) == (4, 5, 6)
        assert (ts, cam, n) == (7, 8, 9)

    def test_team_ip(self):
        # 10.TE.AM.2 convention (crates/chalkydri/src/utils.rs:19-25)
        assert team_ip(4533) == "10.45.33.2"
        assert team_ip(254) == "10.2.54.2"
        assert team_ip(1) == "10.0.1.2"


def _loopback_comm(use_native, send_port, gyro_port):
    return Comm(
        remote_addr="127.0.0.1",
        remote_port=send_port,
        gyro_port=gyro_port,
        use_native=use_native,
    )


@pytest.mark.parametrize("use_native", [False, True])
class TestLoopback:
    def test_publish_and_gyro(self, use_native):
        if use_native:
            from chalkydri_tpu.native import load_native

            if load_native() is None:
                pytest.skip("native library unavailable")

        port = 17800 + (100 if use_native else 0)
        gyro_port = port + 1
        rio = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rio.bind(("127.0.0.1", port))
        rio.settimeout(3.0)

        comm = _loopback_comm(use_native, port, gyro_port)
        try:
            # gyro starts at Some(0.0) like the reference (lib.rs:108)
            assert comm.gyro_angle() == 0.0

            comm.publish(2, 1, 999, RobotPose(3.5, 4.5, 0.5),
                         VisionUncertainty(0.01, 0.01, 0.05))
            data, _ = rio.recvfrom(PACKET_SIZE)
            pose, std, ts, cam, n = decode_measurement(data)
            assert (pose.x, pose.y, pose.rot) == (3.5, 4.5, 0.5)
            assert (ts, cam, n) == (999, 2, 1)

            # gyro downlink: single LE f64 datagram (lib.rs:112-130)
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            tx.sendto(struct.pack("<d", 1.234), ("127.0.0.1", gyro_port))
            deadline = time.time() + 3.0
            while time.time() < deadline:
                if comm.gyro_angle() == 1.234:
                    break
                time.sleep(0.01)
            assert comm.gyro_angle() == 1.234
            tx.close()
        finally:
            comm.close()
            rio.close()


class TestFramePool:
    def test_pool_lifecycle(self):
        from chalkydri_tpu.native import load_native
        import ctypes

        lib = load_native()
        if lib is None:
            pytest.skip("native library unavailable")

        h = lib.framepool_create(1024, 4)
        assert h >= 0
        try:
            for i in range(6):  # more pushes than slots: drop-oldest
                data = bytes([i]) * 1024
                assert lib.framepool_push(h, data, 1024, 100 + i) >= 0
            assert lib.framepool_dropped(h) == 2

            ptr = ctypes.POINTER(ctypes.c_uint8)()
            stamp = ctypes.c_uint64()
            slot = lib.framepool_acquire_latest(h, ctypes.byref(ptr), ctypes.byref(stamp))
            assert slot >= 0
            assert stamp.value == 105  # newest survives
            assert ptr[0] == 5
            lib.framepool_release(h, slot)
        finally:
            lib.framepool_destroy(h)
