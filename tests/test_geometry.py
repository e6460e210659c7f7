"""Geometry core tests: transforms, camera model, field layout, tag corners."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from chalkydri_tpu.geometry import (
    SE3,
    OpenCVModel5,
    corner_offsets,
    corners_world,
    euler_to_matrix,
    matrix_to_quat,
    matrix_to_yaw,
    parse_field_layout,
    quat_to_matrix,
    robot_to_cam_from_offsets,
    smoothstep,
    wrap_angle,
)
from tests.reference_impl.ref_sqpnp import create_solver_camera_transform

import scipy.spatial.transform as sst


def random_rotation(rng):
    return sst.Rotation.random(random_state=np.random.RandomState(rng.integers(1 << 30))).as_matrix()


class TestTransforms:
    def test_se3_compose_apply(self, rng):
        r1, r2 = random_rotation(rng), random_rotation(rng)
        t1, t2 = rng.normal(size=3), rng.normal(size=3)
        a = SE3(jnp.array(r1), jnp.array(t1))
        b = SE3(jnp.array(r2), jnp.array(t2))
        p = rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(a.compose(b).apply(jnp.array(p))),
            r1 @ (r2 @ p + t2) + t1,
            atol=1e-12,
        )

    def test_se3_inverse(self, rng):
        r = random_rotation(rng)
        t = rng.normal(size=3)
        iso = SE3(jnp.array(r), jnp.array(t))
        ident = iso.compose(iso.inverse())
        np.testing.assert_allclose(np.asarray(ident.rotation), np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.asarray(ident.translation), 0, atol=1e-12)

    def test_quat_roundtrip(self, rng):
        for _ in range(20):
            r = random_rotation(rng)
            q = matrix_to_quat(jnp.array(r))
            r2 = quat_to_matrix(q)
            np.testing.assert_allclose(np.asarray(r2), r, atol=1e-10)

    def test_quat_matches_scipy(self, rng):
        # scalar-first (w,x,y,z) convention of the WPILib layout schema
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        r_ours = np.asarray(quat_to_matrix(jnp.array(q)))
        r_scipy = sst.Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(r_ours, r_scipy, atol=1e-12)

    def test_euler_matches_scipy(self, rng):
        roll, pitch, yaw = rng.uniform(-np.pi, np.pi, size=3)
        ours = np.asarray(euler_to_matrix(jnp.array(roll), jnp.array(pitch), jnp.array(yaw)))
        # nalgebra from_euler_angles = Rz(yaw) Ry(pitch) Rx(roll)
        ref = sst.Rotation.from_euler("ZYX", [yaw, pitch, roll]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_yaw_extraction(self, rng):
        yaw = 0.7
        r = np.asarray(euler_to_matrix(jnp.array(0.1), jnp.array(0.2), jnp.array(yaw)))
        assert abs(float(matrix_to_yaw(jnp.array(r))) - yaw) < 1e-12

    def test_wrap_angle(self):
        np.testing.assert_allclose(float(wrap_angle(jnp.array(3 * np.pi / 2))), -np.pi / 2, atol=1e-12)
        np.testing.assert_allclose(float(wrap_angle(jnp.array(-3 * np.pi / 2))), np.pi / 2, atol=1e-12)

    def test_smoothstep(self):
        assert float(smoothstep(jnp.array(0.0))) == 0.0
        assert float(smoothstep(jnp.array(1.0))) == 1.0
        assert float(smoothstep(jnp.array(2.0))) == 1.0
        assert abs(float(smoothstep(jnp.array(0.5))) - 0.5) < 1e-12

    def test_robot_to_cam_matches_reference_impl(self, rng):
        args = (0.3, -0.1, 0.5, 5.0, -10.0, 45.0)
        ours = robot_to_cam_from_offsets(*args)
        ref_rot, ref_t = create_solver_camera_transform(*args)
        np.testing.assert_allclose(np.asarray(ours.rotation), ref_rot, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.translation), ref_t, atol=1e-12)

    def test_robot_to_cam_identity_offsets(self):
        """Zero offsets: camera at robot origin looking forward; the CV z axis
        (optical axis) must map to robot +x (forward)."""
        iso = robot_to_cam_from_offsets(0, 0, 0, 0, 0, 0)
        inv = iso.inverse()
        optical = inv.apply(jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(optical), [1.0, 0.0, 0.0], atol=1e-12)


CALIB_JSON = """{
  "OpenCVModel5": {
    "fx": 898.994806807896, "fy": 897.9156469180645,
    "cx": 627.0698256482966, "cy": 357.65273282451244,
    "k1": -0.18595770381253796, "k2": 0.4406013374445432,
    "p1": -0.001, "p2": -0.001, "k3": -0.3704732841830049,
    "width": 1280, "height": 720
  }
}"""


class TestCamera:
    def test_json_roundtrip(self):
        m = OpenCVModel5.from_json(CALIB_JSON)
        d = m.to_dict()
        assert abs(d["fx"] - 898.994806807896) < 1e-9
        assert m.width == 1280 and m.height == 720
        m2 = OpenCVModel5.from_json(m.to_json())
        np.testing.assert_allclose(np.asarray(m2.params), np.asarray(m.params))

    def test_project_matches_opencv(self, rng):
        cv2 = pytest.importorskip("cv2")
        m = OpenCVModel5.from_json(CALIB_JSON)
        pts = rng.uniform(-0.5, 0.5, size=(50, 3))
        pts[:, 2] = rng.uniform(1.0, 5.0, size=50)
        ours, valid = m.project(jnp.array(pts))
        assert bool(jnp.all(valid))
        k = np.array(
            [[898.994806807896, 0, 627.0698256482966],
             [0, 897.9156469180645, 357.65273282451244],
             [0, 0, 1]]
        )
        dist = np.array([-0.18595770381253796, 0.4406013374445432, -0.001, -0.001,
                         -0.3704732841830049])
        cv_pts, _ = cv2.projectPoints(pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), k, dist)
        np.testing.assert_allclose(np.asarray(ours), cv_pts.reshape(-1, 2), atol=1e-6)

    def test_unproject_roundtrip(self, rng):
        m = OpenCVModel5.from_json(CALIB_JSON)
        pts = rng.uniform(-0.35, 0.35, size=(100, 3))
        pts[:, 2] = 1.0
        pix, valid = m.project(jnp.array(pts))
        rays, conv = m.unproject(pix)
        assert bool(jnp.all(conv))
        np.testing.assert_allclose(np.asarray(rays), pts, atol=1e-8)

    def test_unproject_f32(self, rng):
        m32 = OpenCVModel5.from_json(CALIB_JSON, dtype=jnp.float32)
        pts = rng.uniform(-0.3, 0.3, size=(20, 3)).astype(np.float32)
        pts[:, 2] = 1.0
        pix, _ = m32.project(jnp.array(pts))
        rays, conv = m32.unproject(pix)
        # f32 pipeline: sub-1e-3 normalized-coordinate round trip
        np.testing.assert_allclose(np.asarray(rays), pts, atol=2e-3)

    def test_batched_models(self):
        from chalkydri_tpu.geometry import stack_models
        m = OpenCVModel5.from_json(CALIB_JSON)
        batch = stack_models([m, m])
        pts = jnp.array([[0.1, 0.2, 2.0], [0.0, 0.0, 1.0]])
        pix, valid = batch.project(pts)
        assert pix.shape == (2, 2)


class TestFieldLayout:
    def test_parse_reference_layout(self, reference_field_json):
        with open(reference_field_json) as f:
            layout = parse_field_layout(json.load(f))
        # 2026 field: 32 tags, 16.518 x 8.043 m (SURVEY.md section 2.1)
        assert int(np.asarray(layout.present).sum()) == 32
        assert abs(layout.field_size[0] - 16.518) < 1e-6
        assert bool(layout.has_tag(jnp.array(1)))
        assert not bool(layout.has_tag(jnp.array(0)))
        assert not bool(layout.has_tag(jnp.array(60)))
        pose = layout.tag_pose(jnp.array(1))
        assert abs(float(pose.translation[0]) - 11.863959) < 1e-6

    def test_tag1_faces_negative_x(self, reference_field_json):
        """Tag 1's quaternion is a 180-deg z rotation: its +x (normal) points
        along world -x."""
        with open(reference_field_json) as f:
            layout = parse_field_layout(json.load(f))
        rot = np.asarray(layout.tag_pose(jnp.array(1)).rotation)
        np.testing.assert_allclose(rot @ [1, 0, 0], [-1, 0, 0], atol=1e-9)


class TestTagCorners:
    def test_corner_order_and_size(self):
        offs = np.asarray(corner_offsets())
        s = 0.1651 / 2
        np.testing.assert_allclose(
            offs,
            [[0, -s, -s], [0, s, -s], [0, s, s], [0, -s, s]],
            atol=1e-12,
        )

    def test_corners_world_identity(self):
        pose = SE3.identity(dtype=jnp.float64)
        w = np.asarray(corners_world(pose))
        assert w.shape == (4, 3)
        np.testing.assert_allclose(w, np.asarray(corner_offsets()), atol=1e-12)

    def test_corners_world_batched(self, rng):
        rots = np.stack([random_rotation(rng) for _ in range(5)])
        ts = rng.normal(size=(5, 3))
        w = corners_world(SE3(jnp.array(rots), jnp.array(ts)))
        assert w.shape == (5, 4, 3)
        ref = np.einsum("bij,cj->bci", rots, np.asarray(corner_offsets())) + ts[:, None]
        np.testing.assert_allclose(np.asarray(w), ref, atol=1e-12)
