"""Calibration solver tests: recover known intrinsics from synthetic board
views (the hardware-free analogue of the reference's live aprilgrid loop,
configurator/src/calibration.rs)."""

import numpy as np
import pytest
import scipy.spatial.transform as sst

import jax.numpy as jnp

from chalkydri_tpu.geometry.camera import OpenCVModel5
from chalkydri_tpu.tools.calibration import (
    FrameFeature,
    aprilgrid_board_corners,
    calibrate_camera,
    feature_from_detections,
)

TRUE = np.array([880.0, 870.0, 650.0, 360.0, -0.12, 0.04, 0.001, -0.0008, 0.0])


def synth_views(n_frames=12, noise=0.0, seed=1):
    rng = np.random.default_rng(seed)
    model = OpenCVModel5(jnp.asarray(TRUE), 1280, 720)
    board = aprilgrid_board_corners()
    all_pts = np.concatenate([board[t] for t in sorted(board)])  # [144, 3]
    center = all_pts.mean(axis=0)
    feats = []
    for _ in range(n_frames):
        # Random viewing pose: board ~0.4-0.8 m away, tilted up to ~35 deg.
        rot = sst.Rotation.from_euler(
            "xyz", rng.uniform(-0.6, 0.6, 3)
        ).as_matrix()
        t = np.array(
            [rng.uniform(-0.08, 0.08), rng.uniform(-0.05, 0.05), rng.uniform(0.4, 0.8)]
        )
        pc = (all_pts - center) @ rot.T + t
        pix, valid = model.project(jnp.asarray(pc))
        pix = np.asarray(pix)
        if noise:
            pix = pix + rng.normal(0, noise, pix.shape)
        feats.append(FrameFeature(points_3d=all_pts, points_2d=pix))
    return feats


class TestCalibration:
    def test_recovers_intrinsics(self):
        feats = synth_views()
        res = calibrate_camera(feats)
        assert res.rms_px < 0.05, f"rms {res.rms_px}"
        np.testing.assert_allclose(res.params[:4], TRUE[:4], rtol=5e-3)
        np.testing.assert_allclose(res.params[4:6], TRUE[4:6], atol=5e-3)

    def test_noisy_views(self):
        feats = synth_views(n_frames=16, noise=0.3)
        res = calibrate_camera(feats)
        assert res.rms_px < 0.6
        np.testing.assert_allclose(res.params[:4], TRUE[:4], rtol=2e-2)

    def test_too_few_frames(self):
        with pytest.raises(ValueError):
            calibrate_camera(synth_views(n_frames=2))

    def test_feature_from_detections_min_corners(self):
        board = aprilgrid_board_corners()
        # 5 tags = 20 corners < MIN_CORNERS(24) -> rejected
        ids = np.arange(5)
        corners = np.zeros((5, 4, 2))
        assert feature_from_detections(ids, corners, board) is None
        # 6 tags = 24 corners -> accepted
        ids = np.arange(6)
        corners = np.zeros((6, 4, 2))
        feat = feature_from_detections(ids, corners, board)
        assert feat is not None and len(feat.points_3d) == 24

    def test_result_roundtrips_to_model_json(self):
        res = calibrate_camera(synth_views())
        model = res.to_model(1280, 720)
        j = model.to_json()
        m2 = OpenCVModel5.from_json(j)
        np.testing.assert_allclose(np.asarray(m2.params), res.params, rtol=1e-12)
