"""Tests for SE3, camera, TUM loader, exporters, config."""

import math
import os

import numpy as np
import pytest

from surfelmeshing_tpu.config import SurfelMeshingConfig, config_from_args
from surfelmeshing_tpu.io.mesh_io import read_ply, write_obj, write_ply
from surfelmeshing_tpu.io.synthetic import (SyntheticRGBDSequence,
                                            write_tum_dataset)
from surfelmeshing_tpu.io.tum import read_tum_rgbd_dataset
from surfelmeshing_tpu.utils.camera import PinholeCamera
from surfelmeshing_tpu.utils.se3 import SE3, interpolate_pose, quat_slerp


class TestSE3:
    def test_identity(self):
        p = np.array([1.0, 2.0, 3.0])
        assert np.allclose(SE3.identity() * p, p)

    def test_compose_inverse(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            q = rng.standard_normal(4)
            a = SE3(q / np.linalg.norm(q), rng.standard_normal(3))
            q2 = rng.standard_normal(4)
            b = SE3(q2 / np.linalg.norm(q2), rng.standard_normal(3))
            p = rng.standard_normal(3)
            assert np.allclose((a * b) * p, a * (b * p), atol=1e-9)
            assert np.allclose((a * a.inverse()) * p, p, atol=1e-9)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            q = rng.standard_normal(4)
            a = SE3(q / np.linalg.norm(q), rng.standard_normal(3))
            b = SE3.from_matrix(a.matrix())
            p = rng.standard_normal(3)
            assert np.allclose(a * p, b * p, atol=1e-9)

    def test_slerp_endpoints(self):
        qa = np.array([0.0, 0.0, 0.0, 1.0])
        angle = 0.8
        qb = np.array([np.sin(angle / 2), 0.0, 0.0, np.cos(angle / 2)])
        assert np.allclose(quat_slerp(qa, qb, 0.0), qa)
        assert np.allclose(quat_slerp(qa, qb, 1.0), qb)
        qm = quat_slerp(qa, qb, 0.5)
        assert np.allclose(qm, [np.sin(angle / 4), 0, 0, np.cos(angle / 4)],
                           atol=1e-9)

    def test_interpolate_pose_clamps_and_gap(self):
        ts = np.array([0.0, 1.0, 2.0])
        poses = [SE3(t=[0, 0, 0]), SE3(t=[1, 0, 0]), SE3(t=[2, 0, 0])]
        assert np.allclose(interpolate_pose(-1.0, ts, poses).t, [0, 0, 0])
        assert np.allclose(interpolate_pose(5.0, ts, poses).t, [2, 0, 0])
        assert np.allclose(interpolate_pose(0.5, ts, poses).t, [0.5, 0, 0])
        # Max-gap dropout (rgbd_video_io_tum_dataset.h:64-67).
        assert interpolate_pose(0.5, ts, poses, 0.4) is None
        assert interpolate_pose(0.5, ts, poses, 0.6) is not None


class TestCamera:
    def test_scaled(self):
        cam = PinholeCamera(640, 480, 525.0, 525.0, 320.5, 240.5)
        half = cam.pyramid_level(1)
        assert half.width == 320 and half.height == 240
        assert half.fx == 262.5 and half.cx == 160.25

    def test_unprojection_convention(self):
        cam = PinholeCamera(640, 480, 525.0, 525.0, 320.5, 240.5)
        fx_inv, fy_inv, cx_inv, cy_inv = cam.unprojection
        # Center pixel of the image plane maps to the optical axis:
        # x = cx - 0.5 gives direction 0.
        x = cam.cx - 0.5
        assert abs(fx_inv * x + cx_inv) < 1e-12


class TestExport:
    def test_ply_roundtrip(self, tmp_path):
        pos = np.array([[0, 0, 0], [1, 2, 3]], dtype=np.float32)
        col = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
        nrm = np.array([[0, 0, -1], [0, 1, 0]], dtype=np.float32)
        p = str(tmp_path / "cloud.ply")
        write_ply(p, pos, col, nrm)
        rec = read_ply(p)
        assert np.allclose(rec["x"], pos[:, 0])
        assert np.allclose(rec["nz"], nrm[:, 2])
        assert rec["red"][0] == 255

    def test_obj(self, tmp_path):
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
        tri = np.array([[0, 1, 2]])
        p = str(tmp_path / "mesh.obj")
        write_obj(p, pos, tri, colors=np.full((3, 3), 255, np.uint8))
        text = open(p).read().splitlines()
        assert text[0].startswith("v 0 0 0 1 1 1")
        assert text[-1] == "f 1 2 3"


class TestTUMLoader:
    def test_synthetic_dataset_roundtrip(self, tmp_path):
        path = write_tum_dataset(str(tmp_path / "ds"), num_frames=6,
                                 width=64, height=48)
        video = read_tum_rgbd_dataset(path, "groundtruth.txt", 0.06)
        assert video.frame_count == 6
        assert video.color_camera.width == 64
        # Pixel-corner convention shift applied.
        assert video.color_camera.cx == pytest.approx(32.5)
        depth = video.depth_frames[0].get_image()
        assert depth.dtype == np.int32 or depth.dtype == np.uint16
        # Depth values should be plausible (back wall at 2.5m * 5000).
        d = np.asarray(depth)
        assert d.max() > 5000
        # Poses round-trip through the trajectory file.
        seq = SyntheticRGBDSequence(6, 64, 48)
        p_loaded = video.depth_frames[3].global_T_frame
        p_true = seq.poses[3]
        assert np.allclose(p_loaded.t, p_true.t, atol=1e-5)
        assert min(np.linalg.norm(p_loaded.q - p_true.q),
                   np.linalg.norm(p_loaded.q + p_true.q)) < 1e-5

    def test_no_trajectory(self, tmp_path):
        path = write_tum_dataset(str(tmp_path / "ds"), num_frames=3,
                                 width=64, height=48)
        video = read_tum_rgbd_dataset(path, None)
        assert video.frame_count == 3
        assert np.allclose(video.depth_frames[2].global_T_frame.t, 0)


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = SurfelMeshingConfig()
        assert cfg.depth_scaling == 5000
        assert cfg.max_surfel_count == 20_000_000
        assert cfg.sensor_noise_factor == 0.05
        assert cfg.max_surfel_confidence == 5.0
        assert cfg.regularizer_weight == 10.0
        assert cfg.observation_angle_threshold_deg == 85  # main.cc:425
        assert cfg.outlier_filtering_frame_count == 8
        assert cfg.depth_erosion_radius == 2
        assert math.isinf(cfg.point_radius_clamp_factor)

    def test_cli_parsing(self):
        cfg = config_from_args([
            "--max_surfel_count", "500000", "--disable_blending",
            "--synchronous_meshing", "--follow_input_camera", "false",
            "/data/ds", "groundtruth.txt"])
        assert cfg.max_surfel_count == 500000
        assert not cfg.do_blending
        assert not cfg.asynchronous_triangulation
        assert cfg.follow_input_camera is False
        assert cfg.dataset_folder_path == "/data/ds"
        assert cfg.trajectory_filename == "groundtruth.txt"

    def test_invalid_outlier_count(self):
        cfg = SurfelMeshingConfig(outlier_filtering_frame_count=3)
        with pytest.raises(ValueError):
            cfg.validate()
