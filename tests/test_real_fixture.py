"""Real-format TUM fixture: ingestion through the FULL app path.

The committed fixture (tests/fixtures/tum_micro, tools/make_real_fixture.py)
is the real-data readiness check: true 16-bit Kinect-style depth PNGs
(disparity-quantized comb distribution, speckle + IR-shadow dropout), fr1
intrinsics, TUM epoch timestamps where rgb and depth disagree, a missing
association, an out-of-order association pair, and a ground-truth gap that
exercises max_pose_interpolation_time_extent dropout
(rgbd_video_io_tum_dataset.h:43-82,137-251).  docs/real_data.md documents
the fetch-and-run protocol for the real fr1/desk sequence.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tum_micro")


def test_loader_parses_real_format():
    from surfelmeshing_tpu.io.tum import read_tum_rgbd_dataset

    video = read_tum_rgbd_dataset(FIXTURE, "groundtruth.txt", 0.05)
    # 14 rendered - 1 missing association - 3 dropped in the ground-truth
    # gap (bracketing samples further than 0.05 s away).
    assert video.frame_count == 10
    # Without the interpolation-extent limit only the association is missing.
    video_all = read_tum_rgbd_dataset(FIXTURE, "groundtruth.txt",
                                      float("inf"))
    assert video_all.frame_count == 13

    # fr1 intrinsics with the +0.5 pixel-corner shift applied by the loader
    # (rgbd_video_io_tum_dataset.h:243-244).
    cam = video.depth_camera
    assert cam.width == 640 and cam.height == 480
    assert cam.fx == pytest.approx(517.306408)
    assert cam.cx == pytest.approx(318.643040 + 0.5)

    # True 16-bit depth with a Kinect-like comb distribution (disparity
    # quantization: few distinct values, spacing growing with depth).
    d = video.depth_frames[0].get_image()
    assert d.dtype == np.uint16
    assert (d == 0).mean() > 0.01          # dropout holes exist
    vals = np.unique(d[d > 0])
    assert len(vals) < 500                 # quantized, not continuous
    gaps = np.diff(vals.astype(np.int64))
    assert gaps[-1] > gaps[0]              # step grows with depth

    # rgb/depth timestamps disagree (TUM associate.py reality).
    assert video.color_frames[0].timestamp != video.depth_frames[0].timestamp
    # One association pair is out of order in the file.
    ts = [f.timestamp for f in video.depth_frames]
    assert any(b < a for a, b in zip(ts, ts[1:]))


def test_full_app_path_on_real_fixture(tmp_path):
    """app/main.py end-to-end over the committed real-format fixture:
    pose-interpolated playback, preprocessing, fusion, async meshing,
    mesh + point-cloud export (the reference's TUM protocol,
    README.md:62-98)."""
    from surfelmeshing_tpu.app.main import run
    from surfelmeshing_tpu.config import config_from_args

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        cfg = config_from_args([
            "--max_surfel_count", "120000",
            "--pyramid_level", "2",           # 160x120 processing on CPU CI
            "--outlier_filtering_frame_count", "2",
            "--depth_erosion_radius", "1",
            "--restrict_fps_to", "0",
            "--exit_after_processing",
            "--export_mesh", str(tmp_path / "mesh.obj"),
            "--export_point_cloud", str(tmp_path / "cloud.ply"),
            FIXTURE, "groundtruth.txt"])
        assert run(cfg) == 0
    finally:
        os.chdir(cwd)
    assert (tmp_path / "mesh.obj").exists()
    assert (tmp_path / "cloud.ply").exists()
    # The Kinect-style degradation must still reconstruct a surface.
    assert (tmp_path / "mesh.obj").read_text().count("\nf ") > 50


def test_evaluate_on_real_fixture(tmp_path):
    """app/evaluate.py over the fixture against an analytic ground-truth
    sampling of the synthetic scene (ICL-NUIM protocol stand-in)."""
    from surfelmeshing_tpu.app.evaluate import main as eval_main
    from surfelmeshing_tpu.io.mesh_io import write_ply
    from surfelmeshing_tpu.io.synthetic import SCENES

    # Ground-truth point cloud: scene surface points seen from the fixture
    # trajectory (sampled analytically from the same scene the fixture
    # renders).
    from surfelmeshing_tpu.io.synthetic import TRAJECTORIES, render_frame
    from surfelmeshing_tpu.utils.camera import PinholeCamera

    cam = PinholeCamera(64, 48, 51.7, 51.6, 32.4, 25.8)
    poses = TRAJECTORIES["arc"](6)
    pts = []
    for p in poses:
        depth, _ = render_frame(cam, p, 5000.0, scene=SCENES["default"])
        z = depth.astype(np.float64) / 5000.0
        ys, xs = np.nonzero(depth)
        zz = z[ys, xs]
        x = zz * (xs - cam.cx + 0.5) / cam.fx
        y = zz * (ys - cam.cy + 0.5) / cam.fy
        local = np.stack([x, y, zz], axis=1)
        pts.append(local @ p.rotation_matrix.T + p.t)
    gt = np.concatenate(pts)[::7]
    gt_path = str(tmp_path / "gt.ply")
    write_ply(gt_path, gt.astype(np.float32),
              np.zeros((len(gt), 3), np.uint8))

    rc = eval_main([FIXTURE, "groundtruth.txt", "--ground_truth", gt_path,
                    "--max_frames", "8", "--max_surfel_count", "200000",
                    "--pyramid_level", "2"])
    assert rc == 0
